"""Cluster-pair neighbor kernel (Pallas): sorted particle blocks vs DMA'd
neighbor chunks.

The dense cell-pair pass (``ops/neighbor.py``) pads every cell to a static
width, so its cost is O(cells * 27 * width^2) regardless of real occupancy.
This kernel works in *sorted particle order* instead (the classic
cluster-pair design of GPU molecular dynamics, adapted to the TPU memory
system):

* particles are sorted by cell id (dead last); a *block* is B consecutive
  sorted rows — work scales with LIVE particles, not cells;
* XLA precomputes, per block, a flat list of up to C_MAX aligned CH-column
  *chunks* covering the block's stencil: cells with consecutive i2 are
  adjacent in memory, so each (i1 row, i3 plane) of the stencil is one
  contiguous range of sorted rows, split into 128-aligned chunks;
* the kernel streams the chunk list through VMEM with double-buffered async
  DMA, computing (B, CH) pairwise tiles on the VPU.  Per-pair cell-delta
  masks restore exact 27-stencil semantics (``fill_cells`` clipping,
  ``/root/reference/source/code/inc/app.cu:352-409``): collision flags
  (``bodyBodyCollision``, ``app_common.cu:269-301``, larger id survives) and
  Plummer gravity (``bodyBodyInteraction``, ``app_common.cu:236-267``).

Snapshot layout: one (16, N_pad) f32 array — rows x, y, z, w, age, i1, i2,
i3, gid, valid (+6 pad rows for the 8-sublane DMA tiling) — so a chunk is
ONE strided DMA and every per-pair quantity lives in lane-major (B, CH)
tiles.  Integer-valued rows are exact in f32 below 2^24 slots.

Capacity escapes are reported, never silent: blocks whose stencil needs more
than C_MAX chunks drop the excess.  :func:`neighbor_pass_blocks` returns the
count as ``n_chunks_dropped`` and callers surface it through
``NBodyStats.n_listed_dropped`` (C_MAX covers the worst observed occupancy
~3x; a nonzero count means forces were truncated — rerun with a larger
``c_max``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import NBodyConfig

B = 256        # block rows (my particles per grid step)
CH = 1024      # neighbor chunk columns per DMA (swept at 1M: 512 -> 404 ms, 1024 -> 386 ms)
R_MAX = 24     # static neighbor-range slots per block
C_MAX = 48     # static chunk slots per block
_BIG = jnp.int32(1 << 30)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# XLA-side preparation
# ---------------------------------------------------------------------------


def prepare(pos0, age0, w0, cell, alive, cfg: NBodyConfig, dims=None,
            ids=None, c_max: int | None = None):
    """Sort by cell and build the kernel inputs.

    ``dims = (d1, d2, d3)`` generalizes to non-cubic grids (cell id =
    i3*(d1*d2) + i1*d2 + i2), e.g. a device slab extended by halo planes;
    ``ids`` supplies global particle ids when slots are device-local.
    ``c_max`` overrides the static per-block chunk budget (tests use tiny
    values to exercise the drop-report path).

    Returns (snap (16, N+CH), chunks (NB, c_max, 4) int32 — columns
    (aligned_start, lo, hi, n_active) — order, overflow (unsorted),
    max_cell_occupancy, per-cell counts, n_chunks_dropped).
    """
    c_max = C_MAX if c_max is None else c_max
    g = cfg.grid.grid_dim
    d1, d2, d3 = dims or (g, g, g)
    num_cells = d1 * d2 * d3
    row_stride, plane_stride = d2, d1 * d2
    cap = cfg.cell_capacity
    n = cell.shape[0]
    assert n % B == 0, (n, B)
    # ids ride the snapshot as f32 (one strided DMA per chunk); equality and
    # ordering are exact only below 2^24.  Enforced, not just documented.
    assert n < (1 << 24), (
        f"blocks kernel carries ids in f32: {n} slots >= 2^24 — use the "
        f"dense impl above 16.7M slots")

    key = jnp.where(alive, cell, num_cells).astype(jnp.int32)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    skey = key[order]

    counts = jnp.bincount(key, length=num_cells + 1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[skey]

    valid_s = (skey < num_cells) & (rank < cap)
    overflow_s = (skey < num_cells) & (rank >= cap)
    overflow = jnp.zeros((n,), jnp.bool_).at[order].set(
        overflow_s, mode="drop", unique_indices=True)

    # one row gather (64 B contiguous rows) instead of 10 element gathers
    f = jnp.float32
    i3u = cell // plane_stride
    remu = cell % plane_stride
    valid_u = jnp.zeros((n,), jnp.bool_).at[order].set(
        valid_s, mode="drop", unique_indices=True)
    zero = jnp.zeros((n,), f)
    gid = (jnp.arange(n, dtype=f) if ids is None else ids.astype(f))
    packed_u = jnp.stack([
        pos0[:, 0], pos0[:, 1], pos0[:, 2], w0, age0,
        (remu // row_stride).astype(f), (remu % row_stride).astype(f),
        i3u.astype(f),
        gid,
        valid_u.astype(f),
        zero, zero, zero, zero, zero, zero,  # pad rows: 8-sublane DMA tiling
    ], axis=1)                               # (N, 16)
    snap = packed_u[order].T                 # (16, N)
    snap = jnp.pad(snap, ((0, 0), (0, CH)))  # chunk reads never go OOB

    # ---- per-block neighbor ranges --------------------------------------
    # Sorted cells in a block are CONTIGUOUS: [cmin, cmax].  For each of the
    # 9 stencil offsets (d1, d3) the needed cells are the contiguous linear
    # range [cmin-1, cmax+1] + d3*G^2 + d1*G: [c-1, c+1] covers a cell's
    # i2 neighbors for every i2 (row-edge spill is rejected by the per-pair
    # cell-delta masks), and the d1/d3 offsets cover the other two axes —
    # so 9 ranges cover ANY block, row/plane crossings included.  Wide
    # blocks (sparse grids) make consecutive ranges overlap, which would
    # double-count genuine neighbors; offsets are ascending, so clipping
    # each range's start past the previous range's end (dedup below)
    # restores pairwise disjointness while keeping the union intact.
    nb = n // B

    def seg(a, init, op):
        a = jnp.where(valid_s, a, init).reshape(nb, B)
        return op(a, axis=1)
    cmin = seg(skey, _BIG, jnp.min)                      # (NB,)
    cmax = seg(skey, -_BIG, jnp.max)
    empty = (cmax - cmin) < 0

    r_idx = jnp.arange(R_MAX, dtype=jnp.int32)[None, :]  # (1, R_MAX)

    offs = sorted(o3 * plane_stride + o1 * row_stride
                  for o3 in (-1, 0, 1) for o1 in (-1, 0, 1))
    prev_hi = jnp.full_like(cmin, -_BIG)
    lo_cols, hi_cols = [], []
    for r in range(9):                                    # sequential dedup
        lo_r = jnp.maximum(cmin - 1 + offs[r], prev_hi + 1)
        hi_r = cmax + 1 + offs[r]
        prev_hi = jnp.maximum(prev_hi, hi_r)
        lo_cols.append(lo_r)
        hi_cols.append(hi_r)
    padz = [jnp.zeros_like(cmin)] * (R_MAX - 9)
    lo = jnp.stack(lo_cols + padz, axis=1)                # (NB, R_MAX)
    hi = jnp.stack(hi_cols + [z - 1 for z in padz], axis=1)
    active = (~empty)[:, None] & (r_idx < 9)

    lo_c = jnp.clip(lo, 0, num_cells)
    hi_c = jnp.clip(hi + 1, 0, num_cells)
    r_start = starts[lo_c]
    r_end = starts[hi_c]
    count = jnp.where(active & (r_end > r_start), r_end - r_start, 0)

    # ---- flatten ranges into a per-block chunk table -------------------
    astart = (r_start // 128) * 128
    lead = r_start - astart
    tot = lead + count                                  # (NB, R_MAX)
    nch = jnp.where(count > 0, (tot + CH - 1) // CH, 0)
    cum = jnp.cumsum(nch, axis=1)                       # inclusive
    total = cum[:, -1]
    n_dropped = jnp.sum(jnp.maximum(total - c_max, 0))

    j = jnp.arange(c_max, dtype=jnp.int32)[None, :]     # (1, c_max)
    r_of = jnp.sum((cum[:, :, None] <= j[:, None, :]).astype(jnp.int32),
                   axis=1)                              # (NB, c_max)
    r_ofc = jnp.clip(r_of, 0, R_MAX - 1)
    take = lambda a: jnp.take_along_axis(a, r_ofc, axis=1)
    base = jnp.where(r_of > 0,
                     jnp.take_along_axis(
                         cum, jnp.clip(r_of - 1, 0, R_MAX - 1), axis=1), 0)
    c_in = j - base                                      # (NB, c_max)
    valid_j = j < jnp.minimum(total, c_max)[:, None]
    astart_j = jnp.where(valid_j, take(astart) + c_in * CH, 0)
    lo_j = jnp.where(valid_j, jnp.clip(take(lead) - c_in * CH, 0, CH), 0)
    hi_j = jnp.where(valid_j, jnp.clip(take(tot) - c_in * CH, 0, CH), 0)
    nact = jnp.minimum(total, c_max).astype(jnp.int32)
    nact_col = jnp.broadcast_to(nact[:, None], (nb, c_max))
    chunks = jnp.stack([astart_j, lo_j, hi_j, nact_col],
                       axis=-1).astype(jnp.int32)

    max_occ = jnp.max(counts[:num_cells]).astype(jnp.int32)
    return snap, chunks, order, overflow, max_occ, counts, n_dropped


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _kernel(cfg: NBodyConfig, chunks_ref, mine_ref, snap_ref,
            out_ref, nbuf, acc_ref, sem):
    kid = jnp.float32(cfg.kid_age)
    lifec = jnp.float32(cfg.particle_life)
    r2 = jnp.float32(cfg.collision_radius) ** 2
    eps2 = jnp.float32(cfg.eps2)

    mine = mine_ref[:]                      # (16, B)
    mx = mine[0].reshape(B, 1)
    my = mine[1].reshape(B, 1)
    mz = mine[2].reshape(B, 1)
    mage = mine[4].reshape(B, 1)
    mi1 = mine[5].reshape(B, 1)
    mi2 = mine[6].reshape(B, 1)
    mi3 = mine[7].reshape(B, 1)
    mgid = mine[8].reshape(B, 1)
    mvalid = mine[9].reshape(B, 1) > 0
    madult = mage >= kid
    myoung = mage <= lifec

    acc_ref[:] = jnp.zeros_like(acc_ref)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, CH), 1)
    nact = chunks_ref[0, 0, 3]

    def dma(j, slot):
        astart = pl.multiple_of(chunks_ref[0, j, 0], 128)
        return pltpu.make_async_copy(
            snap_ref.at[:, pl.ds(astart, CH)], nbuf.at[slot], sem.at[slot])

    @pl.when(nact > 0)
    def _():
        dma(0, 0).start()

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < nact)
        def _():
            dma(j + 1, (j + 1) % 2).start()

        dma(j, slot).wait()
        nb = nbuf[slot]                     # (16, CH)
        lo = chunks_ref[0, j, 1]
        hi = chunks_ref[0, j, 2]
        in_rng = (col >= lo) & (col < hi)

        dx = nb[0].reshape(1, CH) - mx
        dy = nb[1].reshape(1, CH) - my
        dz = nb[2].reshape(1, CH) - mz
        d2 = dx * dx + dy * dy + dz * dz

        nage = nb[4].reshape(1, CH)
        pair = (in_rng & mvalid & (nb[9].reshape(1, CH) > 0)
                & (nb[8].reshape(1, CH) != mgid)
                & (jnp.abs(nb[5].reshape(1, CH) - mi1) <= 1)
                & (jnp.abs(nb[6].reshape(1, CH) - mi2) <= 1)
                & (jnp.abs(nb[7].reshape(1, CH) - mi3) <= 1))
        adult = madult & (nage >= kid)

        collide = (pair & adult & (d2 <= r2)
                   & myoung & (nage <= lifec))
        killed = jnp.max(jnp.where(
            collide & (nb[8].reshape(1, CH) > mgid), 1.0, 0.0), axis=1)
        touched = jnp.max(jnp.where(collide, 1.0, 0.0), axis=1)

        dd = d2 + eps2
        s = jnp.where(pair & adult,
                      nb[3].reshape(1, CH) / jnp.sqrt(dd * dd * dd), 0.0)
        ax = jnp.sum(dx * s, axis=1)
        ay = jnp.sum(dy * s, axis=1)
        az = jnp.sum(dz * s, axis=1)

        acc_ref[0, :] = acc_ref[0, :] + ax
        acc_ref[1, :] = acc_ref[1, :] + ay
        acc_ref[2, :] = acc_ref[2, :] + az
        acc_ref[3, :] = jnp.maximum(acc_ref[3, :], killed)
        acc_ref[4, :] = jnp.maximum(acc_ref[4, :], touched)
        return 0

    jax.lax.fori_loop(0, nact, body, 0)
    out_ref[:] = acc_ref[:]


def neighbor_pass_blocks(pos0, age0, w0, cell, alive, cfg: NBodyConfig,
                         dims=None, ids=None, c_max: int | None = None
                         ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                    jax.Array, jax.Array, jax.Array,
                                    jax.Array]:
    """Full pass: returns per-slot (acc (N,3), kill, touch, overflow,
    max_cell_occupancy, per-cell counts, n_chunks_dropped) — same semantics
    as ``ops/neighbor.neighbor_pass`` plus the grid-build byproducts (no cell
    lists are materialized).  ``dims``/``ids``/``c_max`` as in
    :func:`prepare`.  A nonzero ``n_chunks_dropped`` means some blocks'
    stencils exceeded the chunk budget and interactions were LOST — callers
    must surface it (``NBodyStats.n_listed_dropped``)."""
    c_max = C_MAX if c_max is None else c_max
    n = cell.shape[0]
    snap, chunks, order, overflow, max_occ, counts, n_dropped = prepare(
        pos0, age0, w0, cell, alive, cfg, dims=dims, ids=ids, c_max=c_max)
    nb_blocks = n // B

    out = pl.pallas_call(
        functools.partial(_kernel, cfg),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(nb_blocks,),
        in_specs=[
            pl.BlockSpec((1, c_max, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((16, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, CH), jnp.float32),
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=30 * n * 27 * 64, bytes_accessed=n * 16 * 4 * 28,
            transcendentals=0),
    )(chunks, snap[:, :n], snap)

    # unsort with ONE row scatter (an N-row scatter costs ~45 ms at 2M on
    # v5e regardless of row width; three separate ones cost three times that)
    unsorted = jnp.zeros((n, 8), jnp.float32).at[order].set(
        out.T, mode="drop", unique_indices=True)
    acc = unsorted[:, 0:3]
    kill = unsorted[:, 3] > 0
    touch = unsorted[:, 4] > 0
    return acc, kill, touch, overflow, max_occ, counts, n_dropped

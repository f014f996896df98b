"""Break the 1M n-body frame into timed pieces on the real TPU.

Methodology: each piece is its OWN jitted program dispatched k times
back-to-back with one sync at the end; cost per call = slope between k and
3k dispatches.  Whole-program dispatch cannot be dead-code-eliminated
(fori_loop bodies can: XLA prunes anything the loop carry doesn't consume,
which silently zeroed out an earlier version of this script).  The axon
relay's ~25 ms sync cost amortizes across the k dispatches.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from particlesystem_tpu.core.config import NBodyConfig, GridSpec  # noqa: E402
from particlesystem_tpu.models import nbody  # noqa: E402
from particlesystem_tpu.ops import neighbor_blocks as nbk  # noqa: E402


def timed(name, f, *args, k1=3, k2=9):
    for _ in range(2):
        r = f(*args)
    jax.block_until_ready(r)
    ts = {}
    for k in (k1, k2, k1, k2):
        t0 = time.perf_counter()
        for _ in range(k):
            r = f(*args)
        jax.block_until_ready(r)
        ts.setdefault(k, []).append(time.perf_counter() - t0)
    t1 = sum(ts[k1]) / len(ts[k1])
    t2 = sum(ts[k2]) / len(ts[k2])
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{name:24s} {ms:8.2f} ms")
    return ms


def main():
    cfg = NBodyConfig(n_fill=1024 * 1024, grid=GridSpec(grid_dim=16))
    n = cfg.slots
    print(f"slots={n} cells={cfg.grid.num_cells} cap={cfg.cell_capacity}")

    state = nbody.init_fill(cfg)
    step = jax.jit(partial(nbody.step, cfg=cfg, impl="blocks"))
    for f in range(3):
        state, stats = step(state, jnp.int32(f))
    jax.block_until_ready(state.pos)
    print("warmed; alive =", int(stats.n_alive))

    from particlesystem_tpu.ops.grid import coords_to_cell, wrap_positions
    pos_w, coords = wrap_positions(state.pos, cfg.grid)
    cell = jax.block_until_ready(coords_to_cell(coords, cfg.grid))
    pos0, age0, w0, alive = state.pos, state.age, state.w, state.alive
    g = cfg.grid.grid_dim
    num_cells = g * g * g
    f32 = jnp.float32

    timed("full step (blocks)",
          jax.jit(lambda s, fr: nbody.step(s, fr, cfg, 0, "blocks")),
          state, jnp.int32(4))

    timed("prepare total", jax.jit(partial(nbk.prepare, cfg=cfg)),
          pos0, age0, w0, cell, alive)

    @jax.jit
    def sort_piece(cell, alive):
        key = jnp.where(alive, cell, num_cells).astype(jnp.int32)
        return jnp.argsort(key, stable=True).astype(jnp.int32)
    order = jax.block_until_ready(sort_piece(cell, alive))
    timed("argsort", sort_piece, cell, alive)

    @jax.jit
    def pack_piece(pos0, age0, w0):
        z = jnp.zeros((n,), f32)
        return jnp.stack([pos0[:, 0], pos0[:, 1], pos0[:, 2], w0, age0,
                          z, z, z, z, z, z, z, z, z, z, z], axis=1)
    packed_u = jax.block_until_ready(pack_piece(pos0, age0, w0))
    timed("pack (N,16)", pack_piece, pos0, age0, w0)

    timed("row gather (N,16)", jax.jit(lambda p, o: p[o]), packed_u, order)
    timed("row gather + T", jax.jit(lambda p, o: p[o].T), packed_u, order)
    timed("transpose only", jax.jit(lambda p: p.T + 0.0), packed_u)

    # chunk-table arithmetic (everything in prepare except sort/pack/gather)
    @jax.jit
    def table_piece(cell, alive):
        key = jnp.where(alive, cell, num_cells).astype(jnp.int32)
        counts = jnp.bincount(key, length=num_cells + 1)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(counts).astype(jnp.int32)])
        return counts, starts
    timed("bincount+cumsum", table_piece, cell, alive)

    # kernel alone (real snap/chunks from the warmed state)
    snap, chunks, order2, overflow, max_occ, counts, nd = jax.jit(
        partial(nbk.prepare, cfg=cfg))(pos0, age0, w0, cell, alive)
    jax.block_until_ready(snap)

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def kernel_piece(snap, chunks):
        nb_blocks = n // nbk.B
        return pl.pallas_call(
            functools.partial(nbk._kernel, cfg),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            grid=(nb_blocks,),
            in_specs=[
                pl.BlockSpec((1, nbk.C_MAX, 4), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((16, nbk.B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((8, nbk.B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, nbk.CH), jnp.float32),
                pltpu.VMEM((8, nbk.B), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(chunks, snap[:, :n], snap)
    out8 = jax.block_until_ready(kernel_piece(snap, chunks))
    timed("pallas kernel", kernel_piece, snap, chunks)

    @jax.jit
    def unsort_piece(out8, order):
        return jnp.zeros((n, 8), f32).at[order].set(
            out8.T, mode="drop", unique_indices=True)
    timed("unsort scatter", unsort_piece, out8, order)

    uvec, fert = nbody.frame_fields(cfg, jnp.int32(5), state.tag)
    jax.block_until_ready(uvec)
    acc = jnp.zeros((n, 3), f32)
    kill = jnp.zeros((n,), bool)

    @jax.jit
    def life_piece(st, acc, uvec, fert):
        return nbody.lifecycle_update(st, pos_w, kill, acc, kill, kill,
                                      uvec, fert, jnp.int32(5), cfg)
    timed("lifecycle_update", life_piece, state, acc, uvec, fert)

    timed("frame_fields (rng)",
          jax.jit(lambda fr, t: nbody.frame_fields(cfg, fr, t)),
          jnp.int32(5), state.tag)

    @jax.jit
    def chunkstat_piece(counts):
        cd, cf = cfg.grid.chunk_dim, cfg.grid.chunk_factor
        per_cell = counts[: num_cells].reshape(cf, cd, cf, cd, cf, cd)
        return jnp.max(jnp.sum(per_cell, axis=(1, 3, 5)))
    timed("chunk stat", chunkstat_piece, counts)


if __name__ == "__main__":
    main()

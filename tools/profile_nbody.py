"""Break the 1M n-body frame into timed pieces on the real TPU.

Methodology: each piece is its OWN jitted program dispatched k times
back-to-back with one tiny host-readback sync at the end; cost per call =
slope between k and 3k dispatches.  Whole-program dispatch cannot be
dead-code-eliminated (fori_loop bodies can: XLA prunes anything the loop
carry doesn't consume, which silently zeroed out an earlier version of
this script).  block_until_ready is unreliable through the axon relay —
sync by reading 8 elements back to the host; all results are held live
until the sync so none can be cancelled.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from particlesystem_tpu.core.config import NBodyConfig, GridSpec  # noqa: E402
from particlesystem_tpu.models import nbody  # noqa: E402
from particlesystem_tpu.ops import neighbor_blocks as nbk  # noqa: E402


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[:8]))


def timed(name, f, *args, k1=3, k2=9):
    for _ in range(2):
        r = f(*args)
    _sync(r)
    ts = {}
    for k in (k1, k2, k1, k2):
        t0 = time.perf_counter()
        rs = [f(*args) for _ in range(k)]
        _sync(rs[-1])
        ts.setdefault(k, []).append(time.perf_counter() - t0)
        del rs
    t1 = sum(ts[k1]) / len(ts[k1])
    t2 = sum(ts[k2]) / len(ts[k2])
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{name:24s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    cfg = NBodyConfig(n_fill=1024 * 1024, grid=GridSpec(grid_dim=16))
    n = cfg.slots
    print(f"slots={n} cells={cfg.grid.num_cells} cap={cfg.cell_capacity}")

    state = nbody.init_fill(cfg)
    step = jax.jit(partial(nbody.step, cfg=cfg, impl="blocks"))
    for f in range(3):
        state, stats = step(state, jnp.int32(f))
    _sync(state.pos)
    print("warmed; alive =", int(stats.n_alive), flush=True)

    from particlesystem_tpu.ops.grid import coords_to_cell, wrap_positions
    pos_w, coords = wrap_positions(state.pos, cfg.grid)
    cell = jax.block_until_ready(coords_to_cell(coords, cfg.grid))
    pos0, age0, w0, alive = state.pos, state.age, state.w, state.alive
    num_cells = cfg.grid.num_cells
    f32 = jnp.float32

    timed("full step (blocks)",
          jax.jit(lambda s, fr: nbody.step(s, fr, cfg, 0, "blocks")),
          state, jnp.int32(4))

    timed("prepare total", jax.jit(partial(nbk.prepare, cfg=cfg)),
          pos0, age0, w0, cell, alive)

    @jax.jit
    def carry_sort_piece(cell, alive, pos0, age0, w0):
        iot = jnp.arange(n, dtype=jnp.int32)
        key = jnp.where(alive, cell, num_cells).astype(jnp.int32)
        return jax.lax.sort(
            (key, pos0[:, 0], pos0[:, 1], pos0[:, 2], age0, w0, iot),
            num_keys=1, is_stable=True)
    timed("carrying sort", carry_sort_piece, cell, alive, pos0, age0, w0)

    skey = carry_sort_piece(cell, alive, pos0, age0, w0)[0]
    _sync(skey)

    @jax.jit
    def table_piece(skey):
        starts = jnp.searchsorted(
            skey, jnp.arange(num_cells + 2, dtype=jnp.int32))
        iot = jnp.arange(n, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 skey[1:] != skey[:-1]])
        run_start = jax.lax.cummax(jnp.where(first, iot, 0))
        return starts, iot - run_start
    timed("starts+rank", table_piece, skey)

    # kernel alone (real snap/chunks from the warmed state)
    snap, chunks, order, ovf_s, max_occ, counts, nd = jax.jit(
        partial(nbk.prepare, cfg=cfg))(pos0, age0, w0, cell, alive)
    _sync(snap)

    @jax.jit
    def kernel_piece(snap, chunks):
        return nbk.kernel_call(cfg, snap, chunks, n,
                               acc_mxu=cfg.fast_accum)
    out8 = kernel_piece(snap, chunks)
    _sync(out8)
    timed("pallas kernel", kernel_piece, snap, chunks)

    @jax.jit
    def unsort_piece(out8, order, ovf_s):
        return jax.lax.sort(
            (order, out8[0], out8[1], out8[2], out8[3],
             ovf_s.astype(f32)), num_keys=1, is_stable=False)
    timed("unsort carry-sort", unsort_piece, out8, order, ovf_s)

    uvec, fert = nbody.frame_fields(cfg, jnp.int32(5), state.tag)
    _sync(uvec)
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

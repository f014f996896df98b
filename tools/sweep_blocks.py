"""Sweep cluster-pair kernel variants on the real TPU at reference scale.

Uses a warmed 1M/16^3 sim state (steady-state occupancy) and times the
pallas kernel alone plus the full neighbor_pass_blocks for each variant:
pure-VPU vs MXU-offloaded accumulation / cell-delta matmuls, and tile
sizes.  Sync is a tiny host readback (block_until_ready is unreliable
through the axon relay).
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
from particlesystem_tpu.ops.grid import coords_to_cell, wrap_positions  # noqa: E402


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[:8]))


def timed(name, f, *args, k1=2, k2=6):
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
    ms = (sum(ts[k2]) / 2 - sum(ts[k1]) / 2) / (k2 - k1) * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    cfg = NBodyConfig(n_fill=1024 * 1024, grid=GridSpec(grid_dim=16))
    state = nbody.init_fill(cfg)
    step = jax.jit(partial(nbody.step, cfg=cfg, impl="blocks"))
    for f in range(3):
        state, stats = step(state, jnp.int32(f))
    _sync(state.pos)
    print("warmed; alive =", int(stats.n_alive), flush=True)

    pos_w, coords = wrap_positions(state.pos, cfg.grid)
    cell = coords_to_cell(coords, cfg.grid)
    args = (state.pos, state.age, state.w, cell, state.alive)

    # round-3 focus: JOINT (b, ch) scaling.  Candidate pair-slots per chunk
    # are b*ch REGARDLESS of the real range width (in_rng masks the rest),
    # so packing efficiency rises only when BOTH shrink together: smaller b
    # narrows each block's cell span (narrower stencil ranges), smaller ch
    # quantizes those narrower ranges with less tail waste.  Round-2 swept
    # the axes separately (b256/ch1024 and b512/ch512 both lost) and missed
    # the joint optimum.
    # hypothesis after the joint (b, ch) sweep: small tiles lose because
    # per-chunk compute (b*ch pairs) drops below the HBM DMA round-trip,
    # so the 2-slot pipeline stalls on latency every chunk.  Sweep DMA
    # pipeline depth against tile size.
    # depth (DMA pipeline) measured a no-op at every tile size -> the
    # per-chunk cost is compute, with the per-chunk axis=1 reductions the
    # prime fixed-cost suspect.  acc_wide defers them to once per block
    # (VMEM caps it at b*ch <= 256k tiles: (3, b, ch) f32 + (b, ch) i32
    # scratch; b512/ch1024 wide = 24 MB > the 16 MB scoped limit).
    # round-3b: column-subtile loop (ts) — compute ceil(hi/ts) subtiles
    # per chunk instead of all CH columns, skipping the padded tail
    # [hi, CH) (~25% of candidates at steady state).  MEASURED DEAD
    # 2026-08-19 (alive 377k): acc_mxu full 66.1 ms vs ts256 93.7 /
    # ts128 139.7; vpu full 82.3 vs ts256 151.3; b256+ts 90.0-111.2.
    # The dynamic-trip-count subtile loop pays the same per-iteration
    # fixed cost that killed small tiles (NOTES.md packing table).
    variants = [
        ("acc_mxu  b512 ch1024",        dict(acc_mxu=True, b=512)),  # r3 default
        ("acc_mxu  b512 ch1024 ts256",  dict(acc_mxu=True, b=512, ts=256)),
        ("acc_mxu  b512 ch1024 ts128",  dict(acc_mxu=True, b=512, ts=128)),
        ("acc_mxu  b256 ch1024 ts128",  dict(acc_mxu=True, b=256, ts=128)),
        ("acc_mxu  b256 ch1024 ts256",  dict(acc_mxu=True, b=256, ts=256)),
        ("vpu      b512 ch1024 ts256",  dict(b=512, ts=256)),
        ("vpu      b512 ch1024",        dict(b=512)),
    ]
    results = {}
    ref = None
    for name, kw in variants:
        fn = jax.jit(lambda *a, _kw=kw: nbk.neighbor_pass_blocks(
            *a, cfg=cfg, **_kw))
        out = fn(*args)
        _sync(out)
        if ref is None:
            ref = jax.device_get(out[0])
        else:
            got = jax.device_get(out[0])
            err = np.abs(got - ref).max() / max(1.0, np.abs(ref).max())
            # acc_mxu trades ~1e-5 relative accumulation error for speed
            assert err < 5e-4, (name, err)
        results[name] = timed(f"neighbor_pass_blocks {name}", fn, *args)

    timed("prepare (b256 ch1024)",
          jax.jit(lambda *a: nbk.prepare(*a, cfg=cfg)), *args)

    best = min(results, key=results.get)
    print(f"\nbest: {best}  {results[best]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

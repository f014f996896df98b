"""TPU probe: does the client wedge when two jit programs of DIFFERENT
bucket widths embed the SAME fixed-width cluster-pair Pallas kernel?

The platform finding (NOTES.md): after one Pallas-bearing program shape has
been dispatched, the second dispatch of a SECOND Pallas-bearing shape
returns ``INVALID_ARGUMENT: TPU backend error`` and wedges the client.
Every prior repro varied the KERNEL shape (the active prefix resizes the
pallas grid/outputs).  If the wedge keys on the embedded kernel executable,
padding the kernel inputs to a CONSTANT width would unlock dynamic
re-bucketing on TPU (sorts/lifecycle at the live-population bucket, kernel
at a fixed width with empty pad blocks skipped via nact=0).

Usage:
  python tools/probe_fixed_kernel_width.py            # the probe (TPU)
  python tools/probe_fixed_kernel_width.py --control  # known-bad: two
      kernel widths — EXPECTED to wedge (proves the process is sensitive)

Interpret the pair: control wedges + probe survives => the wedge keys on
the kernel shape and the fixed-width plan is viable.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from particlesystem_tpu.core.config import GridSpec, NBodyConfig
from particlesystem_tpu.ops import neighbor_blocks as nbk

B_T = 256    # kernel tile rows (small: fast compile)
CH_T = 256
KW = 2048    # the constant kernel width (capacity)

CFG = NBodyConfig(n_fill=400, capacity=KW,
                  grid=GridSpec(grid_dim=8, chunk_factor=2),
                  max_per_cell=64, seed=3)


def pass_fixed_width(pos, age, w, cell, alive, kernel_rows: int):
    """prepare() at the caller's width, kernel at ``kernel_rows``."""
    n = cell.shape[0]
    snap, chunks, order, overflow_s, max_occ, counts, n_drop = nbk.prepare(
        pos, age, w, cell, alive, CFG, ch=CH_T, b=B_T)
    if kernel_rows > n:
        snap = jnp.pad(snap, ((0, 0), (0, kernel_rows - n)))
        chunks = jnp.pad(chunks,
                         ((0, (kernel_rows - n) // B_T), (0, 0), (0, 0)))
    out = nbk.kernel_call(CFG, snap, chunks, kernel_rows, ch=CH_T, b=B_T)
    out = out[:, :n]
    acc, kill, touch, overflow = nbk.unsort_outputs(out, order, overflow_s)
    return acc, kill, touch


def make_prog(width: int, kernel_rows: int):
    @jax.jit
    def prog(pos, age, w, cell, alive, frame):
        acc, kill, touch = pass_fixed_width(pos, age, w, cell, alive,
                                            kernel_rows)
        return (acc + jnp.float32(frame),
                jnp.sum(kill.astype(jnp.int32)) + jnp.sum(
                    touch.astype(jnp.int32)))
    return prog


def inputs(width: int, seed: int):
    k = jax.random.key(seed)
    ks = jax.random.split(k, 3)
    half = CFG.grid.grid_dim * CFG.grid.cell_size / 2.0
    pos = jax.random.uniform(ks[0], (width, 3), jnp.float32, -half, half)
    age = jax.random.uniform(ks[1], (width,), jnp.float32, 3.0, 8.0)
    w = jnp.full((width,), 60.0, jnp.float32)
    alive = jnp.arange(width) < (width * 3 // 4)
    from particlesystem_tpu.ops.grid import coords_to_cell, wrap_positions
    _, coords = wrap_positions(pos, CFG.grid)
    cell = coords_to_cell(coords, CFG.grid)
    return pos, age, w, cell, alive


def dispatch(prog, args, frame):
    acc, k = prog(*args, jnp.int32(frame))
    # sync via tiny host readback (block_until_ready unreliable on the relay)
    a = np.asarray(acc[:4, 0])
    kv = int(k)
    assert np.all(np.isfinite(a)), a
    return kv


def main():
    control = "--control" in sys.argv
    w1, w2 = 1024, 2048
    kr1 = w1 if control else KW   # control: kernel width tracks the bucket
    kr2 = w2 if control else KW
    label = "CONTROL (two kernel widths)" if control \
        else "PROBE (one kernel width)"
    print(f"{label} on {jax.default_backend()}: "
          f"buckets {w1}/{w2}, kernel rows {kr1}/{kr2}", flush=True)

    pa = make_prog(w1, kr1)
    pb = make_prog(w2, kr2)
    args1 = inputs(w1, 0)
    args2 = inputs(w2, 1)

    t0 = time.time()
    dispatch(pa, args1, 0)
    print(f"A first dispatch ok ({time.time()-t0:.0f}s)", flush=True)
    dispatch(pa, args1, 1)
    print("A second dispatch ok", flush=True)
    t0 = time.time()
    dispatch(pb, args2, 2)
    print(f"B first dispatch ok ({time.time()-t0:.0f}s)", flush=True)
    dispatch(pb, args2, 3)   # the documented wedge point
    print("B SECOND dispatch ok <- the wedge point passed", flush=True)
    for f in range(4, 10):
        prog, args = (pa, args1) if f % 2 else (pb, args2)
        dispatch(prog, args, f)
    print(f"{label}: SURVIVED interleaved dispatches", flush=True)


if __name__ == "__main__":
    main()

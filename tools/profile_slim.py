"""A/B the slim (7-field) vs packed8 state layouts at 10M slots.

The device clock is bimodal and drifts between runs (NOTES.md measurement
gotchas), so sequential per-variant timing is unreliable: the same
physics-only loop measured 0.72 ms in one process and 0.98 ms in the next.
This tool interleaves all variants round-robin across many passes and
reports the per-variant MINIMUM (the best estimator under random
down-clock windows) next to the median.

Usage: python tools/profile_slim.py [capacity] [passes]   (default 10M, 6)
"""

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

from bench import scene, full_packed
from particlesystem_tpu.ops import fused_step as fs
from particlesystem_tpu.runtime.engine import PackedEngine


def slope_once(fn, state, k_short=16, k_long=112):
    """One slope sample: ms/frame net of dispatch latency."""
    t0 = time.perf_counter()
    state = fn(state, k_short)
    float(jnp.sum(jax.tree_util.tree_leaves(state)[0][:8]))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = fn(state, k_long)
    float(jnp.sum(jax.tree_util.tree_leaves(state)[0][:8]))
    t_l = time.perf_counter() - t0
    return state, (t_l - t_s) / (k_long - k_short) * 1e3


def main():
    capacity = int(sys.argv[1]) if len(sys.argv) > 1 else 10 * (1 << 20)
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = scene(capacity)
    f8 = full_packed(cfg, jax.random.key(0))
    x, y, z, vx, vy, vz, age, life = f8
    death = (life - age) / jnp.float32(cfg.dt)
    f7 = (x, y, z, vx, vy, vz, death)

    variants = {}  # name -> (fn, state)

    def loop(step):
        return jax.jit(
            lambda st, k: jax.lax.fori_loop(0, k, lambda _, s: step(s), st,
                                            unroll=2),
            static_argnums=1, donate_argnums=0)

    variants["physics_packed8"] = (
        loop(lambda s: fs.physics_step(s, cfg)),
        tuple(jnp.array(a) for a in f8))
    variants["physics_slim"] = (
        loop(lambda s: fs.physics_step_slim(s, cfg)),
        tuple(jnp.array(a) for a in f7))

    for layout in ("packed8", "slim"):
        for alloc in ("ring", "strided", "select"):
            try:
                eng = PackedEngine(cfg, alloc=alloc, layout=layout)
            except ValueError:
                continue  # strided needs slots divisible by the padded budget
            es = eng.init(full_packed(cfg, jax.random.key(0)))
            variants[f"engine_{layout}_{alloc}"] = (
                (lambda e: lambda s, k: e.step_many(s, k))(eng), es)

    # compile + warm every variant once before any timing
    states = {}
    for name, (fn, st) in variants.items():
        st = fn(st, 16)
        st = fn(st, 112)
        float(jnp.sum(jax.tree_util.tree_leaves(st)[0][:8]))
        states[name] = st

    samples = {name: [] for name in variants}
    for p in range(passes):
        for name, (fn, _) in variants.items():
            states[name], ms = slope_once(fn, states[name])
            samples[name].append(ms)
        print(f"pass {p}: " + "  ".join(
            f"{n}={samples[n][-1]:.3f}" for n in variants), flush=True)

    print()
    for name in variants:
        v = samples[name]
        print(f"{name:20s} min {min(v):7.3f}  med {np.median(v):7.3f} "
              f" ms/frame", flush=True)


if __name__ == "__main__":
    main()

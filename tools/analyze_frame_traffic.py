"""Where do the engine frame's extra bytes go?  Compare XLA cost-analysis
bytes-accessed/frame for physics-only vs full-engine loops in both layouts.

Usage: python tools/analyze_frame_traffic.py [capacity]   (default 10M)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import scene, full_packed
from particlesystem_tpu.ops import fused_step as fs
from particlesystem_tpu.runtime.engine import PackedEngine

K = 16


def report(name, fn, state, n):
    lowered = jax.jit(fn, donate_argnums=0).lower(state)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ba = ca.get("bytes accessed", float("nan"))
    words = ba / K / n / 4
    print(f"{name:22s} bytes/frame {ba/K/1e6:9.1f} MB "
          f"= {words:6.2f} words/slot", flush=True)
    return compiled


def main():
    capacity = int(sys.argv[1]) if len(sys.argv) > 1 else 10 * (1 << 20)
    cfg = scene(capacity)
    n = cfg.slots
    f8 = full_packed(cfg, jax.random.key(0))
    x, y, z, vx, vy, vz, age, life = f8
    death = (life - age) / jnp.float32(cfg.dt)
    f7 = (x, y, z, vx, vy, vz, death)

    def loop(step):
        return lambda st: jax.lax.fori_loop(0, K, lambda _, s: step(s), st,
                                            unroll=2)

    report("physics_packed8", loop(lambda s: fs.physics_step(s, cfg)),
           tuple(jnp.array(a) for a in f8), n)
    report("physics_slim", loop(lambda s: fs.physics_step_slim(s, cfg)),
           tuple(jnp.array(a) for a in f7), n)

    for layout in ("packed8", "slim"):
        eng = PackedEngine(cfg, alloc="ring", layout=layout)
        es = eng.init(full_packed(cfg, jax.random.key(0)))
        report(f"engine_{layout}",
               lambda st: jax.lax.fori_loop(0, K, lambda _, s: eng._frame(s),
                                            st, unroll=2), es, n)


if __name__ == "__main__":
    main()

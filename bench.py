"""Benchmark: particle-steps/sec/chip on the fused emitter-scene step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.md): >= 1e10 particle-steps/sec on one v5e chip at 10M
particles, fused step HBM-bandwidth-bound.  ``vs_baseline`` is value/1e10.

Scene = BASELINE config 5 shape: multi-emitter, full force stack
(gravity + wind + drag), ground plane + sphere collider, on-device ring
recycling.  All slots start alive so the metric counts real particle
updates.

Measurement method: frames run in device-side ``fori_loop`` batches
(``step_many``) and sync via a tiny host readback; per-frame time is the
slope between a short and a long batch, which cancels the dispatch/sync
latency of the remote-attached TPU (~25 ms per round trip).
"""

import json
import os
import sys
import time

import jax

# persistent compile cache: re-runs start in seconds instead of recompiling
# every signature through the axon relay (20-500 s each)
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from particlesystem_tpu.core.config import (Emitter, EmitterSceneConfig,
                                            PlaneCollider, SphereCollider)
from particlesystem_tpu.runtime.engine import PackedEngine

BASELINE_TARGET = 1e10  # particle-steps/sec/chip (BASELINE.json north star)


def scene(capacity: int) -> EmitterSceneConfig:
    return EmitterSceneConfig(
        capacity=capacity,
        dt=1.0 / 60.0,
        gravity=(0.0, -9.8, 0.0),
        wind=(2.0, 0.0, -0.5),
        drag=0.2,
        emitters=(
            Emitter(pos=(0.0, 1.0, 0.0), direction=(0.0, 1.0, 0.0),
                    speed=10.0, rate=60_000.0, life_min=20.0, life_max=40.0),
            Emitter(pos=(5.0, 1.0, 0.0), direction=(-0.2, 1.0, 0.1),
                    speed=8.0, rate=40_000.0, life_min=20.0, life_max=40.0),
        ),
        planes=(PlaneCollider(point=(0, 0, 0), normal=(0, 1, 0),
                              restitution=0.5, friction=0.2),),
        spheres=(SphereCollider(center=(2.0, 3.0, 0.0), radius=1.5,
                                restitution=0.4, friction=0.1),),
        seed=1,
    )


def full_packed(cfg, key):
    """All slots alive with long lifetimes: the metric counts real updates."""
    n = cfg.slots
    ks = jax.random.split(key, 3)
    pos = jax.random.uniform(ks[0], (3, n), jnp.float32, -20.0, 20.0)
    vel = jax.random.uniform(ks[1], (3, n), jnp.float32, -5.0, 5.0)
    life = jax.random.uniform(ks[2], (n,), jnp.float32, 30.0, 60.0)
    age = life * 0.1
    return (pos[0], pos[1], pos[2], vel[0], vel[1], vel[2], age, life)


def _sync(es) -> float:
    return float(jnp.sum(es.fields[0][:8]))


def bench_capacity(capacity: int, k_short: int = 16, k_long: int = 112,
                   reps: int = 5):
    cfg = scene(capacity)
    eng = PackedEngine(cfg, alloc="ring")
    es = eng.init(full_packed(cfg, jax.random.key(0)))

    # compile both batch sizes
    es = eng.step_many(es, k_short)
    es = eng.step_many(es, k_long)
    _sync(es)

    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        es = eng.step_many(es, k_short)
        _sync(es)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        es = eng.step_many(es, k_long)
        _sync(es)
        t_long = time.perf_counter() - t0
        samples.append((t_long - t_short) / (k_long - k_short))
    per_frame = float(np.median(samples))
    assert per_frame > 0, samples
    alive = int(eng.alive_count(es))
    return cfg.slots / per_frame, per_frame * 1e3, alive


def bench_nbody(n_fill: int = 1 << 20, grid_dim: int = 16,
                k_short: int = 1, k_long: int = 4, reps: int = 3):
    """The reference simulation (cluster-pair Pallas kernel) — per-frame
    time by dispatch-count slope, the same method ``bench_capacity`` uses:
    the ~25 ms relay dispatch/sync latency of the remote-attached TPU is a
    fixed per-measurement cost, so the slope between a short and a long
    frame batch cancels it (NOTES.md measurement gotchas; per-frame sync
    timing would overstate a 1M frame by ~25%)."""
    from particlesystem_tpu.core.config import GridSpec, NBodyConfig
    from particlesystem_tpu.models import nbody

    cfg = NBodyConfig(n_fill=n_fill, grid=GridSpec(grid_dim=grid_dim))
    state = nbody.init_fill(cfg)

    def body(i, carry):
        s, _ = carry
        return nbody.step(s, i, cfg, 0, "blocks")

    jits = {k: jax.jit(lambda s, f0, _k=k: jax.lax.fori_loop(
        f0, f0 + _k, body, nbody.step(s, f0 - 1, cfg, 0, "blocks")))
        for k in (k_short, k_long)}

    # warm: compile both batch sizes + reach steady-state occupancy
    state, stats = jits[k_short](state, jnp.int32(1))
    state, stats = jits[k_long](state, jnp.int32(k_short + 2))
    int(stats.n_alive)
    frame = k_short + k_long + 2
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, stats = jits[k_short](state, jnp.int32(frame + 1))
        int(stats.n_alive)  # sync
        t_short = time.perf_counter() - t0
        frame += k_short + 1
        t0 = time.perf_counter()
        state, stats = jits[k_long](state, jnp.int32(frame + 1))
        int(stats.n_alive)  # sync
        t_long = time.perf_counter() - t0
        frame += k_long + 1
        samples.append((t_long - t_short) / (k_long - k_short))
    return float(np.median(samples)) * 1e3, int(stats.n_alive)


def main():
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"WARNING: benchmarking on {backend}, not TPU", file=sys.stderr)

    # 1M: long batches spanning several device clock windows (the frame is
    # ~0.1 ms, so short batches land entirely inside one of the bimodal
    # clock states — NOTES.md); median slope over many reps is the robust
    # number
    rate_1m, p50_1m, alive_1m = bench_capacity(1 << 20, k_short=32,
                                               k_long=544, reps=9)
    print(f"1M:  {rate_1m:.3e} particle-steps/s  p50 {p50_1m:.3f} ms "
          f"(alive {alive_1m})", file=sys.stderr)
    cap_10m = 10 * (1 << 20)
    rate_10m, p50_10m, alive_10m = bench_capacity(cap_10m)
    print(f"10M: {rate_10m:.3e} particle-steps/s  p50 {p50_10m:.3f} ms "
          f"(alive {alive_10m})", file=sys.stderr)
    nbody_ms, nbody_alive = bench_nbody()
    print(f"n-body 1M (reference sim): {nbody_ms:.0f} ms/frame "
          f"(alive {nbody_alive})", file=sys.stderr)
    nbody10_ms, nbody10_alive = bench_nbody(n_fill=10 << 20, grid_dim=32,
                                            k_short=1, k_long=3, reps=2)
    print(f"n-body 10M/32^3: {nbody10_ms:.0f} ms/frame "
          f"(alive {nbody10_alive})", file=sys.stderr)

    print(json.dumps({
        "metric": "particle_steps_per_sec_at_10M",
        "value": round(rate_10m, 1),
        "unit": "particle-steps/s/chip",
        "vs_baseline": round(rate_10m / BASELINE_TARGET, 4),
        "p50_frame_ms_10M": round(p50_10m, 4),
        "particle_steps_per_sec_at_1M": round(rate_1m, 1),
        "p50_frame_ms_1M": round(p50_1m, 4),
        "nbody_1M_ms_per_frame": round(nbody_ms, 1),
        "nbody_10M_ms_per_frame": round(nbody10_ms, 1),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()

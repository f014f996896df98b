"""Break the 1M emitter frame into timed pieces on the real TPU.

Full-frame cost comes from the chained step_many slope exactly like
bench.py (engine steps DONATE their input, so never re-dispatch the same
state object).  Sub-pieces (physics, spawn generation, ring write) are
donation-free jits timed by dispatch-count slope with host-readback sync
(block_until_ready is unreliable through the axon relay)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (the bench scene IS the profiled workload)
from particlesystem_tpu.models import emitter as em  # noqa: E402
from particlesystem_tpu.ops import fused_step as fs  # noqa: E402
from particlesystem_tpu.runtime.engine import PackedEngine  # noqa: E402


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[:8]))


def timed(name, f, *args, k1=8, k2=64):
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
    print(f"{name:28s} {ms * 1e3:9.1f} us", flush=True)
    return ms


def main():
    cfg = bench.scene(1 << 20)
    eng = PackedEngine(cfg, alloc="ring")
    es = eng.init(bench.full_packed(cfg, jax.random.key(0)))
    print(f"slots={cfg.slots} shadow={eng.shadow}", flush=True)

    # full frame: chained step_many slope (the bench methodology)
    es = eng.step_many(es, 16)
    es = eng.step_many(es, 112)
    _sync(es.fields[0])
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        es = eng.step_many(es, 16)
        _sync(es.fields[0])
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        es = eng.step_many(es, 112)
        _sync(es.fields[0])
        samples.append((time.perf_counter() - t0 - t_short) / 96)
    per_frame = float(np.median(samples))
    print(f"{'full frame (step_many slope)':28s} {per_frame * 1e6:9.1f} us",
          flush=True)

    fields = es.fields
    timed("physics_step", jax.jit(lambda f: fs.physics_step(f, cfg)), fields)

    frame, accum = es.frame, es.accum
    timed("spawn_fields",
          jax.jit(lambda fr, ac: em.spawn_fields(cfg, fr, ac)), frame, accum)

    spawn, _ = jax.jit(lambda fr, ac: em.spawn_fields(cfg, fr, ac))(
        frame, accum)
    _sync(spawn.pos)
    rows = jax.jit(fs.pack_spawn_rows)(spawn)
    _sync(rows[0])
    pad = eng.shadow - rows[0].shape[0]
    if pad:
        rows = tuple(jnp.pad(r, (0, pad)) for r in rows)
        valid = jnp.pad(spawn.valid, (0, pad))
    else:
        valid = spawn.valid
    _sync((rows[0], valid))
    timed("ring_spawn",
          jax.jit(lambda f, r, v, c: fs.ring_spawn(f, r, v, c, cfg.slots)),
          fields, rows, valid, es.cursor)

    @jax.jit
    def spawn_plus_ring(fields, fr, ac, c):
        spawn, ac2 = em.spawn_fields(cfg, fr, ac)
        rows = fs.pack_spawn_rows(spawn)
        pad = eng.shadow - rows[0].shape[0]
        if pad:
            rows = tuple(jnp.pad(r, (0, pad)) for r in rows)
            valid = jnp.pad(spawn.valid, (0, pad))
        else:
            valid = spawn.valid
        return fs.ring_spawn(fields, rows, valid, c, cfg.slots)
    timed("spawn+pack+ring (fused)", spawn_plus_ring, fields, frame, accum,
          es.cursor)


if __name__ == "__main__":
    main()

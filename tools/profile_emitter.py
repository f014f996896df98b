"""Break the 1M emitter frame into timed pieces on the real TPU.

Same dispatch-slope methodology as profile_nbody (block_until_ready is
unreliable through the axon relay; sync via tiny host readback, hold all
results live until the sync)."""

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
    es = eng.step_many(es, 8)
    _sync(es.fields[0])
    print(f"slots={cfg.slots} shadow={eng.shadow}", flush=True)

    # step_many slope = the true per-frame cost in the fori_loop
    def loop(k):
        eng.step_many(es, k)  # donation disabled? step_many donates; copy
    es2 = jax.tree.map(lambda a: a + 0 if hasattr(a, 'dtype') else a, es)

    timed("single step (jit)", eng.step, jax.tree.map(jnp.array, es))

    fields = es.fields
    timed("physics_step", jax.jit(lambda f: fs.physics_step(f, cfg)), fields)

    frame = es.frame
    accum = es.accum
    timed("spawn_fields",
          jax.jit(lambda fr, ac: em.spawn_fields(cfg, fr, ac)), frame, accum)

    spawn, _ = jax.jit(lambda fr, ac: em.spawn_fields(cfg, fr, ac))(
        frame, accum)
    _sync(spawn.pos)
    timed("pack_spawn_rows", jax.jit(fs.pack_spawn_rows), spawn)

    rows = jax.jit(fs.pack_spawn_rows)(spawn)
    _sync(rows[0])
    pad = eng.shadow - rows[0].shape[0]
    if pad:
        rows = tuple(jnp.pad(r, (0, pad)) for r in rows)
        valid = jnp.pad(spawn.valid, (0, pad))
    else:
        valid = spawn.valid
    _sync(rows[0])
    timed("ring_spawn",
          jax.jit(lambda f, r, v, c: fs.ring_spawn(f, r, v, c, cfg.slots)),
          fields, rows, valid, es.cursor)


if __name__ == "__main__":
    main()

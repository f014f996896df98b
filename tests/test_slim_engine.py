"""Slim-layout engine (7 fields, derived liveness) parity tests.

The slim layout replaces the per-frame age/life read-modify-write with a
spawn-time absolute ``death_frame`` and integrates dead rows unconditionally
(garbage until respawn) — 13 HBM words per particle-frame instead of 15.
Contracts verified here:

* trajectory parity with an independent numpy mirror (alive rows only —
  dead rows are explicitly undefined), alive mask exact per frame;
* bitwise agreement with the packed8 ring engine on rows that are alive in
  both (same physics math, same ring targets);
* packed8 -> slim initial-state conversion preserves the alive census.
"""

import jax
import jax.numpy as jnp
import numpy as np

from particlesystem_tpu.core.config import (Emitter, EmitterSceneConfig,
                                            PlaneCollider, SphereCollider)
from particlesystem_tpu.cpu_ref import oracle_emitter
from particlesystem_tpu.models import emitter as em
from particlesystem_tpu.ops import fused_step as fs
from particlesystem_tpu.runtime.engine import PackedEngine


def scene(**kw):
    base = dict(
        capacity=2048,
        dt=1 / 60,
        gravity=(0.0, -9.8, 0.0),
        drag=0.4,
        wind=(2.0, 0.0, -0.5),
        emitters=(
            Emitter(pos=(0.0, 1.0, 0.0), direction=(0.0, 1.0, 0.0),
                    speed=8.0, rate=4000.0, life_min=0.4, life_max=1.2),
            Emitter(pos=(2.0, 0.5, 0.0), direction=(-0.3, 1.0, 0.2),
                    speed=5.0, rate=2500.0, cone_angle=0.6),
        ),
        planes=(PlaneCollider(point=(0, 0, 0), normal=(0, 1, 0),
                              restitution=0.6, friction=0.3),),
        spheres=(SphereCollider(center=(0.5, 2.0, 0.0), radius=0.7,
                                restitution=0.4, friction=0.1),),
        seed=11,
    )
    base.update(kw)
    return EmitterSceneConfig(**base)


def test_slim_matches_numpy_oracle():
    cfg = scene()
    eng = PackedEngine(cfg, alloc="ring", layout="slim")
    es = eng.init()
    n = cfg.slots

    pos = np.zeros((n, 3), np.float32)
    vel = np.zeros((n, 3), np.float32)
    death = np.zeros((n,), np.float32)
    cursor = 0
    accum = jnp.zeros((len(cfg.emitters),), jnp.float32)
    gen = jax.jit(lambda a, f: em.spawn_fields(cfg, f, a))

    for frame in range(90):
        spawn, accum = gen(accum, jnp.int32(frame))
        es = eng.step(es)
        pos, vel, death, cursor = oracle_emitter.step_slim(
            pos, vel, death, cursor, frame,
            np.asarray(spawn.pos), np.asarray(spawn.vel),
            np.asarray(spawn.life), np.asarray(spawn.valid), cfg)

        alive_np = (frame + 1) < death
        alive_dev = np.asarray(
            fs.alive_mask_slim(es.fields[6][:n], es.frame))
        np.testing.assert_array_equal(alive_dev, alive_np,
                                      err_msg=f"frame {frame} alive")
        dev = np.stack([np.asarray(es.fields[i][:n]) for i in range(3)], 1)
        np.testing.assert_allclose(dev[alive_np], pos[alive_np],
                                   rtol=1e-3, atol=5e-5,
                                   err_msg=f"frame {frame} pos")
        dev = np.stack([np.asarray(es.fields[i][:n]) for i in range(3, 6)], 1)
        np.testing.assert_allclose(dev[alive_np], vel[alive_np],
                                   rtol=1e-3, atol=5e-5,
                                   err_msg=f"frame {frame} vel")
    assert int(np.sum(alive_np)) > 100, "scene never populated"
    assert int(eng.alive_count(es)) == int(np.sum(alive_np))


def test_slim_matches_packed8_on_alive_rows():
    """With the same ring allocator and spawn stream, slim and packed8 must
    produce bitwise-identical coordinates on rows alive in packed8 (physics
    math is shared; only liveness bookkeeping differs)."""
    cfg = scene(emitters=(
        Emitter(pos=(0.0, 1.0, 0.0), direction=(0.0, 1.0, 0.0),
                speed=8.0, rate=4000.0, life_min=500.0, life_max=900.0),
    ))
    e8 = PackedEngine(cfg, alloc="ring", layout="packed8")
    e7 = PackedEngine(cfg, alloc="ring", layout="slim")
    s8, s7 = e8.init(), e7.init()
    n = cfg.slots
    for _ in range(50):
        s8, s7 = e8.step(s8), e7.step(s7)
    age, life = np.asarray(s8.fields[6][:n]), np.asarray(s8.fields[7][:n])
    alive8 = (age <= life) & (life > 0)
    alive7 = np.asarray(fs.alive_mask_slim(s7.fields[6][:n], s7.frame))
    np.testing.assert_array_equal(alive7, alive8)
    assert alive8.sum() > 100
    for i in range(6):
        a = np.asarray(s8.fields[i][:n])[alive8]
        b = np.asarray(s7.fields[i][:n])[alive8]
        np.testing.assert_array_equal(a, b, err_msg=f"field {i}")


def test_slim_init_converts_packed8_fields():
    cfg = scene()
    n = cfg.slots
    rng = np.random.default_rng(3)
    fields = [jnp.asarray(rng.normal(size=n).astype(np.float32))
              for _ in range(6)]
    age = jnp.asarray(rng.uniform(0, 2, n).astype(np.float32))
    life = jnp.asarray(
        np.where(rng.uniform(size=n) < 0.5, 0.0,
                 rng.uniform(1, 3, n)).astype(np.float32))
    alive_ref = np.asarray((age <= life) & (life > 0))
    eng = PackedEngine(cfg, alloc="ring", layout="slim")
    es = eng.init(tuple(fields) + (age, life))
    assert int(eng.alive_count(es)) == int(alive_ref.sum())
    np.testing.assert_array_equal(
        np.asarray(fs.alive_mask_slim(es.fields[6][:n], es.frame)),
        alive_ref)

"""The five BASELINE.md benchmark configs as integration tests (reduced
scale so they run on the CPU test mesh; bench.py runs the full scale on
hardware).

1. gravity-only fountain, forward Euler, fixed dt, CPU-reference validated
2. drag + wind forces with per-particle lifetime/fade
3. ground-plane + sphere collision (restitution/friction) fused in the step
4. continuous emitter with on-device compaction and recycling
5. multi-emitter full-stack scene with double-buffered async readback
"""

import jax
import jax.numpy as jnp
import numpy as np

from particlesystem_tpu import Emitter, EmitterSceneConfig, PlaneCollider, SphereCollider
from particlesystem_tpu.api import ParticleSystem
from particlesystem_tpu.core.state import zero_state
from particlesystem_tpu.cpu_ref import oracle_emitter
from particlesystem_tpu.models import emitter as em
from particlesystem_tpu.runtime.engine import PackedEngine


def test_config1_fountain_with_cpu_reference():
    cfg = EmitterSceneConfig(
        capacity=10_240, dt=1 / 60, gravity=(0.0, -9.8, 0.0),
        emitters=(Emitter(pos=(0, 0.5, 0), direction=(0, 1, 0), speed=9.0,
                          rate=5_000.0, life_min=1.0, life_max=2.0),),
        seed=42)
    state = zero_state(cfg.slots)
    ora = oracle_emitter.NpState.from_jax(state)
    accum = jnp.zeros((1,), jnp.float32)
    gen = jax.jit(lambda a, f: em.spawn_fields(cfg, f, a))
    step = jax.jit(lambda s, sp: em.step_core(s, sp, cfg))
    for frame in range(30):
        spawn, accum = gen(accum, jnp.int32(frame))
        state = step(state, spawn)
        ora = oracle_emitter.step(ora, np.asarray(spawn.pos),
                                  np.asarray(spawn.vel), np.asarray(spawn.life),
                                  np.asarray(spawn.w), np.asarray(spawn.valid),
                                  cfg)
        np.testing.assert_array_equal(np.asarray(state.alive), ora.alive)
    np.testing.assert_allclose(np.asarray(state.pos), ora.pos,
                               rtol=1e-3, atol=1e-4)
    assert int(ora.alive.sum()) > 1000


def test_config2_drag_wind_lifetime_fade():
    ps = (ParticleSystem(capacity=20_480, dt=1 / 60, gravity=(0, -9.8, 0),
                         drag=0.8, wind=(4.0, 0.0, 0.0))
          .add_emitter(pos=(0, 2, 0), rate=40_000.0, speed=6.0,
                       life_min=0.3, life_max=0.9))
    ps.step(40)
    assert ps.alive_count() > 1000
    fade = ps.fade()
    assert fade.min() >= 0 and fade.max() <= 1 + 1e-6
    # drag toward wind: mean x-velocity should be pulled positive over time
    p = np.asarray(ps.packed())
    vx = p[3][ps.alive_mask()]
    assert vx.mean() > 0.0


def test_config3_plane_sphere_restitution_friction():
    ps = (ParticleSystem(capacity=8_192, dt=1 / 60, gravity=(0, -9.8, 0))
          .add_emitter(pos=(0, 3, 0), direction=(0.3, -1, 0), rate=20_000.0,
                       speed=5.0, life_min=2.0, life_max=3.0)
          .add_plane(point=(0, 0, 0), normal=(0, 1, 0), restitution=0.6,
                     friction=0.2)
          .add_sphere(center=(0.5, 1.0, 0.0), radius=0.5, restitution=0.5,
                      friction=0.1))
    ps.step(90)
    xyz = ps.positions()
    assert xyz[:, 1].min() >= -1e-3                      # plane holds
    d = np.linalg.norm(xyz - np.array([0.5, 1.0, 0.0]), axis=1)
    assert d.min() >= 0.5 - 1e-3                         # sphere holds


def test_config4_continuous_emitter_recycling():
    # spawn rate far beyond capacity: recycling must reach steady state
    cfg = EmitterSceneConfig(
        capacity=4_096, dt=1 / 60,
        emitters=(Emitter(rate=100_000.0, life_min=0.1, life_max=0.2),))
    for alloc, kw in (("exact", dict(refresh_interval=2)), ("ring", {})):
        eng = PackedEngine(cfg, alloc=alloc, **kw)
        es = eng.init()
        counts = []
        for _ in range(60):
            es = eng.step(es)
            counts.append(int(eng.alive_count(es)))
        assert max(counts) <= cfg.slots
        assert counts[-1] > 0.3 * cfg.slots, (alloc, counts[-10:])


def test_config5_full_stack_async_readback():
    ps = (ParticleSystem(capacity=16_384, dt=1 / 60, gravity=(0, -9.8, 0),
                         drag=0.2, wind=(1.0, 0, 0), alloc="ring")
          .add_emitter(pos=(0, 1, 0), rate=30_000.0, speed=8.0,
                       life_min=0.5, life_max=1.5)
          .add_emitter(pos=(3, 1, 0), direction=(-0.2, 1, 0), rate=20_000.0,
                       speed=6.0, life_min=0.5, life_max=1.5)
          .add_plane(restitution=0.5, friction=0.2)
          .add_sphere(center=(1.5, 2.0, 0.0), radius=0.8))
    rb = ps.enable_readback(depth=2)
    for _ in range(12):
        ps.step(1)
    rb.flush()
    assert rb.published + rb.dropped == 12
    frame = rb.ring.pop((8, 16384))
    assert frame is not None
    age, life = frame[6], frame[7]
    assert ((age <= life) & (life > 0)).sum() > 100

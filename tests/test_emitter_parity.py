"""CPU-oracle vs jitted-XLA trajectory parity for the emitter scene.

This is the validation the reference stubbed out (``DoCompare`` returns 0
unconditionally, ``particleSystem.cpp:2254-2257``): every frame of a
multi-frame run must match the independent numpy implementation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlesystem_tpu import Emitter, EmitterSceneConfig, PlaneCollider, SphereCollider
from particlesystem_tpu.core.state import zero_state
from particlesystem_tpu.cpu_ref import oracle_emitter
from particlesystem_tpu.models import emitter as em


def scene(**kw):
    base = dict(
        capacity=4096,
        dt=1 / 60,
        gravity=(0.0, -9.8, 0.0),
        emitters=(
            Emitter(pos=(0.0, 1.0, 0.0), direction=(0.0, 1.0, 0.0),
                    speed=8.0, rate=6000.0, life_min=0.5, life_max=1.5),
            Emitter(pos=(2.0, 0.5, 0.0), direction=(-0.3, 1.0, 0.2),
                    speed=5.0, rate=3000.0, cone_angle=0.6),
        ),
        seed=7,
    )
    base.update(kw)
    return EmitterSceneConfig(**base)


CONFIGS = {
    "fountain": scene(),
    "drag_wind": scene(drag=0.8, wind=(3.0, 0.0, -1.0)),
    "colliders": scene(
        planes=(PlaneCollider(point=(0, 0, 0), normal=(0, 1, 0),
                              restitution=0.6, friction=0.3),),
        spheres=(SphereCollider(center=(0.5, 2.0, 0.0), radius=0.7,
                                restitution=0.4, friction=0.1),),
    ),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_trajectory_parity(name):
    cfg = CONFIGS[name]
    n_frames = 40

    state = zero_state(cfg.slots)
    accum = jnp.zeros((len(cfg.emitters),), jnp.float32)
    ora = oracle_emitter.NpState.from_jax(state)

    step = jax.jit(lambda s, sp: em.step_core(s, sp, cfg))
    gen = jax.jit(lambda a, f: em.spawn_fields(cfg, f, a))

    for frame in range(n_frames):
        spawn, accum = gen(accum, jnp.int32(frame))
        state = step(state, spawn)
        ora = oracle_emitter.step(
            ora,
            np.asarray(spawn.pos), np.asarray(spawn.vel),
            np.asarray(spawn.life), np.asarray(spawn.w),
            np.asarray(spawn.valid), cfg)

        np.testing.assert_array_equal(np.asarray(state.alive), ora.alive,
                                      err_msg=f"frame {frame} alive")
        for field in ("pos", "vel", "age", "life", "w"):
            np.testing.assert_allclose(
                np.asarray(getattr(state, field)), getattr(ora, field),
                rtol=1e-3, atol=5e-5, err_msg=f"frame {frame} {field}")

    assert int(np.sum(ora.alive)) > 100, "scene never populated"


def test_spawn_respects_capacity():
    cfg = scene(capacity=1024)  # rates overflow 1024 slots quickly
    state = zero_state(cfg.slots)
    accum = jnp.zeros((len(cfg.emitters),), jnp.float32)
    step = jax.jit(lambda s, a, f: em.step(s, a, f, cfg))
    for frame in range(120):
        state, accum = step(state, accum, jnp.int32(frame))
    alive = int(np.sum(np.asarray(state.alive)))
    assert alive <= cfg.slots
    assert alive > cfg.slots // 2  # saturated scene keeps recycling


def test_dead_slots_frozen():
    cfg = EmitterSceneConfig(capacity=1024, emitters=(), dt=0.1)
    state = zero_state(cfg.slots)
    state = dataclasses.replace(
        state, pos=state.pos + 5.0)  # sentinel values on dead slots
    spawn, _ = em.spawn_fields(cfg, jnp.int32(0), jnp.zeros((0,)))
    out = em.step_core(state, spawn, cfg)
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(out.age), np.asarray(state.age))

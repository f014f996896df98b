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


def test_strided_matches_ring_alive_multiset():
    """Below ring saturation, the budget-strided allocator must produce the
    exact same MULTISET of alive rows as the compacting ring (same spawn
    stream, same physics; only slot placement differs), in both layouts."""
    # strided consumes a full padded budget (1024 slots) per frame whatever
    # the spawn count, so "below saturation" for 60 frames needs >= 60 laps
    # of headroom: 2^16 slots = 64 budget-widths
    cfg = scene(capacity=1 << 16)
    for layout in ("packed8", "slim"):
        er = PackedEngine(cfg, alloc="ring", layout=layout)
        es = PackedEngine(cfg, alloc="strided", layout=layout)
        sr, ss = er.init(), es.init()
        for _ in range(60):
            sr, ss = er.step(sr), es.step(ss)
        assert int(er.alive_count(sr)) == int(es.alive_count(ss)) > 300

        def alive_rows(eng, s):
            n = cfg.slots
            if eng.layout == "slim":
                m = np.asarray(fs.alive_mask_slim(s.fields[6][:n], s.frame))
            else:
                age = np.asarray(s.fields[6][:n])
                life = np.asarray(s.fields[7][:n])
                m = (age <= life) & (life > 0)
            rows = np.stack([np.asarray(f[:n])[m] for f in s.fields], 1)
            return rows[np.lexsort(rows.T)]

        np.testing.assert_array_equal(alive_rows(er, sr), alive_rows(es, ss),
                                      err_msg=layout)


def test_select_matches_strided_bitwise():
    """``alloc='select'`` is ``alloc='strided'`` with the spawn write fused
    as a broadcast-select over natively-2D state — same slots, same values:
    the FULL flattened state must agree bitwise every frame, both layouts
    (select slot i lives at (i // W, i % W), so flattening restores slot
    order exactly)."""
    cfg = scene(capacity=1 << 14)
    for layout in ("packed8", "slim"):
        es_ = PackedEngine(cfg, alloc="strided", layout=layout)
        ec = PackedEngine(cfg, alloc="select", layout=layout)
        ss, sc = es_.init(), ec.init()
        assert sc.fields[0].shape == (ec.b_rows, ec.spawn_width)
        for frame in range(40):
            ss, sc = es_.step(ss), ec.step(sc)
            np.testing.assert_array_equal(
                np.asarray(ss.cursor), np.asarray(sc.cursor))
        for fi, (a, b) in enumerate(zip(es_.flat_fields(ss),
                                        ec.flat_fields(sc))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{layout} field {fi}")
        assert int(es_.alive_count(ss)) == int(ec.alive_count(sc)) > 100


def test_select_init_accepts_flat_and_2d_fields():
    cfg = scene(capacity=1 << 14)
    eng = PackedEngine(cfg, alloc="select", layout="slim")
    flat = tuple(jnp.arange(cfg.slots, dtype=jnp.float32) + i
                 for i in range(7))
    s1 = eng.init(flat)
    s2 = eng.init(tuple(f.reshape(eng.b_rows, eng.spawn_width)
                        for f in flat))
    for a, b, src in zip(s1.fields, s2.fields, flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a).reshape(-1),
                                      np.asarray(src))


def test_strided_requires_divisible_capacity():
    import pytest
    # rate 80k/s at dt=1/60 -> padded budget 2048; slots=3072 isn't divisible
    cfg = scene(capacity=3000, emitters=(
        Emitter(pos=(0.0, 1.0, 0.0), direction=(0.0, 1.0, 0.0),
                speed=8.0, rate=80_000.0),
    ))
    with pytest.raises(ValueError, match="divisible"):
        PackedEngine(cfg, alloc="strided")


def test_strided_saturation_recycles_slots():
    """At saturation the strided cursor laps the buffer and replaces the
    oldest slots; the population must stay bounded and healthy."""
    cfg = scene(capacity=1024, emitters=(
        Emitter(pos=(0.0, 1.0, 0.0), direction=(0.0, 1.0, 0.0),
                speed=8.0, rate=3000.0, life_min=50.0, life_max=90.0),
    ))
    eng = PackedEngine(cfg, alloc="strided", layout="slim")
    es = eng.init()
    lap = cfg.slots // eng.spawn_width
    for _ in range(4 * lap):
        es = eng.step(es)
    n_alive = int(eng.alive_count(es))
    assert 0 < n_alive <= cfg.slots
    x = np.asarray(es.fields[0][:cfg.slots])
    assert np.isfinite(x).all()


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

"""Runtime subsystems: API, checkpoint/resume, async readback ring, timers,
native library bindings."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from particlesystem_tpu.api import NBodySimulation, ParticleSystem
from particlesystem_tpu.core.config import GridSpec, NBodyConfig
from particlesystem_tpu.runtime import checkpoint
from particlesystem_tpu.runtime.readback import AsyncReadback, FrameRing
from particlesystem_tpu.utils import native
from particlesystem_tpu.utils.timers import PhaseTimers


def test_particle_system_api(tmp_path):
    ps = (ParticleSystem(capacity=4096, dt=1 / 60, gravity=(0, -9.8, 0),
                         drag=0.3, wind=(1.0, 0, 0))
          .add_emitter(pos=(0.0, 1.0, 0.0), rate=20_000.0, speed=8.0,
                       life_min=0.5, life_max=1.0)
          .add_plane(restitution=0.5, friction=0.2))
    ps.step(30)
    assert ps.frame == 30
    n = ps.alive_count()
    assert 0 < n <= 4096
    xyz = ps.positions()
    assert xyz.shape == (n, 3)
    assert xyz[:, 1].min() >= -1e-3     # ground plane holds
    fade = ps.fade()
    assert np.all((fade >= 0) & (fade <= 1.0 + 1e-6))

    with pytest.raises(RuntimeError):
        ps.add_emitter(rate=1.0)        # frozen after first step

    # checkpoint round trip
    path = str(tmp_path / "ck.npz")
    ps.save(path)
    before = np.asarray(ps.packed())
    ps.step(5)
    ps.load(path)
    np.testing.assert_array_equal(np.asarray(ps.packed()), before)


def test_particle_system_slim_checkpoint(tmp_path):
    """The slim layout's 7-field EngineState must round-trip through the
    npz checkpoint (pytree-generic save/load) and resume bit-exactly."""
    ps = (ParticleSystem(capacity=4096, dt=1 / 60, gravity=(0, -9.8, 0),
                         layout="slim", alloc="strided")
          .add_emitter(pos=(0.0, 1.0, 0.0), rate=20_000.0, speed=8.0,
                       life_min=0.5, life_max=1.0)
          .add_plane(restitution=0.5, friction=0.2))
    ps.step(30)
    assert ps.packed().shape[0] == 7
    assert 0 < ps.alive_count() <= 4096
    path = str(tmp_path / "ck.npz")
    ps.save(path)
    before = np.asarray(ps.packed())
    frame_before = ps.frame
    ps.step(5)
    ps.load(path)
    np.testing.assert_array_equal(np.asarray(ps.packed()), before)
    # liveness is derived from (death, frame): the frame counter must have
    # been restored too or every age-derived mask is wrong
    assert ps.frame == frame_before
    ps.step(5)  # resumes cleanly


def test_particle_system_select_checkpoint(tmp_path):
    """alloc='select' keeps the state natively (slots/W, W) 2-D — the
    pytree-generic checkpoint must round-trip those shapes and the cursor,
    and packed() must keep presenting the flat (n_fields, slots) view."""
    ps = (ParticleSystem(capacity=4096, dt=1 / 60, gravity=(0, -9.8, 0),
                         alloc="select")
          .add_emitter(pos=(0.0, 1.0, 0.0), rate=20_000.0, speed=8.0,
                       life_min=0.5, life_max=1.0)
          .add_plane(restitution=0.5, friction=0.2))
    ps.step(30)
    assert ps.packed().shape == (8, 4096)
    assert 0 < ps.alive_count() <= 4096
    path = str(tmp_path / "ck.npz")
    ps.save(path)
    before = np.asarray(ps.packed())
    cursor_before = int(ps._es.cursor)
    ps.step(5)
    ps.load(path)
    np.testing.assert_array_equal(np.asarray(ps.packed()), before)
    # recycling position must be restored: the select write window is
    # derived from the cursor alone
    assert int(ps._es.cursor) == cursor_before
    ps.step(5)  # resumes cleanly


def test_nbody_simulation_driver(tmp_path):
    cfg = NBodyConfig(n_fill=500, capacity=2048,
                      grid=GridSpec(grid_dim=8, chunk_factor=2),
                      particle_life=2.0, seed=5)
    sim = NBodySimulation(cfg)
    stats = sim.run(5)
    assert int(stats.n_alive) > 0
    assert sim.frame == 5
    path = str(tmp_path / "nb.npz")
    sim.save(path)
    sim.run(3)
    sim.load(path)
    assert sim.frame == 5
    assert "step" in sim.timers.summary()


def test_nbody_profile_frame():
    """Intra-frame phase metrics (the reference's per-iteration
    init_iframe/build_grid/calc_forces printout, particleSystem.cpp:1927):
    every stage must report, land in the timers, and not advance state."""
    cfg = NBodyConfig(n_fill=500, capacity=2048,
                      grid=GridSpec(grid_dim=8, chunk_factor=2),
                      particle_life=2.0, seed=5)
    sim = NBodySimulation(cfg, impl="blocks")
    sim.run(2)
    frame_before = sim.frame
    out = sim.profile_frame(k1=1, k2=2)
    assert set(out) == {"rng_fields", "cell_ids", "build_grid",
                        "calc_forces", "unsort", "lifecycle", "full_frame"}
    assert sim.frame == frame_before
    rep = sim.timers.report()
    assert "frame/calc_forces" in rep and "frame/build_grid" in rep
    # with an active prefix set, stages profile the production (sliced)
    # shapes — models/nbody.step runs every stage on [0, active)
    sim._active = 1024
    out = sim.profile_frame(k1=1, k2=2)
    assert set(out) == {"rng_fields", "cell_ids", "build_grid",
                        "calc_forces", "unsort", "lifecycle", "full_frame"}


def test_checkpoint_shape_mismatch(tmp_path):
    a = {"x": jnp.zeros((4,)), "y": jnp.ones((2, 2))}
    path = str(tmp_path / "c.npz")
    checkpoint.save(path, a, meta={"k": 1})
    out, meta = checkpoint.load(path, a)
    assert meta == {"k": 1}
    np.testing.assert_array_equal(np.asarray(out["y"]), np.ones((2, 2)))
    with pytest.raises(ValueError):
        checkpoint.load(path, {"x": jnp.zeros((5,)), "y": jnp.ones((2, 2))})


def test_checkpoint_config_mismatch(tmp_path):
    """Same shapes, different physics: resume must be refused (most knobs —
    dt, seed, eps2 — don't change array shapes, so shape checks alone would
    silently produce a mixed-config trajectory)."""
    import dataclasses

    cfg = NBodyConfig(n_fill=400, capacity=1024,
                      grid=GridSpec(grid_dim=8, chunk_factor=2), seed=5)
    sim = NBodySimulation(cfg)
    path = str(tmp_path / "nb.npz")
    sim.save(path)
    sim2 = NBodySimulation(dataclasses.replace(cfg, dt=0.1))
    with pytest.raises(ValueError, match="config mismatch"):
        sim2.load(path)
    sim.load(path)  # same config still loads


def test_adaptive_width_overflow_redo():
    """A frame whose occupancy overflows the adaptive list width must be
    REDONE at full width — the adaptive trajectory equals the always-exact
    full-width trajectory, and no degraded frame is recorded."""
    import jax

    from particlesystem_tpu.models import nbody

    cfg = NBodyConfig(n_fill=1500, capacity=2048,
                      grid=GridSpec(grid_dim=2, chunk_factor=2),
                      max_per_cell=256, seed=3)
    # sanity: width 64 actually truncates for this scene (not vacuous)
    state = nbody.init_fill(cfg)
    _, st = nbody.step(state, jnp.int32(0), cfg, 64, "dense")
    assert int(st.n_listed_dropped) > 0

    sim_a = NBodySimulation(cfg, adaptive_width=True, impl="dense")
    sim_a._width = 64                     # deliberately under-provisioned
    sim_b = NBodySimulation(cfg, adaptive_width=False, impl="dense")
    stats_a = sim_a.run(1)                # must redo frame 0 at full width
    stats_b = sim_b.run(1)
    assert sim_a.n_degraded_frames == 0
    assert int(stats_a.n_listed_dropped) == 0
    assert int(stats_a.n_alive) == int(stats_b.n_alive)
    for f in ("pos", "vel", "age", "alive", "tag"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sim_a.state, f)),
            np.asarray(getattr(sim_b.state, f)), err_msg=f)

    # subsequent frames at the (sufficient) adaptive width stay exact
    sim_a.run(2)
    sim_b.run(2)
    np.testing.assert_array_equal(np.asarray(sim_a.state.alive),
                                  np.asarray(sim_b.state.alive))
    np.testing.assert_allclose(np.asarray(sim_a.state.pos),
                               np.asarray(sim_b.state.pos),
                               rtol=1e-5, atol=1e-5)


def test_frame_ring_spsc():
    ring = FrameRing(frame_bytes=16 * 4, depth=2)
    a = np.arange(16, dtype=np.float32)
    assert ring.push(a)
    assert ring.push(a * 2)
    assert not ring.push(a * 3)         # full -> dropped
    assert ring.fill() == 2
    out = ring.pop((16,))
    np.testing.assert_array_equal(out, a)
    out = ring.pop((16,))
    np.testing.assert_array_equal(out, a * 2)
    assert ring.pop((16,)) is None      # empty


def test_async_readback_drops_when_consumer_behind():
    rb = AsyncReadback(frame_bytes=8 * 4, depth=1)
    for i in range(5):
        rb.publish(jnp.full((8,), float(i)))
    rb.flush()
    assert rb.published + rb.dropped == 5
    assert rb.published >= 1
    frame = rb.ring.pop((8,))
    assert frame is not None


def test_native_library_builds():
    """The C++ runtime must actually build and load in this environment."""
    assert native.has_native(), "libpsnative.so failed to build/load"
    lib = native.get_lib()
    t0 = lib.ps_now()
    assert lib.ps_now() >= t0


def test_timers():
    t = PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert "a:" in t.report()


def test_nbody_validate_against_oracle():
    cfg = NBodyConfig(n_fill=400, capacity=1024,
                      grid=GridSpec(grid_dim=8, chunk_factor=2),
                      particle_life=2.0, seed=5)
    sim = NBodySimulation(cfg)
    sim.run(2)
    report = sim.validate(frames=3)
    assert report["events_match"]
    assert report["max_position_deviation"] < 1e-2

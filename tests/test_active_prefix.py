"""Active-prefix bucketing (occupancy-adaptive frame width).

``compact_state`` + ``step(active=...)`` must reproduce the full-width
trajectory BIT-EXACTLY: compaction is a deterministic stable partition
(mirrorable by any oracle), and a prefix with spawn headroom contains
every row the frame can touch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from particlesystem_tpu import GridSpec, NBodyConfig
from particlesystem_tpu.api import NBodySimulation
from particlesystem_tpu.models import nbody
from particlesystem_tpu.utils.dispatchbug import recovering_call

CFG = NBodyConfig(n_fill=3000, capacity=8192,
                  grid=GridSpec(grid_dim=8, chunk_factor=2),
                  particle_life=2.0, spawn_budget=1024, seed=5)


# Two Pallas-bearing jit signatures in one process trip the jax-0.9
# dispatch-cache bug from the second dispatch after a signature switch
# (tools/repro_jax_dispatch_bug.py; a fused two-kernel program is WORSE —
# it fails even alone).  recovering_call absorbs the one poisoned dispatch
# per switch, so the trajectories are run sequentially, never interleaved.
step_full = jax.jit(lambda s, f: nbody.step(s, f, CFG, 0, "blocks", 0))
step_buck = jax.jit(lambda s, f: nbody.step(s, f, CFG, 0, "blocks", 4096))


def run_traj(step, st, f0, frames):
    out = []
    for f in range(f0, f0 + frames):
        st, stats = recovering_call(step, st, jnp.int32(f))
        out.append((st, stats))
    return out


def warmed(frames=4):
    st = nbody.init_fill(CFG)
    for f in range(frames):
        st, _ = recovering_call(step_full, st, jnp.int32(f))
    return st, frames


def test_compact_state_is_stable_partition():
    st, _ = warmed()
    cs = nbody.compact_state(st)
    alive = np.asarray(st.alive)
    calive = np.asarray(cs.alive)
    na = alive.sum()
    # alive rows form the prefix, in original slot order
    assert calive[:na].all() and not calive[na:].any()
    order = np.concatenate([np.flatnonzero(alive), np.flatnonzero(~alive)])
    for f in ("pos", "vel", "acc", "w", "age", "life", "parent", "tag"):
        np.testing.assert_array_equal(np.asarray(getattr(cs, f)),
                                      np.asarray(getattr(st, f))[order], f)


def test_bucketed_step_matches_full_width_exactly():
    st, f0 = warmed()
    st = nbody.compact_state(st)
    active = 4096  # > alive + spawn_budget, < capacity, multiple of 1024
    assert int(np.asarray(st.alive).sum()) + CFG.max_spawns_per_frame < active

    traj_f = run_traj(step_full, st, f0, 4)
    traj_b = run_traj(step_buck, st, f0, 4)
    for f, ((full, fs), (buck, bs)) in enumerate(zip(traj_f, traj_b)):
        assert int(bs.n_tail_alive) == 0
        for k in ("n_alive", "n_age_deaths", "n_collision_kills",
                  "n_survivals", "n_spawned"):
            assert int(getattr(fs, k)) == int(getattr(bs, k)), (f, k)
        for fld in ("pos", "vel", "acc", "w", "age", "life", "alive",
                    "parent", "tag"):
            np.testing.assert_array_equal(
                np.asarray(getattr(full, fld)),
                np.asarray(getattr(buck, fld)), f"frame {f} {fld}")


def test_frozen_prefix_platform_mode(monkeypatch):
    """On platforms where only one Pallas program shape may be
    re-dispatched (utils/dispatchbug.multi_pallas_shapes_safe() False),
    the driver freezes a prefix sized from n_fill at construction and
    never re-buckets — one step shape for the whole run, same physics."""
    import particlesystem_tpu.api as api_mod

    monkeypatch.setattr(api_mod, "multi_pallas_shapes_safe", lambda: False)
    cfg = dataclasses.replace(CFG, capacity=1 << 20)
    a = NBodySimulation(cfg, impl="blocks", active_bucketing=True)
    assert a._frozen_active and a._active != 0
    want0 = a._active
    b = NBodySimulation(cfg, impl="blocks", active_bucketing=False)
    a.run(4)
    b.run(4)
    assert a._active == want0  # never re-bucketed
    # ONE program shape dispatched for the whole run: default run() now
    # auto-batches (batch=0), so the shape is the batched loop, not the
    # per-frame step
    assert len(a._loop_jits) == 1 and not a._step_jits
    for k in ("n_alive", "n_collision_kills", "n_spawned"):
        assert int(getattr(a.last_stats, k)) == int(getattr(b.last_stats, k))
    m = np.asarray(a.state.alive)
    ra = np.concatenate([np.asarray(a.state.pos),
                         np.asarray(a.state.vel)], axis=1)[m]
    mb = np.asarray(b.state.alive)
    rb = np.concatenate([np.asarray(b.state.pos),
                         np.asarray(b.state.vel)], axis=1)[mb]
    np.testing.assert_array_equal(ra[np.lexsort(ra.T[::-1])],
                                  rb[np.lexsort(rb.T[::-1])])
    # checkpoint round-trip keeps the frozen shape (load() may compact but
    # must not change the prefix after stepping)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.npz")
        a.save(p)
        a.load(p)
        assert a._active == want0
        a.run(4)  # batch=0 auto-resolution reuses the claimed loop shape
        assert len(a._loop_jits) == 1
        # an indivisible run would need a SECOND loop shape: refused
        # loudly instead of wedging the TPU client (utils/dispatchbug.py)
        import pytest
        with pytest.raises(RuntimeError, match="one batch size"):
            a.run(2)


def test_prefix_saturation_reports_spawn_cap():
    """A saturated prefix (zero free slots inside, free room in the tail)
    must REPORT the spawns it capped (stats.n_spawn_capped) — the silent
    failure mode of the frozen-prefix platform: a growing population could
    otherwise diverge from the full-width trajectory with every guard
    still green (n_tail_alive only sees alive rows beyond the prefix)."""
    st = nbody.init_fill(CFG)
    n = st.slots
    active = 1024
    alive = np.zeros((n,), bool)
    alive[:active] = True          # prefix completely full ...
    age = np.full((n,), 0.2, np.float32)
    life = np.full((n,), 5.0, np.float32)
    age[:100] = 0.99               # ... and 100 rows explode this frame
    life[:100] = 1.0
    st = dataclasses.replace(
        st, alive=jnp.asarray(alive), age=jnp.asarray(age),
        life=jnp.asarray(life),
        parent=jnp.zeros((n,), bool))

    _, stats_pfx = nbody.step(st, jnp.int32(0), CFG, 0, "dense", active)
    _, stats_full = nbody.step(st, jnp.int32(0), CFG, 0, "dense", 0)
    # full width grants every child from the dead tail; the prefix can't
    # (a few of the 100 candidates may be collision-killed before
    # exploding, identically in both runs — compare the two runs, not 100)
    # (same-frame deaths free a few prefix slots, granting that many)
    assert int(stats_full.n_spawn_capped) == 0
    assert int(stats_pfx.n_spawned) < int(stats_full.n_spawned)
    capped = int(stats_pfx.n_spawn_capped)
    assert capped == int(stats_full.n_spawned) - int(stats_pfx.n_spawned)
    assert capped > 80
    assert int(stats_pfx.n_tail_alive) == 0  # the old guard saw nothing


def test_driver_bucketing_matches_unbucketed_run():
    cfg = dataclasses.replace(CFG, capacity=1 << 20)  # large enough that
    # _pick_active actually selects a shrunken prefix
    a = NBodySimulation(cfg, impl="blocks", active_bucketing=True)
    b = NBodySimulation(cfg, impl="blocks", active_bucketing=False)
    # 4 frames: children born after the first compaction stay under
    # kid_age, so no collision tie-break can involve a renumbered slot yet
    # and the two runs must agree bit-for-bit
    a.run(4)
    b.run(4)
    assert a._active != 0  # bucketing actually engaged
    for k in ("n_alive", "n_collision_kills", "n_spawned"):
        assert int(getattr(a.last_stats, k)) == int(getattr(b.last_stats, k))
    # trajectories identical as an alive-row multiset (compaction renumbers
    # slots, so per-slot comparison needs the permutation; multiset + the
    # exact event ledger above pin the physics)
    def rows(sim):
        m = np.asarray(sim.state.alive)
        r = np.concatenate([np.asarray(sim.state.pos),
                            np.asarray(sim.state.vel)], axis=1)[m]
        return r[np.lexsort(r.T[::-1])]
    np.testing.assert_allclose(rows(a), rows(b), rtol=0, atol=0)

"""3D brick-sharded n-body vs single-device: physics must match.

8 virtual CPU devices arranged as a (2, 2, 2) mesh over (i3, i1, i2) — the
full analog of the reference's 4x4x4 chunk ownership.  3D corner cells and
up-to-three-hop corner-crossing migration are the new machinery vs the
pencil path; the multiset comparison catches both.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particlesystem_tpu import GridSpec, NBodyConfig
from particlesystem_tpu.models import nbody
from particlesystem_tpu.parallel.nbody_brick import (BrickSpec, distribute,
                                                     make_brick_step)

CFG = NBodyConfig(
    n_fill=3000, capacity=8192,
    grid=GridSpec(grid_dim=16, cell_size=5.0, chunk_factor=4),
    particle_life=3.0,
    seed=11,
)


def alive_rows(state):
    alive = np.asarray(state.alive)
    rows = np.concatenate([
        np.asarray(state.pos), np.asarray(state.vel),
        np.asarray(state.age)[:, None], np.asarray(state.life)[:, None],
    ], axis=1)[alive]
    return rows, np.asarray(state.tag)[alive]


def make_mesh(d3, d1, d2):
    devs = np.array(jax.devices()).reshape(d3, d1, d2)
    return jax.sharding.Mesh(devs, ("x", "y", "z"))


@pytest.mark.parametrize("impl", ["dense", "blocks"])
def test_brick_matches_single_device(impl):
    """7-frame exact-identity window — sized from the MEASURED horizon
    (tools/parity_horizon.py: first tag-multiset mismatch at frame 10 for
    this seed-11 config, so 3 frames of margin; r4's window was 3).  Tags
    must match exactly, trajectories to float tolerance, with real 3D
    corner interactions and migrations occurring; the bound is float
    accumulation order only (see the module docstring)."""
    mesh = make_mesh(2, 2, 2)
    spec = BrickSpec(d3=2, d1=2, d2=2, impl=impl)

    init = nbody.init_fill(CFG)
    sharded_init, dropped = distribute(init, CFG, spec)
    assert dropped == 0

    step_fn, shard_state = make_brick_step(CFG, spec, mesh)
    ms = shard_state(sharded_init)
    ss = sharded_init  # single-device run on the same slot arrangement

    total_kills = total_spawns = 0
    for frame in range(7):
        ms, stats = step_fn(ms, jnp.int32(frame))
        uvec, fert = nbody.frame_fields(CFG, jnp.int32(frame), ss.tag)
        ss, sstats = nbody.step_fields(ss, uvec, fert, jnp.int32(frame), CFG)

        assert int(stats["halo_dropped"]) == 0
        assert int(stats["migration_dropped"]) == 0
        assert int(stats["n_age_deaths"]) == int(sstats.n_age_deaths), frame
        assert int(stats["n_collision_kills"]) == int(
            sstats.n_collision_kills), frame
        assert int(stats["n_survivals"]) == int(sstats.n_survivals), frame
        assert int(stats["n_alive"]) == int(sstats.n_alive), frame
        total_kills += int(stats["n_collision_kills"])
        total_spawns += int(stats["n_spawned"])

        a, ta = alive_rows(ms)
        b, tb = alive_rows(ss)
        assert len(np.unique(ta)) == len(ta)
        np.testing.assert_array_equal(np.sort(ta), np.sort(tb),
                                      err_msg=f"frame {frame} tag multiset")
        d = np.abs(a[np.argsort(ta)] - b[np.argsort(tb)])
        assert d.max() < 1e-3, f"frame {frame}: max diff {d.max()}"

    assert total_kills > 10
    assert total_spawns > 10


def test_brick_degenerates_to_slab():
    """d1 = d2 = 1 must behave exactly like the slab decomposition."""
    devs = np.array(jax.devices()).reshape(8, 1, 1)
    mesh = jax.sharding.Mesh(devs, ("x", "y", "z"))
    spec = BrickSpec(d3=8)

    from particlesystem_tpu.parallel.nbody_sharded import (
        SlabSpec, distribute as slab_distribute, make_sharded_step)
    slab_mesh = jax.sharding.Mesh(np.array(jax.devices()), ("x",))

    init = nbody.init_fill(CFG)
    b_init, _ = distribute(init, CFG, spec)
    s_init, _ = slab_distribute(init, CFG, SlabSpec(n_devices=8))
    np.testing.assert_array_equal(np.asarray(b_init.tag),
                                  np.asarray(s_init.tag))

    b_step, b_shard = make_brick_step(CFG, spec, mesh)
    s_step, s_shard = make_sharded_step(CFG, SlabSpec(n_devices=8), slab_mesh)
    mb, msl = b_shard(b_init), s_shard(s_init)
    for frame in range(3):
        mb, _ = b_step(mb, jnp.int32(frame))
        msl, _ = s_step(msl, jnp.int32(frame))
        a, ta = alive_rows(mb)
        bb, tb = alive_rows(msl)
        np.testing.assert_array_equal(np.sort(ta), np.sort(tb))


def test_brick_long_horizon_invariants():
    """24-frame conservation check on the (2,2,2) mesh: no buffer drops,
    alive count evolves exactly by the event ledger, positions stay in the
    box, and the brick ownership invariant holds every frame."""
    mesh = make_mesh(2, 2, 2)
    spec = BrickSpec(d3=2, d1=2, d2=2)
    step_fn, shard_state = make_brick_step(CFG, spec, mesh)
    init, _ = distribute(nbody.init_fill(CFG), CFG, spec)
    ms = shard_state(init)

    gd = CFG.grid.grid_dim
    p3 = p1 = p2 = gd // 2
    c_local = CFG.slots // 8
    half_extent = CFG.grid.half_extent
    alive_prev = int(np.asarray(init.alive).sum())
    migrated = False

    before = np.asarray(init.alive).reshape(8, c_local).sum(axis=1)
    for frame in range(24):
        ms, stats = step_fn(ms, jnp.int32(frame))
        assert int(stats["halo_dropped"]) == 0, frame
        assert int(stats["migration_dropped"]) == 0, frame
        assert int(stats["n_listed_dropped"]) == 0, frame
        expected = (alive_prev - int(stats["n_age_deaths"])
                    - int(stats["n_collision_kills"])
                    - int(stats["n_overflow_kills"])
                    + int(stats["n_spawned"]))
        assert int(stats["n_alive"]) == expected, frame
        alive_prev = int(stats["n_alive"])
        assert int(stats["halo_used_max"]) <= spec.derive(CFG).halo_capacity

        alive = np.asarray(ms.alive)
        pos = np.asarray(ms.pos)
        assert np.all(np.abs(pos[alive]) <= half_extent + 1e-4), frame

        # ownership invariant: every alive local particle is in its brick
        cs = CFG.grid.cell_size
        half = gd // 2
        i1 = np.floor(-pos[:, 1] / cs).astype(np.int64) + half
        i2 = np.floor(pos[:, 0] / cs).astype(np.int64) + half
        i3 = np.floor(-pos[:, 2] / cs).astype(np.int64) + half
        dev_of_slot = np.arange(CFG.slots) // c_local
        a_own = dev_of_slot // 4
        b_own = (dev_of_slot // 2) % 2
        c_own = dev_of_slot % 2
        ok = ((i3 // p3 == a_own) & (i1 // p1 == b_own)
              & (i2 // p2 == c_own))
        assert np.all(ok[alive]), frame

        after = np.asarray(ms.alive).reshape(8, c_local).sum(axis=1)
        if not np.array_equal(before, after):
            migrated = True
    assert alive_prev > 0
    assert migrated  # cross-brick migration actually exercised

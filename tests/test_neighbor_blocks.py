"""Cluster-pair Pallas kernel vs the dense cell-pair pass.

Flags (kill/touch/overflow) must match EXACTLY; accelerations to float
tolerance.  The small-kernel configuration (B=32, CH=128) forces
multi-chunk ranges and blocks that cross i1-row and i3-plane boundaries —
the regression for the range-construction bug where coordinate-window
fallbacks exploded past the chunk budget and silently dropped
interactions for box-edge particles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import particlesystem_tpu.ops.neighbor_blocks as nbk
from particlesystem_tpu import GridSpec, NBodyConfig
from particlesystem_tpu.models import nbody
from particlesystem_tpu.ops.grid import build_bins, coords_to_cell, wrap_positions
from particlesystem_tpu.ops.neighbor import neighbor_pass

CONFIGS = {
    "dense-g4": NBodyConfig(n_fill=1500, capacity=2048,
                            grid=GridSpec(grid_dim=4, chunk_factor=2),
                            max_per_cell=48, seed=3),
    "sparse-g16": NBodyConfig(n_fill=800, capacity=1024,
                              grid=GridSpec(grid_dim=16),
                              particle_life=2.0, seed=7),
    "mid-g8": NBodyConfig(n_fill=6000, capacity=8192,
                          grid=GridSpec(grid_dim=8, chunk_factor=2),
                          seed=13),
}


def compare(cfg, frames=2, tol=1e-5, **kernel_kw):
    state = nbody.init_fill(cfg)
    for f in range(frames):
        state, _ = nbody.step(state, jnp.int32(f), cfg)
    pos_w, coords = wrap_positions(state.pos, cfg.grid)
    cell = coords_to_cell(coords, cfg.grid)
    bins = build_bins(cell, state.alive, cfg.grid.num_cells,
                      cfg.cell_capacity)
    ids = jnp.arange(state.slots, dtype=jnp.int32)
    g = cfg.grid.grid_dim
    acc_d, kill_d, touch_d = neighbor_pass(
        state.pos, state.age, state.w, ids, bins.cell_list, (g, g, g), cfg,
        batch_cells=64)
    acc_b, kill_b, touch_b, ovf, _, _, dropped = nbk.neighbor_pass_blocks(
        state.pos, state.age, state.w, cell, state.alive, cfg, **kernel_kw)

    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(ovf), np.asarray(bins.overflow))
    np.testing.assert_array_equal(np.asarray(kill_b), np.asarray(kill_d))
    np.testing.assert_array_equal(np.asarray(touch_b), np.asarray(touch_d))
    scale = max(1.0, float(np.abs(np.asarray(acc_d)).max()))
    err = np.abs(np.asarray(acc_b) - np.asarray(acc_d)).max() / scale
    assert err < tol, err


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_blocks_matches_dense(name):
    compare(CONFIGS[name])


def test_blocks_acc_wide_matches_dense():
    """Wide-accumulator variant (per-block deferred reductions): exact
    flags, float-tolerance accelerations — the cross-chunk reassociation
    must stay within the oracle tolerance."""
    compare(CONFIGS["mid-g8"], acc_wide=True)


def test_blocks_subtile_matches_dense():
    """Column-subtile variant (ts): per-chunk loop over ceil(hi/ts)
    lane-dim subtiles instead of one full-CH tile.  Must be exact vs the
    full-tile path — the [hi, CH) tail it skips contributes only masked
    lanes.  ts=128 forces several subtiles per chunk at the default CH."""
    compare(CONFIGS["mid-g8"], ts=128)
    # acc_mxu trades ~2e-5 relative accumulation error for speed (NOTES.md)
    compare(CONFIGS["mid-g8"], ts=128, acc_mxu=True, tol=5e-4)


def test_blocks_multichunk_plane_crossings(monkeypatch):
    """Small kernel tiles force multi-chunk ranges and row/plane-crossing
    blocks at modest particle counts (the box-edge regression)."""
    monkeypatch.setattr(nbk, "B", 32)
    monkeypatch.setattr(nbk, "CH", 128)
    cfg = NBodyConfig(n_fill=20_000, capacity=32768,
                      grid=GridSpec(grid_dim=16), seed=3)
    compare(cfg, frames=1)


def test_chunk_budget_overflow_is_reported():
    """A deliberately tiny chunk budget must produce a NONZERO drop count
    (the red path: truncated forces are reported, never silent), and the
    stat must reach NBodyStats.n_listed_dropped through step_fields."""
    cfg = CONFIGS["mid-g8"]
    state = nbody.init_fill(cfg)
    pos_w, coords = wrap_positions(state.pos, cfg.grid)
    cell = coords_to_cell(coords, cfg.grid)
    *_, dropped = nbk.neighbor_pass_blocks(
        state.pos, state.age, state.w, cell, state.alive, cfg, c_max=2)
    assert int(dropped) > 0

    # end-to-end: squeeze the module default and check the frame stat
    # (eager step_fields — a jit could replay a trace with the real C_MAX)
    import unittest.mock as mock
    uvec, fert = nbody.frame_fields(cfg, jnp.int32(0), state.tag)
    with mock.patch.object(nbk, "C_MAX", 2):
        _, stats = nbody.step_fields(state, uvec, fert, jnp.int32(0), cfg,
                                     0, "blocks")
    assert int(stats.n_listed_dropped) > 0


def test_out_of_band_coords_unique_past_wrap():
    """Out-of-band (kid/dead/overflow) stencil coordinates must be UNIQUE
    across rows: band values are even-spaced and the bases are even, so any
    coordinate-triple collision gives cd2 = 0 <= 3.5 and injects a garbage
    pair (a live kid row paired with a far-away kid/overflow row's REAL
    position).  A single shared 2^19 row modulus collides at pair distance
    2^19 — reachable at the 10M/32^3 config where a block's stencil spans a
    whole cell plane (~400-800k rows); the per-axis coprime moduli make the
    effective wrap 2^19*(2^19-1).  This builds > 2^19 rows and checks the
    invariant directly on the prepared snapshot."""
    b = 512
    n = (1 << 19) + 4 * b                      # past the single-modulus wrap
    cfg = NBodyConfig(n_fill=16, capacity=n // 2, x_factor=2.0,
                      grid=GridSpec(grid_dim=4, chunk_factor=2), seed=0)
    pos = jnp.zeros((n, 3), jnp.float32)       # all in one cell
    age = jnp.zeros((n,), jnp.float32)         # all kids (< kid_age)
    w = jnp.full((n,), 60.0, jnp.float32)
    cell = jnp.zeros((n,), jnp.int32)
    alive = (jnp.arange(n) % 2 == 0)           # half kid band, half dead band
    snap, *_ = nbk.prepare(pos, age, w, cell, alive, cfg, b=b)
    coords = np.asarray(snap[4:7, :n])         # (3, N) — all out-of-band
    assert coords.max() < 0                    # nothing got in-band coords
    triples = coords.T.copy().view([("a", "f4"), ("b", "f4"), ("c", "f4")])
    assert len(np.unique(triples)) == n
    cfg = CONFIGS["dense-g4"]
    sa = sb = nbody.init_fill(cfg)
    for f in range(6):
        sa, sta = nbody.step(sa, jnp.int32(f), cfg, 0, "dense")
        sb, stb = nbody.step(sb, jnp.int32(f), cfg, 0, "blocks")
        assert int(sta.n_alive) == int(stb.n_alive), f
        assert int(sta.n_collision_kills) == int(stb.n_collision_kills), f
        assert int(sta.n_spawned) == int(stb.n_spawned), f
        np.testing.assert_array_equal(np.asarray(sa.alive),
                                      np.asarray(sb.alive), f)
        np.testing.assert_allclose(np.asarray(sa.pos), np.asarray(sb.pos),
                                   rtol=1e-4, atol=1e-4)

"""The reference particle simulation, TPU-native.

One pure jitted step reproduces the semantics of the reference's per-frame
pipeline (``/root/reference/source/code/src/particleSystem.cpp``):

    INIT_IFRAME (:1574)  -> implicit: bins are rebuilt functionally
    BUILD_GRID  (:1468)  -> sort-based binning + cell-overflow kill
    CALC_FORCES (:1120)  -> age death, pairwise collision kill/survive,
                            softened gravity over the 27-cell stencil,
                            clamped Euler integration, torus wrap, aging,
                            explosion reproduction
    seg_fault migration (:1336-1374) -> not needed: flat slot space

Semantic redesigns (deterministic, order-independent — the reference's GPU
path depends on warp-lock timing and its host RNG is nondeterministic):

* Collision resolution (``bodyBodyCollision``, ``app_common.cu:269-301``)
  becomes a reduction: a particle is KILLED if any colliding neighbor has a
  larger slot id, SURVIVES (age/velocity reset) if it collides only with
  smaller ids.  This is exactly the fixed point of the reference's scan
  (flag 2 dominates and breaks the loop), now order-free.
* Free-slot allocation: ascending dead slots meet ascending requests
  (``ops/compact.py``) instead of per-segment FIFO queues; like the
  reference, ids freed this frame are immediately reusable and spawn
  requests beyond capacity are dropped.
* Neighbor reads use the previous frame's state (the ``T_DATA_TYPE``
  snapshot, ``common.h:122-132``) — automatic here because the step is pure.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.config import NBodyConfig
from ..core.state import ParticleState, zero_state
from ..ops import compact
from ..ops.grid import (build_bins, cell_coords, chunk_occupancy,
                        coords_to_cell, stencil_cells, wrap_positions)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NBodyStats:
    """Per-frame statistics; all stay on device (the reference syncs
    ``gridmax`` back to the host every frame, ``particleSystem.cpp:1900``)."""

    n_alive: jax.Array
    n_age_deaths: jax.Array
    n_collision_kills: jax.Array
    n_overflow_kills: jax.Array
    n_survivals: jax.Array
    n_spawned: jax.Array
    max_cell_occupancy: jax.Array
    max_chunk_occupancy: jax.Array


def init_fill(cfg: NBodyConfig, n: int | None = None) -> ParticleState:
    """Uniform initial fill — FILL_PARTICLES
    (``particleSystem.cpp:962-1048``): each coordinate is ``sign * r * range``
    with ``r ~ U[0,1)`` and a fair sign; age uniform adult, fertility age
    uniform.  Slots 0..n-1 are used in draw order (the reference scatters ids
    across segment queues; slot numbering is an implementation detail)."""
    n = cfg.n_fill if n is None else n
    if n > cfg.slots:
        raise ValueError(f"n_fill={n} exceeds capacity {cfg.slots}")
    key = rng.frame_key(cfg.seed, jnp.int32(0), rng.FILL)
    kr, ks, ka, kf = jax.random.split(key, 4)
    rrange = cfg.grid.half_extent
    r = jax.random.uniform(kr, (n, 3), jnp.float32)
    sign = jnp.where(jax.random.uniform(ks, (n, 3)) >= 0.5, 1.0, -1.0)
    pos = (sign * r * rrange).astype(jnp.float32)
    age = rng.uniform(ka, (n,), cfg.min_adult_age, cfg.max_adult_age)
    fert = rng.uniform(kf, (n,), cfg.min_fertility_age, cfg.max_fertility_age)

    s = zero_state(cfg.slots)
    pad = cfg.slots - n
    padf = lambda a, k: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a
    return ParticleState(
        pos=padf(pos, 3), vel=s.vel, acc=s.acc,
        w=padf(jnp.full((n,), cfg.weight, jnp.float32), 1),
        age=padf(age, 1), life=padf(fert, 1),
        alive=padf(jnp.ones((n,), jnp.bool_), 1), parent=s.parent,
    )


def _neighbor_pass(state: ParticleState, cell_list: jax.Array,
                   cfg: NBodyConfig, batch_cells: int = 64):
    """Collision flags + gravity over the 27-cell stencil.

    Cell-centric: each cell's <=K residents interact with each neighbor
    cell's <=K residents as dense (K, K) tiles — the TPU-friendly replacement
    for the reference's per-particle neighbor lists (``fill_particles``,
    ``app.cu:442-452``, up to 27*514 gathered ids per particle).

    Returns per-slot (acc(N,3), kill(N,), touch(N,)) where
    * ``kill``  — exists colliding neighbor with larger slot id
    * ``touch`` — exists colliding neighbor
    Both are False and acc == 0 for slots not present in ``cell_list``.
    """
    grid = cfg.grid
    num_cells = grid.num_cells
    k = cell_list.shape[1]
    pos0, age0, w0 = state.pos, state.age, state.w
    kid = jnp.float32(cfg.kid_age)
    life = jnp.float32(cfg.particle_life)
    r2 = jnp.float32(cfg.collision_radius) ** 2
    eps2 = jnp.float32(cfg.eps2)

    def one_cell(c):
        me = cell_list[c]                       # (K,)
        me_valid = me >= 0
        mi = jnp.maximum(me, 0)
        mpos, mage = pos0[mi], age0[mi]
        madult = mage >= kid
        myoung = mage <= life

        g = grid.grid_dim
        i3 = c // (g * g)
        rem = c % (g * g)
        coords = jnp.stack([rem // g, rem % g, i3])
        ncells, nvalid = stencil_cells(coords, grid)

        acc = jnp.zeros((k, 3), jnp.float32)
        kill = jnp.zeros((k,), jnp.bool_)
        touch = jnp.zeros((k,), jnp.bool_)
        for j in range(27):
            nb = jnp.where(nvalid[j], cell_list[ncells[j]], -1)  # (K,)
            nb_ok = nb >= 0
            ni = jnp.maximum(nb, 0)
            npos, nage, nw = pos0[ni], age0[ni], w0[ni]

            diff = npos[None, :, :] - mpos[:, None, :]           # (K, K, 3)
            d2 = jnp.sum(diff * diff, axis=-1)                   # (K, K)
            pair = me_valid[:, None] & nb_ok[None, :] & (nb[None, :] != me[:, None])
            adult = madult[:, None] & (nage >= kid)[None, :]

            collide = (pair & adult & (d2 <= r2)
                       & myoung[:, None] & (nage <= life)[None, :])
            kill |= jnp.any(collide & (nb[None, :] > me[:, None]), axis=1)
            touch |= jnp.any(collide, axis=1)

            # bodyBodyInteraction (app_common.cu:236-267):
            # a += m_j * r_ij / (|r|^2 + EPS2)^(3/2), adults only
            dd = d2 + eps2
            s = jnp.where(pair & adult, nw[None, :] / jnp.sqrt(dd * dd * dd), 0.0)
            acc += jnp.sum(diff * s[:, :, None], axis=1)
        return me, acc, kill, touch

    cells = jnp.arange(num_cells, dtype=jnp.int32)
    me_b, acc_b, kill_b, touch_b = jax.lax.map(
        one_cell, cells, batch_size=min(batch_cells, num_cells))

    n = state.slots
    me_f = me_b.reshape(-1)
    tgt = jnp.where(me_f >= 0, me_f, n)
    acc = jnp.zeros((n, 3), jnp.float32).at[tgt].set(
        acc_b.reshape(-1, 3), mode="drop")
    kill = jnp.zeros((n,), jnp.bool_).at[tgt].set(
        kill_b.reshape(-1), mode="drop")
    touch = jnp.zeros((n,), jnp.bool_).at[tgt].set(
        touch_b.reshape(-1), mode="drop")
    return acc, kill, touch


def step_fields(state: ParticleState, uvec: jax.Array, fert: jax.Array,
                cfg: NBodyConfig) -> Tuple[ParticleState, NBodyStats]:
    """Deterministic step given per-frame random fields:

    * ``uvec`` (N,3) — explosion unit velocity per would-be parent slot
    * ``fert`` (N,)  — child fertility-age draw per parent slot

    Mirrored by ``cpu_ref/oracle_nbody.py``; keep in lockstep.
    """
    grid = cfg.grid
    dt = jnp.float32(cfg.dt)
    n = state.slots

    # --- BUILD_GRID: bin, snapshot, overflow kill ------------------------
    pos_w, coords = wrap_positions(state.pos, grid)  # stored pos is wrapped; no-op shift
    cell = coords_to_cell(coords, grid)
    bins = build_bins(cell, state.alive, grid.num_cells, cfg.cell_capacity)
    alive1 = state.alive & ~bins.overflow

    # --- CALC_FORCES: neighbor pass on the pre-step snapshot -------------
    acc, kill, touch = _neighbor_pass(state, bins.cell_list, cfg)

    age0 = state.age
    die_age = alive1 & (age0 > cfg.particle_life)
    die_coll = alive1 & ~die_age & kill
    dead_now = die_age | die_coll | bins.overflow
    survive = alive1 & ~die_age & ~die_coll & touch
    normal = alive1 & ~die_age & ~die_coll & ~survive

    # --- integrate (clamped Euler + torus wrap, particleSystem.cpp:1267-1302)
    dx = state.vel * dt + 0.5 * acc * dt * dt
    dx = jnp.clip(dx, -cfg.max_dx, cfg.max_dx)
    newpos, _ = wrap_positions(state.pos + dx, grid)
    v1 = jnp.clip(state.vel + acc * dt, -cfg.max_v, cfg.max_v)
    age1 = age0 + dt

    nm = normal[:, None]
    dm = dead_now[:, None]
    sm = survive[:, None]
    pos = jnp.where(nm, newpos, jnp.where(dm, 0.0, pos_w))
    vel = jnp.where(nm, v1, jnp.where(dm | sm, 0.0, state.vel))
    accf = jnp.where(nm, acc, 0.0)
    age = jnp.where(normal, age1, jnp.where(dead_now | survive, 0.0, age0))
    w = jnp.where(dead_now, 0.0, state.w)
    lifef = jnp.where(dead_now, 0.0, state.life)
    parent = jnp.where(dead_now | survive, False, state.parent)
    alive2 = alive1 & ~dead_now

    # --- explosion reproduction (particleSystem.cpp:1307-1333) -----------
    explode = normal & (age1 >= state.life) & ~state.parent
    parent = jnp.where(explode, True, parent)
    evel = uvec * jnp.float32(cfg.explosion_speed)
    vel = jnp.where(explode[:, None], evel, vel)

    target, ok = compact.allocate(alive2, explode)
    tgt = jnp.where(ok, target, n)
    pos = pos.at[tgt].set(pos, mode="drop")          # child at parent's new pos
    vel = vel.at[tgt].set(-evel, mode="drop")
    accf = accf.at[tgt].set(0.0, mode="drop")
    age = age.at[tgt].set(0.0, mode="drop")
    lifef = lifef.at[tgt].set(fert, mode="drop")
    w = w.at[tgt].set(cfg.weight, mode="drop")
    parent = parent.at[tgt].set(False, mode="drop")
    alive_out = alive2.at[tgt].set(True, mode="drop")

    out = ParticleState(pos=pos, vel=vel, acc=accf, w=w, age=age,
                        life=lifef, alive=alive_out, parent=parent)
    stats = NBodyStats(
        n_alive=jnp.sum(alive_out.astype(jnp.int32)),
        n_age_deaths=jnp.sum(die_age.astype(jnp.int32)),
        n_collision_kills=jnp.sum(die_coll.astype(jnp.int32)),
        n_overflow_kills=jnp.sum(bins.overflow.astype(jnp.int32)),
        n_survivals=jnp.sum(survive.astype(jnp.int32)),
        n_spawned=jnp.sum(ok.astype(jnp.int32)),
        max_cell_occupancy=bins.max_cell_occupancy,
        max_chunk_occupancy=jnp.max(chunk_occupancy(bins.cell_of, alive1, grid)),
    )
    return out, stats


def frame_fields(cfg: NBodyConfig, frame: jax.Array, n: int):
    uvec = rng.random_unit_vectors(rng.frame_key(cfg.seed, frame, rng.UVEC), n)
    fert = rng.uniform(rng.frame_key(cfg.seed, frame, rng.FERT), (n,),
                       cfg.min_fertility_age, cfg.max_fertility_age)
    return uvec, fert


@partial(jax.jit, static_argnums=2)
def step(state: ParticleState, frame: jax.Array, cfg: NBodyConfig):
    """Full frame: per-frame random fields + physics."""
    uvec, fert = frame_fields(cfg, frame, state.slots)
    return step_fields(state, uvec, fert, cfg)

"""Cell-centric 27-stencil neighbor interactions (collision + gravity).

Generalization of the n-body neighbor pass shared by the single-chip model
(``models/nbody.py``) and the multi-chip slab decomposition
(``parallel/nbody_sharded.py``):

* the grid may be non-cubic — ``dims = (d1, d2, d3)`` with cell id
  ``i3*(d1*d2) + i1*d2 + i2`` — so a device can run it over its local slab
  extended by one halo plane on each side;
* rows are identified by explicit ``ids`` (global particle ids), not slot
  positions, so collision ordering (``bodyBodyCollision``,
  ``/root/reference/source/code/inc/app_common.cu:269-301``: larger id
  survives) is consistent across device boundaries.

Physics per pair (reference semantics):

* gravity ``a_i += w_j * r_ij / (|r|^2 + EPS2)^(3/2)`` for adult pairs
  (``bodyBodyInteraction``, ``app_common.cu:236-267``);
* collide when ``|r| <= COLLISION_RADIUS``, both adult, both within life;
  KILL i if some colliding j has a larger *order key*, else SURVIVE i.

The order key is :func:`collision_okey` of the persistent particle tag —
NOT the slot id.  The reference's rule is "larger id survives"
(``app_common.cu:293-298``); any total order satisfies it, and keying on
tags picks the one that is identical on 1 and N devices (slot ids are
re-assigned when a particle migrates or a child lands in a per-device free
slot, which would flip tie-breaks between device counts).  ``ids`` remain
the pair SELF-EXCLUSION identity: they must be unique across all rows a
pass sees (tags are hash-derived for children and can collide; a tag
collision merely makes the two order-equal — neither kills the other —
which every implementation resolves identically).

The stencil does NOT wrap at the global box boundary even though positions
torus-wrap — the reference's ``fill_cells`` distance filter clips instead
(``app.cu:352-409``); callers encode that by handing in clipped ``dims``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.config import NBodyConfig

_IMIN = jnp.iinfo(jnp.int32).min


def collision_okey(tags: jax.Array) -> jax.Array:
    """Placement-independent collision-order key (int32) from persistent
    uint32 tags: the raw int32 bitcast, clamped one above INT32_MIN so the
    kernels' no-collision sentinel stays strictly below every real key.
    The clamp maps the single tag value 0x80000000 onto INT32_MIN+1 — two
    particles whose keys coincide (that clamp, or a child-tag hash
    collision) are order-EQUAL: neither kills the other, identically in
    every implementation.  Mirrored by ``cpu_ref.oracle_nbody.okey_np``."""
    t = jax.lax.bitcast_convert_type(tags.astype(jnp.uint32), jnp.int32)
    return jnp.maximum(t, _IMIN + 1)


def neighbor_pass(pos0: jax.Array, age0: jax.Array, w0: jax.Array,
                  ids: jax.Array, cell_list: jax.Array,
                  dims: Tuple[int, int, int], cfg: NBodyConfig,
                  batch_cells: int = 64, okeys: jax.Array = None):
    """Returns per-row (acc (R,3), kill (R,), touch (R,)) where R = number of
    snapshot rows.  Rows absent from ``cell_list`` get zeros/False.
    ``okeys`` (int32, from :func:`collision_okey`) decides kill/survive
    ordering; defaults to ``ids`` (legacy slot order) for perf probes.
    """
    if okeys is None:
        okeys = ids.astype(jnp.int32)
    d1, d2, d3 = dims
    num_cells = d1 * d2 * d3
    assert cell_list.shape[0] == num_cells, (cell_list.shape, dims)
    k = cell_list.shape[1]
    kid = jnp.float32(cfg.kid_age)
    life = jnp.float32(cfg.particle_life)
    r2 = jnp.float32(cfg.collision_radius) ** 2
    eps2 = jnp.float32(cfg.eps2)

    def one_cell(c):
        me = cell_list[c]                       # (K,)
        me_valid = me >= 0
        mi = jnp.maximum(me, 0)
        mpos, mage, mids = pos0[mi], age0[mi], ids[mi]
        mkeys = okeys[mi]
        madult = mage >= kid
        myoung = mage <= life

        i3 = c // (d1 * d2)
        rem = c % (d1 * d2)
        c1, c2 = rem // d2, rem % d2

        acc = jnp.zeros((k, 3), jnp.float32)
        kill = jnp.zeros((k,), jnp.bool_)
        touch = jnp.zeros((k,), jnp.bool_)
        for o3 in (-1, 0, 1):
            for o1 in (-1, 0, 1):
                for o2 in (-1, 0, 1):
                    a1, a2, a3 = c1 + o1, c2 + o2, i3 + o3
                    ok = ((a1 >= 0) & (a1 < d1) & (a2 >= 0) & (a2 < d2)
                          & (a3 >= 0) & (a3 < d3))
                    nc = jnp.clip(a3 * d1 * d2 + a1 * d2 + a2, 0,
                                  num_cells - 1)
                    nb = jnp.where(ok, cell_list[nc], -1)  # (K,)
                    nb_ok = nb >= 0
                    ni = jnp.maximum(nb, 0)
                    npos, nage, nw, nids = pos0[ni], age0[ni], w0[ni], ids[ni]
                    nkeys = okeys[ni]

                    diff = npos[None, :, :] - mpos[:, None, :]   # (K, K, 3)
                    dsq = jnp.sum(diff * diff, axis=-1)          # (K, K)
                    pair = (me_valid[:, None] & nb_ok[None, :]
                            & (nids[None, :] != mids[:, None]))
                    adult = madult[:, None] & (nage >= kid)[None, :]

                    collide = (pair & adult & (dsq <= r2)
                               & myoung[:, None] & (nage <= life)[None, :])
                    kill |= jnp.any(
                        collide & (nkeys[None, :] > mkeys[:, None]), axis=1)
                    touch |= jnp.any(collide, axis=1)

                    dd = dsq + eps2
                    s = jnp.where(pair & adult,
                                  nw[None, :] / jnp.sqrt(dd * dd * dd), 0.0)
                    acc += jnp.sum(diff * s[:, :, None], axis=1)
        return me, acc, kill, touch

    cells = jnp.arange(num_cells, dtype=jnp.int32)
    me_b, acc_b, kill_b, touch_b = jax.lax.map(
        one_cell, cells, batch_size=min(batch_cells, num_cells))

    rows = pos0.shape[0]
    me_f = me_b.reshape(-1)
    tgt = jnp.where(me_f >= 0, me_f, rows)
    acc = jnp.zeros((rows, 3), jnp.float32).at[tgt].set(
        acc_b.reshape(-1, 3), mode="drop")
    kill = jnp.zeros((rows,), jnp.bool_).at[tgt].set(
        kill_b.reshape(-1), mode="drop")
    touch = jnp.zeros((rows,), jnp.bool_).at[tgt].set(
        touch_b.reshape(-1), mode="drop")
    return acc, kill, touch

"""Fused Pallas step kernel over HBM-resident packed particle state.

The north-star hot path (BASELINE.md): force accumulation (gravity/wind/
drag), semi-implicit Euler integration, plane/sphere collision response and
aging — one kernel, one read + one write of the ``(8, N)`` packed SoA
(rows x,y,z,vx,vy,vz,age,life; 64 B/particle/step), HBM-bandwidth-bound.

This replaces the reference's CALC_FORCES CUDA kernel
(``/root/reference/source/code/src/particleSystemCUDA.cu:152-423``) for
emitter scenes: one grid step = one (8, BLOCK) tile, mapped straight onto
8x128 VPU registers; scene constants (dt, force stack, colliders) are folded
into the kernel at trace time from the frozen config.

Free-slot recycling is split out (``refresh_free_list``/``spawn_packed``):
a cumsum-compaction pass extracts dead-slot indices into a small free list
that per-frame spawns consume through a cursor.  Refreshing every frame
reproduces the exact per-frame allocation semantics of
``models/emitter.step_core``; refreshing every K frames amortizes the O(N)
compaction for the 10M-particle benchmark (recycling latency <= K frames,
still deterministic and capacity-bounded).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import EmitterSceneConfig

BLOCK = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _step_kernel(cfg: EmitterSceneConfig, in_ref, out_ref):
    s = in_ref[:]
    px, py, pz = s[0:1], s[1:2], s[2:3]
    vx, vy, vz = s[3:4], s[4:5], s[5:6]
    age, life = s[6:7], s[7:8]
    dt = jnp.float32(cfg.dt)

    alive = (age <= life) & (life > 0)

    gx, gy, gz = (jnp.float32(g) for g in cfg.gravity)
    if cfg.drag:
        k = jnp.float32(cfg.drag)
        wx, wy, wz = (jnp.float32(w) for w in cfg.wind)
        ax = gx + (wx - vx) * k
        ay = gy + (wy - vy) * k
        az = gz + (wz - vz) * k
    else:
        ax, ay, az = gx, gy, gz

    vx1, vy1, vz1 = vx + ax * dt, vy + ay * dt, vz + az * dt
    px1, py1, pz1 = px + vx1 * dt, py + vy1 * dt, pz + vz1 * dt

    for plane in cfg.planes:
        import numpy as np
        n = np.asarray(plane.normal, np.float32)
        n = n / np.linalg.norm(n)
        nx, ny, nz = (jnp.float32(v) for v in n)
        p0x, p0y, p0z = (jnp.float32(v) for v in plane.point)
        d = (px1 - p0x) * nx + (py1 - p0y) * ny + (pz1 - p0z) * nz
        contact = d < 0
        px1 = jnp.where(contact, px1 - nx * d, px1)
        py1 = jnp.where(contact, py1 - ny * d, py1)
        pz1 = jnp.where(contact, pz1 - nz * d, pz1)
        vn = vx1 * nx + vy1 * ny + vz1 * nz
        inbound = contact & (vn < 0)
        e = jnp.float32(plane.restitution)
        mu1 = jnp.float32(1.0 - plane.friction)
        vx1 = jnp.where(inbound, (vx1 - nx * vn) * mu1 - nx * vn * e, vx1)
        vy1 = jnp.where(inbound, (vy1 - ny * vn) * mu1 - ny * vn * e, vy1)
        vz1 = jnp.where(inbound, (vz1 - nz * vn) * mu1 - nz * vn * e, vz1)

    for sp in cfg.spheres:
        cx, cy, cz = (jnp.float32(v) for v in sp.center)
        dx, dy, dz = px1 - cx, py1 - cy, pz1 - cz
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        safe = jnp.maximum(dist, jnp.float32(1e-20))
        nx, ny, nz = dx / safe, dy / safe, dz / safe
        depth = jnp.float32(sp.radius) - dist
        contact = depth > 0
        px1 = jnp.where(contact, px1 + nx * depth, px1)
        py1 = jnp.where(contact, py1 + ny * depth, py1)
        pz1 = jnp.where(contact, pz1 + nz * depth, pz1)
        vn = vx1 * nx + vy1 * ny + vz1 * nz
        inbound = contact & (vn < 0)
        e = jnp.float32(sp.restitution)
        mu1 = jnp.float32(1.0 - sp.friction)
        vx1 = jnp.where(inbound, (vx1 - nx * vn) * mu1 - nx * vn * e, vx1)
        vy1 = jnp.where(inbound, (vy1 - ny * vn) * mu1 - ny * vn * e, vy1)
        vz1 = jnp.where(inbound, (vz1 - nz * vn) * mu1 - nz * vn * e, vz1)

    age1 = age + dt

    out = jnp.concatenate([
        jnp.where(alive, px1, px), jnp.where(alive, py1, py),
        jnp.where(alive, pz1, pz), jnp.where(alive, vx1, vx),
        jnp.where(alive, vy1, vy), jnp.where(alive, vz1, vz),
        jnp.where(alive, age1, age), life,
    ], axis=0)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
def fused_step(packed: jax.Array, cfg: EmitterSceneConfig) -> jax.Array:
    """One physics frame over packed (8, N) state.  Donates its input."""
    n = packed.shape[1]
    assert n % BLOCK == 0, f"slot count {n} not a multiple of {BLOCK}"
    grid = (n // BLOCK,)
    spec = pl.BlockSpec((8, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_step_kernel, cfg),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=40 * n, bytes_accessed=2 * 8 * n * 4, transcendentals=0),
    )(packed)


def dead_mask(packed: jax.Array) -> jax.Array:
    age, life = packed[6], packed[7]
    return (age > life) | (life <= 0)


def refresh_free_list(packed: jax.Array, list_size: int
                      ) -> Tuple[jax.Array, jax.Array]:
    """Extract up to ``list_size`` dead-slot indices, ascending.

    One cumsum + one bounded scatter — the TPU replacement for the
    reference's QUEUE_FILL / q_insert bookkeeping
    (``particleSystem.cpp:755-871``, ``app_common.cu:305-429``).
    Returns (free_list (L,) int32 padded with N, n_free).
    """
    n = packed.shape[1]
    dead = dead_mask(packed)
    rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    tgt = jnp.where(dead & (rank < list_size), rank, list_size)
    fl = jnp.full((list_size,), n, jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    n_free = jnp.minimum(jnp.sum(dead.astype(jnp.int32)), list_size)
    return fl, n_free


def spawn_packed(packed: jax.Array, spawn_rows: jax.Array, valid: jax.Array,
                 free_list: jax.Array, cursor: jax.Array, n_free: jax.Array):
    """Scatter spawn rows (8, S) into free slots consumed through ``cursor``.

    O(S) work — no O(N) traffic.  Requests beyond the remaining free budget
    are dropped (reference queue-underflow semantics).
    """
    n = packed.shape[1]
    lsize = free_list.shape[0]
    req_rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    ok = valid & (cursor + req_rank < n_free)
    tgt = free_list[jnp.clip(cursor + req_rank, 0, lsize - 1)]
    tgt = jnp.where(ok, tgt, n)
    packed = packed.at[:, tgt].set(spawn_rows, mode="drop",
                                   unique_indices=True)
    return packed, cursor + jnp.sum(ok.astype(jnp.int32))


def ring_spawn(packed: jax.Array, spawn_rows: jax.Array, valid: jax.Array,
               cursor: jax.Array, n_real: int):
    """Ring-buffer spawn: O(S) per frame, zero O(N) traffic.

    ``packed`` has ``n_real + S`` columns; the trailing S columns are a
    shadow scratch region so the contiguous window write never needs a
    dynamic width.  Valid spawn rows are compacted and written at the ring
    cursor; the wrapped part is folded back onto the head and the shadow is
    cleared (its ``life`` row would otherwise keep ghost particles alive).

    Allocation policy: slots are reused in spawn order — when the ring wraps
    into still-alive particles (saturated scene), the oldest spawns are
    replaced.  This is the classic particle-pool policy; the exact
    dead-slot-compaction policy of :func:`spawn_packed` remains available
    for reference-parity semantics.
    """
    s = spawn_rows.shape[1]
    assert packed.shape[1] == n_real + s, (packed.shape, n_real, s)
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    nv = jnp.sum(valid.astype(jnp.int32))
    compact_tgt = jnp.where(valid, rank, s)
    rows_c = jnp.zeros((8, s), jnp.float32).at[:, compact_tgt].set(
        spawn_rows, mode="drop", unique_indices=True)

    col = jnp.arange(s, dtype=jnp.int32)
    window = jax.lax.dynamic_slice(packed, (jnp.int32(0), cursor), (8, s))
    window = jnp.where(col[None, :] < nv, rows_c, window)
    packed = jax.lax.dynamic_update_slice(packed, window, (jnp.int32(0), cursor))

    wrapped = cursor + nv - n_real  # > 0 when the window crossed the end
    shadow = jax.lax.dynamic_slice(packed, (0, n_real), (8, s))
    head = jax.lax.dynamic_slice(packed, (0, 0), (8, s))
    head = jnp.where(col[None, :] < wrapped, shadow, head)
    packed = jax.lax.dynamic_update_slice(packed, head, (0, 0))
    packed = jax.lax.dynamic_update_slice(
        packed, jnp.zeros((8, s), jnp.float32), (0, n_real))

    return packed, (cursor + nv) % n_real


def pack_spawn_rows(spawn) -> jax.Array:
    """SpawnRows -> (8, S) packed layout (w is not carried on the packed
    path: emitter-scene forces are per-unit-mass)."""
    s = spawn.pos.shape[0]
    return jnp.stack([
        spawn.pos[:, 0], spawn.pos[:, 1], spawn.pos[:, 2],
        spawn.vel[:, 0], spawn.vel[:, 1], spawn.vel[:, 2],
        jnp.zeros((s,), jnp.float32), spawn.life,
    ], axis=0)

"""Force stack and collision response for emitter scenes.

The reference's only force is pairwise softened gravity
(``bodyBodyInteraction``, ``/root/reference/source/code/inc/app_common.cu:236-267``,
implemented in ``ops/nbody_forces`` / ``models/nbody``).  The BASELINE
benchmark configs add the classic particle-engine force stack — constant
gravity, wind, linear drag — and plane/sphere collision response with
restitution and friction, all folded into the fused step.

Semantics (shared verbatim with the numpy oracle in
``cpu_ref/oracle_emitter.py``):

* acceleration  ``a = g + (wind - v) * drag``
* semi-implicit Euler: ``v' = v + a*dt``;  ``p' = p + v'*dt``
* plane contact (signed distance ``d = dot(p'-point, n) < 0``):
  position is projected back to the surface, the inbound normal velocity is
  reflected scaled by restitution, tangential velocity scaled by
  ``(1 - friction)``.
* sphere contact (``|p'-c| < r``): same response with the outward radial
  normal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import EmitterSceneConfig


def accel(vel: jax.Array, cfg: EmitterSceneConfig) -> jax.Array:
    g = jnp.asarray(cfg.gravity, vel.dtype)
    a = jnp.broadcast_to(g, vel.shape)
    if cfg.drag:
        wind = jnp.asarray(cfg.wind, vel.dtype)
        a = a + (wind - vel) * jnp.asarray(cfg.drag, vel.dtype)
    return a


def _respond(pos, vel, n, depth, restitution, friction):
    """Shared contact response: push out along n by `depth` where depth>0,
    reflect inbound normal velocity."""
    contact = depth > 0
    pos = jnp.where(contact[:, None], pos + n * depth[:, None], pos)
    vn = jnp.sum(vel * n, axis=1)
    inbound = contact & (vn < 0)
    vnn = n * vn[:, None]
    vt = vel - vnn
    new_vel = vt * (1.0 - friction) - vnn * restitution
    vel = jnp.where(inbound[:, None], new_vel, vel)
    return pos, vel


def collide(pos: jax.Array, vel: jax.Array, cfg: EmitterSceneConfig):
    dt_ = pos.dtype
    for pl in cfg.planes:
        n = jnp.asarray(pl.normal, dt_)
        n = n / jnp.sqrt(jnp.sum(n * n))
        d = jnp.sum((pos - jnp.asarray(pl.point, dt_)) * n, axis=1)
        pos, vel = _respond(pos, vel, n, -d, pl.restitution, pl.friction)
    for sp in cfg.spheres:
        c = jnp.asarray(sp.center, dt_)
        dvec = pos - c
        dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=1))
        safe = jnp.maximum(dist, 1e-20)
        n = dvec / safe[:, None]
        pos, vel = _respond(pos, vel, n, sp.radius - dist, sp.restitution,
                            sp.friction)
    return pos, vel

"""Deterministic counter-based randomness.

The reference has two RNG paths, both problematic for reproducibility:

* device: per-slot curand states seeded ``curand_init(RAND_SEED, tid, tid, ..)``
  (``particleSystemCUDA.cu:45``), advanced by racy warp scheduling;
* host: an ``std::mt19937`` seeded from ``std::random_device`` and *recreated
  on every call* (``particleSystem.cpp:944-945, 29-56``) — nondeterministic
  run to run.

Here every draw is threefry keyed on ``(seed, frame, purpose)``, so whole
trajectories are bit-reproducible and independent of device count or
execution order.  The helpers reproduce the reference's sampling *formulas*
(``app.cu:295-316``) so the physics distributions match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Purpose tags folded into the per-frame key so independent random fields
# never alias.
UVEC = 0
FERT = 1
EMIT = 2
FILL = 3


def frame_key(seed: int, frame: jax.Array, purpose: int) -> jax.Array:
    key = jax.random.key(seed)
    key = jax.random.fold_in(key, purpose)
    return jax.random.fold_in(key, frame)


def uniform(key: jax.Array, shape, lo, hi, dtype=jnp.float32) -> jax.Array:
    """``min + u*(max-min)`` with ``u ~ U[0,1)`` — get_random_number
    (``app.cu:295-299``)."""
    u = jax.random.uniform(key, shape, dtype)
    return lo + u * (hi - lo)


def tag_mix(tag: jax.Array, frame: jax.Array) -> jax.Array:
    """Child tag from (parent tag, frame) — Knuth multiplicative mixing in
    uint32.  Deterministic and placement-independent, so reproduction is
    reproducible across device counts.  Mirrored by the numpy oracles."""
    t = tag.astype(jnp.uint32)
    f = frame.astype(jnp.uint32)
    return (t * jnp.uint32(2654435761) + f * jnp.uint32(2246822519)
            + jnp.uint32(977))


def _per_tag_u01(key: jax.Array, tags: jax.Array, n_draws: int) -> jax.Array:
    """(len(tags), n_draws) uniforms, each row keyed by its tag."""
    def one(t):
        return jax.random.uniform(jax.random.fold_in(key, t), (n_draws,))
    return jax.vmap(one)(tags.astype(jnp.uint32))


def per_tag_uniform(key: jax.Array, tags: jax.Array, lo, hi) -> jax.Array:
    u = _per_tag_u01(key, tags, 1)[:, 0]
    return lo + u * (hi - lo)


def per_tag_unit_vectors(key: jax.Array, tags: jax.Array) -> jax.Array:
    """Per-tag random unit vectors (integer-lattice construction,
    ``app.cu:301-316`` — see :func:`random_unit_vectors`)."""
    u = _per_tag_u01(key, tags, 3)
    return _lattice_unit(u)


def _lattice_unit(u: jax.Array, dtype=jnp.float32) -> jax.Array:
    ints = jnp.floor(u * 100.0).astype(jnp.int32) - 50
    vec = ints.astype(dtype)
    mag = jnp.sqrt(jnp.sum(vec * vec, axis=1, keepdims=True))
    safe = mag > 0
    vec = jnp.where(safe, vec / jnp.where(safe, mag, 1.0), 0.0)
    return jnp.where(safe, vec, jnp.array([1.0, 0.0, 0.0], dtype))


def random_unit_vectors(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Random unit vectors via the reference's integer-lattice construction
    (``app.cu:301-316``): three ints ``int(u*100) - 50`` in [-50, 49],
    normalized.  The reference divides by zero when all three ints are 0
    (p ≈ 1e-6); here that case falls back to +x."""
    u = jax.random.uniform(key, (n, 3), dtype)
    return _lattice_unit(u, dtype)

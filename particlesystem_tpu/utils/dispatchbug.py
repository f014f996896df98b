"""Containment for the jax-0.9 dispatch-cache misassociation bug.

Minimal repro: ``tools/repro_jax_dispatch_bug.py``.  Symptom: when several
differently-signatured Pallas-bearing jits coexist in one process, a cached
executable's input avals/shardings can come back misassociated across the
arg tree on a re-dispatch.  Observed surfaces (all from the SAME root cause):

* ``ValueError: ... supplied N buffers ...`` on first dereference of a
  result (backend InvalidArgument),
* ``IndexError`` converting a misassigned ``NamedSharding`` for a scalar arg,
* ``ValueError`` raised through ``jax ufuncs.py`` when a poisoned buffer
  feeds a later elementwise op (the round-2 order-dependent test escape),
* ``JaxRuntimeError: INVALID_ARGUMENT: TPU backend error`` on first host
  dereference of a poisoned result (round-3 bench surface) — so recovery
  must wrap dispatch AND the first sync together.

Round-3 TPU finding (axon relay, jax 0.9): the bug is HARSHER on the real
chip than on CPU.  Measured deterministically (small and 1M configs): once
a process has dispatched one Pallas-bearing program shape A (any number of
times is fine), the SECOND dispatch of a different Pallas-bearing shape B
returns ``INVALID_ARGUMENT`` and WEDGES the TPU client — after it, every
op, retry, and even host reads of previously-good arrays fail, so
:func:`recovering_call` cannot cure it (``jax.clear_caches()`` + retry
fails identically).  The only containment on this platform is AVOIDANCE:
dispatch at most ONE Pallas-bearing program shape more than once per
process.  :func:`multi_pallas_shapes_safe` is the gate consumers use to
decide whether dynamic re-bucketing / signature switching is allowed.

Because the message set is open-ended, the recovery is deliberately NOT
message-matched: any ``ValueError``/``IndexError`` from a dispatch gets ONE
``jax.clear_caches()`` + retry.  A genuine user error re-raises identically
on the retry, so correctness is unaffected — the only cost is one wasted
retry on real errors, which beats silently letting the flake through.

TODO(jax>0.9): delete this module (and its call sites) once
``tools/repro_jax_dispatch_bug.py`` prints OK on the installed jax.

ROOT CAUSE FOUND + FIXED (round 5, 2026-08-21): the poison was OUR
module-level concrete jax scalar ``_BIG = jnp.int32(1 << 30)`` in
``ops/neighbor_blocks.py`` — a module-level jax array captured as a
constant by every traced program, whose aval gets stamped by the first
mesh/program that touches it (the same mechanism 38c82ae found breaking
cross-mesh traces).  With it replaced by a Python int (38c82ae):

* ``tools/repro_jax_dispatch_bug.py`` prints OK (CPU),
* ``tools/probe_multi_shape_1m.py`` — the production-scale probe that
  deterministically WEDGED the axon client on 2026-08-18 — now SURVIVES
  60 frames across 4 Pallas program shapes on the real chip with the
  bit-exact alive sequence (2026-08-21), enabling dynamic re-bucketing
  on TPU.

:func:`multi_pallas_shapes_safe` therefore now returns True everywhere;
``PSTPU_SINGLE_PALLAS=1`` is the kill-switch that restores the frozen
single-shape containment if the wedge ever resurfaces (it was
platform-state-dependent historically — small-scale probes passed while
1M wedged — so the avoidance machinery stays one env var away).
:func:`recovering_call` remains as cheap last-line insurance: one
``jax.clear_caches()`` + retry on a dispatch-layer error, re-raising
real errors identically.  The canary test now watches for REGRESSION
(tests/test_dispatchbug_canary.py).
"""

from __future__ import annotations

import functools
import os

import jax

_RECOVERABLE = (IndexError, ValueError, jax.errors.JaxRuntimeError)


def multi_pallas_shapes_safe() -> bool:
    """Whether this process may dispatch MORE THAN ONE Pallas-bearing
    program shape repeatedly.  True since round 5: the wedge's root cause
    (a module-level concrete jax scalar shared across traces) was fixed in
    38c82ae and the production-scale probe now survives on the real chip
    — see module docstring.  ``PSTPU_SINGLE_PALLAS=1`` restores the
    frozen single-shape containment as a kill-switch."""
    if os.environ.get("PSTPU_SINGLE_PALLAS") == "1":
        return False
    return True


def recovering_call(fn, *args, **kwargs):
    """Call ``fn`` once; on a recoverable dispatch-cache error, clear the
    jax caches and retry exactly once (the retry re-raises real errors)."""
    try:
        return fn(*args, **kwargs)
    except _RECOVERABLE:
        jax.clear_caches()
        return fn(*args, **kwargs)


def recovering(fn):
    """Decorator form of :func:`recovering_call`."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        return recovering_call(fn, *args, **kwargs)
    return wrapped

"""Containment for the jax-0.9 dispatch-cache misassociation bug.

Minimal repro: ``tools/repro_jax_dispatch_bug.py``.  Symptom: when several
differently-signatured Pallas-bearing jits coexist in one process, a cached
executable's input avals/shardings can come back misassociated across the
arg tree on a re-dispatch.  Observed surfaces (all from the SAME root cause):

* ``ValueError: ... supplied N buffers ...`` on first dereference of a
  result (backend InvalidArgument),
* ``IndexError`` converting a misassigned ``NamedSharding`` for a scalar arg,
* ``ValueError`` raised through ``jax ufuncs.py`` when a poisoned buffer
  feeds a later elementwise op (the round-2 order-dependent test escape).

Because the message set is open-ended, the recovery is deliberately NOT
message-matched: any ``ValueError``/``IndexError`` from a dispatch gets ONE
``jax.clear_caches()`` + retry.  A genuine user error re-raises identically
on the retry, so correctness is unaffected — the only cost is one wasted
retry on real errors, which beats silently letting the flake through.

TODO(jax>0.9): delete this module (and its call sites) once
``tools/repro_jax_dispatch_bug.py`` prints OK on the installed jax.
"""

from __future__ import annotations

import functools

import jax

_RECOVERABLE = (IndexError, ValueError)


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

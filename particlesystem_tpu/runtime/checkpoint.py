"""Checkpoint / resume.

The reference has none — state lives only in pmlib address spaces for the
duration of a run (SURVEY.md §5); ``pFetchBack`` copies to host arrays but
nothing persists.  Here any sim-state pytree (ParticleState, EngineState)
round-trips through a single ``.npz`` with the frame counter and config
fingerprint, so long simulations survive restarts.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree) -> Tuple[dict, Any]:
    leaves, treedef = jax.tree.flatten(tree)
    # block first: materializing an in-flight jax array via __array__ can
    # corrupt the dispatch cache on this jax version (flaky "supplied N
    # buffers but compiled program expected M" on later unrelated calls)
    leaves = [jax.block_until_ready(l) for l in leaves]
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    return arrays, treedef


def save(path: str, tree, meta: dict | None = None) -> None:
    """Write a sim-state pytree (and optional JSON-able metadata) to .npz."""
    arrays, _ = _flatten(tree)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load(path: str, template, expect_config=None):
    """Read a checkpoint written by :func:`save`; ``template`` provides the
    pytree structure (e.g. a freshly built state of the same config).
    Returns (tree, meta).

    ``expect_config``: the config the caller will resume under.  Most physics
    knobs (dt, gravity, eps2, seed...) don't change array shapes, so shape
    checks alone would let a checkpoint silently resume under a different
    config; pass the config (or its fingerprint dict) to reject that."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        if expect_config is not None:
            want = (expect_config if isinstance(expect_config, dict)
                    else config_fingerprint(expect_config))
            stored = {k: meta[k] for k in want if k in meta}
            if stored != want:
                diff = {k: (stored.get(k), want[k])
                        for k in want if stored.get(k) != want[k]}
                raise ValueError(
                    f"checkpoint config mismatch (stored, current): {diff}")
        leaves, treedef = jax.tree.flatten(template)
        n = len(leaves)
        loaded = [data[f"leaf_{i}"] for i in range(n)]
        for tpl, got in zip(leaves, loaded):
            if tuple(np.shape(tpl)) != got.shape:
                raise ValueError(
                    f"checkpoint shape {got.shape} != template "
                    f"{tuple(np.shape(tpl))} — config mismatch?")
            if np.asarray(tpl).dtype != got.dtype:
                raise ValueError(
                    f"checkpoint dtype {got.dtype} != template "
                    f"{np.asarray(tpl).dtype} — config mismatch?")
        # copy=True: zero-copy aliasing of npz-backed numpy memory interacts
        # badly with the dispatch cache on this jax version (later calls with
        # NEW shapes flakily fail with a buffer-count mismatch)
        tree = jax.tree.unflatten(
            treedef, [jnp.array(x, copy=True) for x in loaded])
    return tree, meta


def config_fingerprint(cfg) -> dict:
    """JSON-able snapshot of a frozen config dataclass, for save() metadata."""
    def enc(v):
        if dataclasses.is_dataclass(v):
            return {f.name: enc(getattr(v, f.name))
                    for f in dataclasses.fields(v)}
        if isinstance(v, tuple):
            return [enc(x) for x in v]
        return v
    return enc(cfg)

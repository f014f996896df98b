"""Measure permutation-application primitives on the real TPU at 2M rows.

The n-body frame is dominated by applying the cell-sort permutation
(forward to build the snapshot, inverse to unsort kernel outputs).  XLA
row gathers/scatters cost tens of ns per ROW on v5e regardless of row
width, so the variants below compare: gather, scatter, argsort-inverse +
gather, and multi-operand carrying sort (lax.sort moving the payload
through the sort network itself).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


import numpy as np


def _sync(r):
    """block_until_ready is unreliable through the axon relay (see
    .claude/skills/verify/SKILL.md); force a tiny host readback instead."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(leaf.ravel()[:8])


def timed(name, f, *args, k1=3, k2=9):
    """Cost per call = slope between k1 and k2 CHAINED dispatches (each call
    feeds the next so the device cannot overlap or dedupe them)."""
    for _ in range(2):
        r = f(*args)
    _sync(r)
    ts = {}
    for k in (k1, k2, k1, k2):
        t0 = time.perf_counter()
        rs = []  # hold every result so none can be GC'd/cancelled mid-queue
        for _ in range(k):
            rs.append(f(*args))
        _sync(rs[-1])
        ts.setdefault(k, []).append(time.perf_counter() - t0)
        del rs
    t1 = sum(ts[k1]) / len(ts[k1])
    t2 = sum(ts[k2]) / len(ts[k2])
    ms = (t2 - t1) / (k2 - k1) * 1e3
    print(f"{name:34s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    n = 2 * 1024 * 1024
    num_cells = 4096
    k0 = jax.random.key(0)
    key = jax.random.randint(jax.random.split(k0, 1)[0], (n,), 0,
                             num_cells + 1, jnp.int32)
    cols16 = [jax.random.uniform(k, (n,), jnp.float32)
              for k in jax.random.split(k0, 16)]
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    out8 = jnp.stack(cols16[:8])  # (8, N)
    packed16 = jnp.stack(cols16, axis=1)  # (N, 16)
    jax.block_until_ready((order, out8, packed16))

    timed("argsort key", jax.jit(lambda k: jnp.argsort(k, stable=True)), key)
    timed("argsort order (inverse)",
          jax.jit(lambda o: jnp.argsort(o)), order)

    def carry_sort_n(m):
        @jax.jit
        def f(key, *cols):
            return jax.lax.sort((key,) + cols, num_keys=1, is_stable=True)
        return timed(f"lax.sort carry {m} f32 cols", f, key, *cols16[:m])

    carry_sort_n(1)
    carry_sort_n(4)
    carry_sort_n(8)
    carry_sort_n(16)

    timed("gather (N,16) rows", jax.jit(lambda p, o: p[o]), packed16, order)
    timed("gather (N,8) rows",
          jax.jit(lambda p, o: p[:, :8][o]), packed16, order)
    timed("gather (N,) f32", jax.jit(lambda c, o: c[o]), cols16[0], order)
    timed("gather (N,) bool",
          jax.jit(lambda c, o: (c > 0.5)[o]), cols16[0], order)

    timed("scatter (N,8) rows",
          jax.jit(lambda o, v: jnp.zeros((n, 8), jnp.float32).at[o].set(
              v.T, mode="drop", unique_indices=True)), order, out8)
    timed("scatter (N,) f32",
          jax.jit(lambda o, v: jnp.zeros((n,), jnp.float32).at[o].set(
              v, mode="drop", unique_indices=True)), order, cols16[0])
    timed("scatter (N,) bool",
          jax.jit(lambda o, v: jnp.zeros((n,), jnp.bool_).at[o].set(
              v > 0.5, mode="drop", unique_indices=True)), order, cols16[0])

    @jax.jit
    def unsort_via_sort(order, out8):
        res = jax.lax.sort((order,) + tuple(out8), num_keys=1,
                           is_stable=False)
        return res[1:]
    timed("unsort via sort(order,+8)", unsort_via_sort, order, out8)

    @jax.jit
    def inv_then_gather(order, out8):
        inv = jnp.argsort(order)
        return out8.T[inv]
    timed("argsort-inv + gather (N,8)", inv_then_gather, order, out8)

    skey = key[order]
    jax.block_until_ready(skey)
    timed("bincount+cumsum",
          jax.jit(lambda k: jnp.cumsum(jnp.bincount(k, length=num_cells + 1))),
          key)
    timed("searchsorted starts",
          jax.jit(lambda s: jnp.searchsorted(
              s, jnp.arange(num_cells + 2, dtype=jnp.int32))), skey)


if __name__ == "__main__":
    main()

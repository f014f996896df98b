"""Microbenchmark the memory-movement primitives for the n-body frame
redesign: sort-with-payload vs argsort+gather, searchsorted vs bincount,
gather-unsort vs scatter-unsort.  Same dispatch-slope method as
profile_nbody.py."""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N = 2 * 1024 * 1024
NUM_CELLS = 4096
f32 = jnp.float32


def timed(name, f, *args, k1=3, k2=9):
    for _ in range(2):
        r = f(*args)
    jax.block_until_ready(r)
    ts = {}
    for k in (k1, k2, k1, k2):
        t0 = time.perf_counter()
        for _ in range(k):
            r = f(*args)
        jax.block_until_ready(r)
        ts.setdefault(k, []).append(time.perf_counter() - t0)
    ms = (sum(ts[k2]) / 2 - sum(ts[k1]) / 2) / (k2 - k1) * 1e3
    print(f"{name:36s} {ms:8.2f} ms")
    return ms


def main():
    kk = jax.random.PRNGKey(0)
    key = jax.random.randint(kk, (N,), 0, NUM_CELLS + 1, jnp.int32)
    fields = [jax.random.uniform(jax.random.fold_in(kk, i), (N,), f32)
              for i in range(8)]
    iota = jnp.arange(N, dtype=jnp.int32)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    packed8 = jnp.stack(fields, axis=1)
    out8 = jnp.stack(fields, axis=0)  # (8, N)
    jax.block_until_ready((key, order, packed8, out8))

    timed("argsort (key,iota)",
          jax.jit(lambda k: jax.lax.sort([k, iota], is_stable=True,
                                         num_keys=1)), key)
    timed("sort key + 6 payloads",
          jax.jit(lambda k, a, b, c, d, e, g: jax.lax.sort(
              [k, iota, a, b, c, d, e, g], is_stable=True, num_keys=1)),
          key, *fields[:6])
    timed("sort key + 8 payloads",
          jax.jit(lambda k, *fs: jax.lax.sort(
              [k, iota, *fs], is_stable=True, num_keys=1)),
          key, *fields)
    timed("row gather (N,8)[order]",
          jax.jit(lambda p, o: p[o]), packed8, order)
    timed("row gather (N,8)[order].T",
          jax.jit(lambda p, o: p[o].T), packed8, order)
    timed("elem gather x8 (cols)",
          jax.jit(lambda o, *fs: jnp.stack([x[o] for x in fs], axis=0)),
          order, *fields)
    timed("unsort scatter (N,8)",
          jax.jit(lambda o8, o: jnp.zeros((N, 8), f32).at[o].set(
              o8.T, mode="drop", unique_indices=True)), out8, order)
    timed("inv = argsort(order)",
          jax.jit(lambda o: jax.lax.sort([o, iota], is_stable=False,
                                         num_keys=1)[1]), order)
    inv = jax.block_until_ready(jnp.argsort(order))
    timed("unsort gather out.T[inv]",
          jax.jit(lambda o8, i: o8.T[i]), out8, inv)
    timed("unsort gather (8,N)[:,inv].T?",
          jax.jit(lambda o8, i: o8[:, i]), out8, inv)
    timed("bincount", jax.jit(
        lambda k: jnp.bincount(k, length=NUM_CELLS + 1)), key)
    skey = jax.block_until_ready(jnp.sort(key))
    timed("searchsorted 4097", jax.jit(
        lambda s: jnp.searchsorted(s, jnp.arange(NUM_CELLS + 1,
                                                 dtype=jnp.int32))), skey)
    timed("starts[key] table gather", jax.jit(
        lambda s, k: s[jnp.minimum(k, NUM_CELLS)]),
        jnp.arange(NUM_CELLS + 1, dtype=jnp.int32), key)
    # assemble (16, N+1024) snap from (8,N) pieces + arithmetic rows
    @jax.jit
    def assemble(s8, sk):
        i3 = (sk // (16 * 16)).astype(f32)
        rem = sk % (16 * 16)
        i1 = (rem // 16).astype(f32)
        i2 = (rem % 16).astype(f32)
        z = jnp.zeros((6, N), f32)
        snap = jnp.concatenate([s8[0:5], i1[None], i2[None], i3[None],
                                s8[5:6], (sk < NUM_CELLS)[None].astype(f32),
                                z], axis=0)
        return jnp.pad(snap, ((0, 0), (0, 1024)))
    timed("assemble (16,N+CH)", assemble, out8, skey)


if __name__ == "__main__":
    main()

"""Pin down which piece of the engine frame's spawn machinery costs ~0.3 ms
at 10M slots (physics-only is ~0.65-0.75 ms; the full engine frame is
~0.95-1.15 — the O(S) spawn path should cost ~0.01 ms, not 0.3).

Variants (slim layout), timed interleaved with per-variant MIN (clock-drift
robust, see tools/profile_slim.py):

  physonly   physics + frame counter only
  rngonly    + spawn_fields RNG (result folded into accum, no state writes)
  nofold     + window write (dynamic_slice/where/DUS), NO wrap handling
  nocond     + unconditional O(S) wrap-fold (no lax.cond)
  full       the shipped frame (lax.cond wrap-fold)
  p8full     the shipped packed8 frame, for cross-layout reference

Usage: python tools/probe_spawn_overhead.py [capacity] [passes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench import scene, full_packed
from particlesystem_tpu.models import emitter as em
from particlesystem_tpu.ops import fused_step as fs
from particlesystem_tpu.runtime.engine import PackedEngine


def make_variant(cfg, eng, mode):
    shadow = eng.spawn_width  # padded spawn budget (== shadow for ring)
    n_real = cfg.slots

    def frame(s):
        if mode == "physonly":
            fields = fs.physics_step_slim(s.fields, cfg)
            return s.__class__(fields=fields, accum=s.accum,
                               free_list=s.free_list, cursor=s.cursor,
                               n_free=s.n_free, frame=s.frame + 1)

        spawn, accum = em.spawn_fields(cfg, s.frame, s.accum, 0)
        fields = fs.physics_step_slim(s.fields, cfg)
        rows = fs.pack_spawn_rows_slim(spawn, s.frame, cfg.dt)
        pad = shadow - rows[0].shape[0]
        if pad:
            rows = tuple(jnp.pad(r, (0, pad)) for r in rows)
            valid = jnp.pad(spawn.valid, (0, pad))
        else:
            valid = spawn.valid

        if mode == "rngonly":
            # consume the rows without touching particle state (0*sum keeps
            # XLA from DCE'ing the RNG: float 0*x isn't folded)
            accum = accum + 0.0 * (jnp.sum(rows[0]) + jnp.sum(rows[6]))
            return s.__class__(fields=fields, accum=accum,
                               free_list=s.free_list, cursor=s.cursor,
                               n_free=s.n_free, frame=s.frame + 1)

        sz = rows[0].shape[0]
        rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
        nv = jnp.sum(valid.astype(jnp.int32))
        compact_tgt = jnp.where(valid, rank, sz)
        col = jnp.arange(sz, dtype=jnp.int32)
        rows8 = jnp.stack(rows, axis=1)
        rc8 = jnp.zeros((sz, len(rows)), jnp.float32).at[compact_tgt].set(
            rows8, mode="drop", unique_indices=True)

        written = []
        for i, f in enumerate(fields):
            window = jax.lax.dynamic_slice(f, (s.cursor,), (sz,))
            window = jnp.where(col < nv, rc8[:, i], window)
            written.append(jax.lax.dynamic_update_slice(f, window,
                                                        (s.cursor,)))
        written = tuple(written)
        wrapped = s.cursor + nv - n_real

        if mode == "nofold":
            pass
        elif mode == "static0":
            # window write at STATIC offset 0 (wrong semantics, timing only):
            # isolates the cost of the DYNAMIC start index in ds/dus
            written = []
            for i, f in enumerate(fields):
                window = jax.lax.dynamic_slice(f, (0,), (sz,))
                window = jnp.where(col < nv, rc8[:, i], window)
                written.append(jax.lax.dynamic_update_slice(f, window, (0,)))
            written = tuple(written)
        elif mode == "writeonly":
            # skip the resident read: unconditional window overwrite (wrong
            # semantics - invalid rows clobber residents; timing only):
            # isolates dynamic_slice READ vs dynamic_update_slice WRITE
            written = tuple(
                jax.lax.dynamic_update_slice(f, rc8[:, i], (s.cursor,))
                for i, f in enumerate(fields))
        elif mode == "row2d":
            # window write through a (N/sz, sz) 2-D view: the dynamic index
            # rides dim 0 only (lane offset static 0) - the layout-friendly
            # form of an sz-ALIGNED window write (strided-alloc cursors are
            # always multiples of sz; timing uses lap = cursor // sz)
            lap = s.cursor // sz
            written = []
            for i, f in enumerate(fields):
                f2d = f[:n_real].reshape(n_real // sz, sz)
                window = jax.lax.dynamic_slice(f2d, (lap, 0), (1, sz))
                window = jnp.where((col < nv)[None, :], rc8[None, :, i],
                                   window)
                f2d = jax.lax.dynamic_update_slice(f2d, window, (lap, 0))
                out = f2d.reshape(n_real)
                if f.shape[0] != n_real:  # re-attach shadow region untouched
                    out = jnp.concatenate([out, f[n_real:]])
                written.append(out)
            written = tuple(written)
        elif mode == "nocond":
            out = []
            for f in written:
                sh = jax.lax.dynamic_slice(f, (n_real,), (sz,))
                head = jax.lax.dynamic_slice(f, (0,), (sz,))
                head = jnp.where(col < wrapped, sh, head)
                f = jax.lax.dynamic_update_slice(f, head, (0,))
                f = jax.lax.dynamic_update_slice(
                    f, jnp.zeros((sz,), jnp.float32), (n_real,))
                out.append(f)
            written = tuple(out)
        else:
            raise ValueError(mode)

        step = sz if mode == "row2d" else nv
        return s.__class__(fields=written, accum=accum,
                           free_list=s.free_list,
                           cursor=(s.cursor + step) % n_real,
                           n_free=s.n_free, frame=s.frame + 1)

    return jax.jit(
        lambda st, k: jax.lax.fori_loop(0, k, lambda _, x: frame(x), st,
                                        unroll=2),
        static_argnums=1, donate_argnums=0)


def make_select2d(cfg, width):
    """Spawn as a pure elementwise broadcast-select over natively-2D state:
    fields are (B, W) with W = padded spawn budget; the write window IS row
    ``lap``, so the spawn write fuses into the physics pass (no DUS, no
    scatter, no reshape) — out[b,j] = where(b==lap & valid[j], row[j], phys).
    Strided-alloc recycling semantics (cursor advances one full row/frame).
    """
    n_real = cfg.slots
    assert n_real % width == 0
    b_rows = n_real // width

    def frame(s):
        spawn, accum = em.spawn_fields(cfg, s.frame, s.accum, 0)
        fields = fs.physics_step_slim(s.fields, cfg)
        rows = fs.pack_spawn_rows_slim(spawn, s.frame, cfg.dt)
        pad = width - rows[0].shape[0]
        if pad:
            rows = tuple(jnp.pad(r, (0, pad)) for r in rows)
            valid = jnp.pad(spawn.valid, (0, pad))
        else:
            valid = spawn.valid
        bmask = (jnp.arange(b_rows, dtype=jnp.int32) == s.cursor)[:, None]
        sel = bmask & valid[None, :]                       # (B, W)
        written = tuple(jnp.where(sel, r[None, :], f)
                        for f, r in zip(fields, rows))
        return s.__class__(fields=written, accum=accum,
                           free_list=s.free_list,
                           cursor=jax.lax.rem(s.cursor + 1,
                                              jnp.int32(b_rows)),
                           n_free=s.n_free, frame=s.frame + 1)

    return jax.jit(
        lambda st, k: jax.lax.fori_loop(0, k, lambda _, x: frame(x), st,
                                        unroll=2),
        static_argnums=1, donate_argnums=0)


def slope_once(fn, state, k_short=16, k_long=112):
    t0 = time.perf_counter()
    state = fn(state, k_short)
    float(jnp.sum(jax.tree_util.tree_leaves(state)[0][:8]))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state = fn(state, k_long)
    float(jnp.sum(jax.tree_util.tree_leaves(state)[0][:8]))
    t_l = time.perf_counter() - t0
    return state, (t_l - t_s) / (k_long - k_short) * 1e3


def main():
    capacity = int(sys.argv[1]) if len(sys.argv) > 1 else 10 * (1 << 20)
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cfg = scene(capacity)

    variants = {}
    for mode in ("physonly", "rngonly", "nofold", "nocond",
                 "static0", "writeonly", "row2d"):
        # row2d models the aligned strided window: no shadow region
        alloc = "strided" if mode == "row2d" else "ring"
        eng = PackedEngine(cfg, alloc=alloc, layout="slim")
        es = eng.init(full_packed(cfg, jax.random.key(0)))
        variants[mode] = (make_variant(cfg, eng, mode), es)
    for layout, alloc, name in (("slim", "ring", "full"),
                                ("packed8", "ring", "p8full"),
                                ("slim", "strided", "strided"),
                                ("packed8", "strided", "p8strided")):
        eng = PackedEngine(cfg, alloc=alloc, layout=layout)
        es = eng.init(full_packed(cfg, jax.random.key(0)))
        variants[name] = ((lambda e: lambda s, k: e.step_many(s, k))(eng), es)

    # natively-2D broadcast-select spawn (see make_select2d)
    eng = PackedEngine(cfg, alloc="strided", layout="slim")
    es = eng.init(full_packed(cfg, jax.random.key(0)))
    w = eng.spawn_width
    es = es.__class__(
        fields=tuple(f.reshape(cfg.slots // w, w) for f in es.fields),
        accum=es.accum, free_list=es.free_list,
        cursor=es.cursor, n_free=es.n_free, frame=es.frame)
    variants["select2d"] = (make_select2d(cfg, w), es)

    states = {}
    for name, (fn, st) in variants.items():
        t0 = time.perf_counter()
        st = fn(st, 16)
        st = fn(st, 112)
        float(jnp.sum(jax.tree_util.tree_leaves(st)[0][:8]))
        states[name] = st
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s", flush=True)

    samples = {name: [] for name in variants}
    for p in range(passes):
        for name, (fn, _) in variants.items():
            states[name], ms = slope_once(fn, states[name])
            samples[name].append(ms)
        print(f"pass {p}: " + "  ".join(
            f"{n}={samples[n][-1]:.3f}" for n in variants), flush=True)

    print()
    for name in variants:
        v = samples[name]
        print(f"{name:10s} min {min(v):7.3f}  med {np.median(v):7.3f} "
              f"ms/frame", flush=True)


if __name__ == "__main__":
    main()

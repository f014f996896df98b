"""Single-stage timing child process for ``NBodySimulation.profile_frame``.

Why a subprocess per stage: jax 0.9's dispatch-cache misassociation
(``tools/repro_jax_dispatch_bug.py``) is PROCESS-GLOBAL — once a
Pallas-bearing jit has run, any later-created jit signature fails on its
second dispatch ("supplied N buffers but compiled program expected M", or a
backend InvalidArgument on the first dereference).  First calls always
succeed, so the parent can compute every stage's INPUTS with single calls,
save them, and hand each stage to a child process where its jit is the
first and only signature — unlimited clean dispatches, honest slope
timings.  With the persistent compilation cache enabled the per-child
compile cost is a cache load.

Run as ``python -m particlesystem_tpu.utils.profile_stage --npz F --cfg J
--stage S``; prints one JSON line ``{"stage": S, "ms": N}``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def stage_fn(stage: str, cfg, width: int, impl: str, n: int):
    """Return (fn, arg_names) for one frame stage.  Imported lazily so the
    child only traces what it times."""
    import jax
    import jax.numpy as jnp

    from ..core.state import ParticleState
    from ..models import nbody
    from ..ops import neighbor_blocks as nbk
    from ..ops.grid import build_bins, coords_to_cell, wrap_positions

    if stage == "rng_fields":
        return (lambda frame, tag: nbody.frame_fields(cfg, frame, tag),
                ["frame", "tag"])
    if stage == "build_grid":
        if impl == "blocks":
            def f(pos, age, w, cell, alive, tag):
                return nbk.prepare(pos, age, w, cell, alive, cfg, tags=tag)
            return f, ["pos", "age", "w", "cell", "alive", "tag"]

        def f(cell, alive):
            return build_bins(cell, alive, cfg.grid.num_cells,
                              cfg.cell_capacity, list_width=width)
        return f, ["cell", "alive"]
    if stage == "cell_ids":
        return (lambda pos: coords_to_cell(
            wrap_positions(pos, cfg.grid)[1], cfg.grid), ["pos"])
    if stage == "calc_forces":
        return (lambda snap, chunks: nbk.kernel_call(
            cfg, snap, chunks, n, acc_mxu=cfg.fast_accum),
                ["snap", "chunks"])
    if stage == "unsort":
        from ..ops.neighbor import collision_okey
        return (lambda kout, order, ovf_s, tag: nbk.unsort_outputs(
            kout, order, ovf_s, okeys=collision_okey(tag)),
                ["kout", "order", "ovf_s", "tag"])
    if stage == "lifecycle":
        def f(pos, vel, acc, w, age, life, alive, parent, tag, uvec, fert,
              frame):
            st = ParticleState(pos=pos, vel=vel, acc=acc, w=w, age=age,
                               life=life, alive=alive, parent=parent,
                               tag=tag)
            pw, _ = wrap_positions(pos, cfg.grid)
            zero3 = jnp.zeros_like(pos)
            false_n = jnp.zeros(pos.shape[:1], jnp.bool_)
            return nbody.lifecycle_update(st, pw, false_n, zero3, false_n,
                                          false_n, uvec, fert, frame, cfg)
        return f, ["pos", "vel", "acc", "w", "age", "life", "alive",
                   "parent", "tag", "uvec", "fert", "frame"]
    if stage == "full_frame":
        return (lambda pos, vel, acc, w, age, life, alive, parent, tag,
                frame: nbody.step(
                    ParticleState(pos=pos, vel=vel, acc=acc, w=w, age=age,
                                  life=life, alive=alive, parent=parent,
                                  tag=tag), frame, cfg, width, impl),
                ["pos", "vel", "acc", "w", "age", "life", "alive",
                 "parent", "tag", "frame"])
    raise ValueError(f"unknown stage {stage!r}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--cfg", required=True, help="json NBodyConfig fields")
    ap.add_argument("--stage", required=True)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--impl", default="blocks")
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=6)
    args = ap.parse_args(argv)

    import numpy as np

    import jax

    try:  # persistent cache: child compiles become cache loads
        import os
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if cache:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from ..core.config import GridSpec, NBodyConfig

    d = json.loads(args.cfg)
    d["grid"] = GridSpec(**d["grid"])
    cfg = NBodyConfig(**d)

    data = np.load(args.npz)
    n = int(data["pos"].shape[0])
    fn, names = stage_fn(args.stage, cfg, args.width, args.impl, n)
    fjit = jax.jit(fn)
    inputs = [jnp.asarray(data[k]) for k in names]

    def sync(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        idx = tuple(slice(0, 1) for _ in leaf.shape)
        np.asarray(jax.device_get(leaf[idx]))

    for _ in range(2):
        r = fjit(*inputs)
    sync(r)
    ts = {}
    for k in (args.k1, args.k2, args.k1, args.k2):
        t0 = time.perf_counter()
        rs = [fjit(*inputs) for _ in range(k)]
        sync(rs[-1])
        ts.setdefault(k, []).append(time.perf_counter() - t0)
        del rs
    ms = ((sum(ts[args.k2]) / 2 - sum(ts[args.k1]) / 2)
          / (args.k2 - args.k1) * 1e3)
    print(json.dumps({"stage": args.stage, "ms": ms}))


if __name__ == "__main__":
    main()

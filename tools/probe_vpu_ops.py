"""Measure the per-lane cost of VPU op classes inside a Pallas TPU kernel.

The cluster-pair kernel's roofline shows ~60 *effective* VPU ops per
candidate vs a ~23-op hand count (NOTES.md) — Mosaic overhead attributed
to mask/select lanes.  This probe times K-layer loops of each op class on
a (512, 1024) f32 tile (the production tile shape) and reports ns/layer by
K-slope (cancels loop/DMA/dispatch overhead), so the hand count can be
converted into hardware lanes honestly.

Op classes:
  fma     acc = acc * c + x                      (1 arith op)
  mul     acc = acc * x                          (1 arith op)
  cmp     m = x > acc;    acc = acc + m * c      (compare + convert-ish)
  select  m = x > acc;    acc = where(m, x, acc) (compare + select)
  and2    m = (x > acc) & (x < c); acc = where(m, x, acc)
  rsqrt   acc = rsqrt(acc + x)

One (variant, K) program per PROCESS (the platform dispatches at most one
Pallas shape per process more than once, utils/dispatchbug.py); the parent
runs two child processes per variant and computes the slope.

Per-layer op counts for converting ns/layer to ns/op (every layer also
carries a ~1-op anti-fold broadcast add, and single-op variants carry the
loop accumulator through VMEM each iteration, so cross-class ratios of the
single-op variants are overhead-contaminated — the fused chain variants
are the trustworthy rates): fma/mul 1, cmp 2, select 2, and2 4, rsqrt 1,
chain16 16 fmas, chainmix16 4 x (2 cmp + and + fma + select) = 20 ops.

Usage: python tools/probe_vpu_ops.py               # all variants
       python tools/probe_vpu_ops.py --one fma 64  # child mode
"""

import json
import os
import subprocess
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B, CH = 512, 1024
G = 64          # grid steps per dispatch
VARIANTS = ("fma", "mul", "cmp", "select", "and2", "rsqrt",
            "chain16", "chainmix16")


def _kernel(variant: str, k: int, x_ref, o_ref):
    x = x_ref[:]
    c = jnp.float32(1.0000001)

    def body(j, acc):
        # the loop index feeds the data path so Mosaic can't fold layers
        t = acc + jax.lax.convert_element_type(j, jnp.float32) * 1e-30
        if variant == "fma":
            return t * c + x
        if variant == "mul":
            return t * x
        if variant == "cmp":
            m = x > t
            return t + m.astype(jnp.float32)
        if variant == "select":
            m = x > t
            return jnp.where(m, x, t)
        if variant == "and2":
            m = (x > t) & (x < c)
            return jnp.where(m, x, t)
        if variant == "rsqrt":
            return jax.lax.rsqrt(t + x)
        if variant == "chain16":
            # 16 fmas fused in ONE expression: intermediates stay in
            # vregs, so per-op cost = the register-resident rate (divide
            # ns_per_layer by 16) — the regime the production chunk body
            # runs in, vs the loop-carried VMEM round-trip above
            a = t
            for _ in range(16):
                a = a * c + x
            return a
        if variant == "chainmix16":
            # the production mix, fused: compares, selects, bool-ands
            a = t
            for _ in range(4):
                m = (a > x) & (a < c)
                a = jnp.where(m, a * c + x, a)
            return a
        raise ValueError(variant)

    o_ref[:] = jax.lax.fori_loop(0, k, body, x * 0.5)


def _call(variant: str, k: int, x):
    return pl.pallas_call(
        partial(_kernel, variant, k),
        out_shape=jax.ShapeDtypeStruct((B, CH), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec((B, CH), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, CH), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def _sync(r):
    np.asarray(jax.device_get(r[:1, :8]))


def _time(f, reps=6, d=8):
    rs = [f() for _ in range(2)]
    _sync(rs[-1])
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [f() for _ in range(d)]
        _sync(rs[-1])
        best.append((time.perf_counter() - t0) / d)
    return float(np.median(best))


K1, K2 = 64, 192


def child(variant: str, k: int):
    """Time ONE (variant, k) program — one Pallas shape per process (the
    platform rule, utils/dispatchbug.py; the parent computes the K-slope
    from two child processes)."""
    x = jnp.asarray(np.random.default_rng(0).random((B, CH), np.float32))
    f = jax.jit(lambda x: _call(variant, k, x))
    t = _time(lambda: f(x))
    print("RESULT " + json.dumps({"variant": variant, "k": k,
                                  "t": t}), flush=True)


def _run_child(variant: str, k: int) -> float:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", variant,
         str(k)],
        capture_output=True, text=True)
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    if not line:
        raise RuntimeError(f"{variant} k={k} failed:\n{proc.stdout}\n"
                           f"{proc.stderr[-2000:]}")
    return json.loads(line[-1][7:])["t"]


def main():
    if len(sys.argv) > 3 and sys.argv[1] == "--one":
        child(sys.argv[2], int(sys.argv[3]))
        return
    out = {}
    for v in VARIANTS:
        try:
            t1 = _run_child(v, K1)
            t2 = _run_child(v, K2)
        except RuntimeError as e:
            print(e)
            continue
        per_layer = (t2 - t1) / ((K2 - K1) * G)
        lanes = B * CH
        r = {"variant": v, "ns_per_layer": round(per_layer * 1e9, 2),
             "tops_equiv": round(lanes / per_layer / 1e12, 3)}
        out[v] = r
        print(f"{v:10s} {r['ns_per_layer']:8.2f} ns/layer "
              f"({r['tops_equiv']:6.3f} Tlanes/s)", flush=True)
    if "fma" in out:
        base = out["fma"]["ns_per_layer"]
        for v, r in out.items():
            print(f"{v:7s} {r['ns_per_layer'] / base:5.2f}x fma")


if __name__ == "__main__":
    main()

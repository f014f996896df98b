"""Production-scale probe of the TPU multi-Pallas-shape wedge.

Round-3 history: the wedge ("second dispatch of a second Pallas-bearing
program shape returns INVALID_ARGUMENT and wedges the axon client",
utils/dispatchbug.py) was measured deterministically earlier in the round,
so `multi_pallas_shapes_safe()` returns False on TPU and the driver freezes
the active prefix at init.  Later probes (tools/probe_fixed_kernel_width.py,
2026-08-18) could no longer reproduce it at small scale — BOTH the
fixed-kernel-width variant and the two-kernel-width control SURVIVED
interleaved dispatches — suggesting the platform was updated.

This probe is the decisive production-scale test: the REAL reference sim at
1M with dynamic re-bucketing forced on (PSTPU_MULTI_PALLAS=1).  As the
population decays from the 1M fill toward the ~372k steady state the driver
re-buckets the active prefix, compiling + dispatching SEVERAL Pallas-bearing
program shapes in one process — the exact pattern the wedge forbids.

Usage:
  python tools/probe_multi_shape_1m.py          # dynamic buckets (probe)
  python tools/probe_multi_shape_1m.py --frozen # frozen prefix (reference)

Interpretation: the probe surviving N frames with the SAME per-frame alive
sequence as the frozen run proves (a) no wedge, (b) the bit-exactness
contract of step(active=...) holds across re-buckets.

RESULT (2026-08-18, v5e axon relay): the wedge REPRODUCES at production
scale.  Frame 1 re-bucketed to active=1310720 (alive 860201), frame 2
re-bucketed to active=786432 (alive 377184), and frame 3's first host read
raised ``INVALID_ARGUMENT: TPU backend error`` and wedged the client — the
second dispatch of the third Pallas-bearing shape.  The small-scale probes
(probe_fixed_kernel_width.py) SURVIVE, so the wedge is scale- or
resource-dependent, not purely shape-keyed; the fixed-kernel-width plan
does NOT transfer to 1M.  Conclusion: ``multi_pallas_shapes_safe()``
stays False on TPU and the driver keeps the frozen-prefix design.
Checkpoint + reload in a fresh process remains the supported re-bucket.

RESULT (2026-08-21, v5e axon relay, SAME jax 0.9.0, after 38c82ae replaced
the module-level ``jnp.int32`` kernel constant with a Python literal):
SURVIVED 60 frames, 4 program shapes (buckets 0 -> 1310720 -> 786432 ->
524288), alive sequence bit-matching the frozen-prefix bench at the
crossover frames (361108 at frame 32, 368866 at frame 19).  The
module-level concrete jax scalar was the root cause; dynamic re-bucketing
is enabled on TPU (``multi_pallas_shapes_safe()`` True,
``PSTPU_SINGLE_PALLAS=1`` kill-switch) — see NOTES.md dispatch-bug
section and utils/dispatchbug.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
if "--frozen" in sys.argv:
    # re-arm the frozen single-shape containment for the reference run
    os.environ["PSTPU_SINGLE_PALLAS"] = "1"
else:
    os.environ.pop("PSTPU_SINGLE_PALLAS", None)  # dynamic (the default)

import jax  # noqa: E402

from particlesystem_tpu.api import NBodySimulation  # noqa: E402
from particlesystem_tpu.core.config import GridSpec, NBodyConfig  # noqa: E402

FRAMES = 60


def main():
    frozen = "--frozen" in sys.argv
    cfg = NBodyConfig(n_fill=1024 * 1024, grid=GridSpec(grid_dim=16))
    sim = NBodySimulation(cfg, impl="blocks")
    print(f"mode={'frozen' if frozen else 'dynamic'} backend="
          f"{jax.default_backend()} init_active={sim._active}", flush=True)
    alive_seq = []
    buckets = [sim._active]
    for f in range(FRAMES):
        t0 = time.time()
        sim.run(1)
        a = int(sim.last_stats.n_alive)
        alive_seq.append(a)
        if sim._active != buckets[-1]:
            buckets.append(sim._active)
            print(f"frame {f + 1}: RE-BUCKET -> active={sim._active} "
                  f"(alive {a}, {time.time() - t0:.1f}s)", flush=True)
        elif f % 10 == 0 or f == FRAMES - 1:
            print(f"frame {f + 1}: alive {a} active={sim._active} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    print(f"buckets seen: {buckets}", flush=True)
    print(f"ALIVE_SEQ={alive_seq}", flush=True)
    print(f"{'frozen' if frozen else 'dynamic'}: SURVIVED {FRAMES} frames, "
          f"{len(buckets)} program shapes", flush=True)


if __name__ == "__main__":
    main()

"""Measure the PRODUCTION batched driver loop on the real chip and compare
it against the bench slope — the VERDICT r3 #1 / r4 item 3 done-criterion:
``NBodySimulation.run(batch=16)`` (what ``python -m particlesystem_tpu
nbody`` executes by default since batch=0 auto-batching) must run at the
benchmarked frame time plus exactly the amortized per-batch sync.

Flow (mirrors bench.py's two-phase plateau method so the numbers are
apples-to-apples):

1. subprocess: ``bench.py --stage nbody_warm_1m <ckpt>`` — run the initial
   collapse through the production driver and checkpoint the plateau.
2. subprocess: ``bench.py --stage nbody_1m <ckpt>`` — the published
   sync-free dispatch-count-slope frame time.
3. subprocess (this file, --phase driver): load the same checkpoint fresh
   (re-picks the plateau prefix exactly as any user's resume does), warm
   the batch-16 loop program off-state, then wall-clock ``run(16,
   batch=16)`` twice.  Per-frame = t/16, INCLUDING the one ~25 ms relay
   sync per batch (~1.6 ms/frame amortized) — the production cost.

Prints one JSON line: driver per-frame ms (both reps), bench slope ms, and
the delta.  Expected: driver ≈ slope + sync/16; a driver number far above
that means the production loop is paying hidden per-frame syncs again.

Run: ``python tools/measure_batched_run.py`` (on the TPU; needs the
persistent compile cache for sane wall times — bench.py sets it).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _phase_driver(ckpt: str, batch: int = 16, reps: int = 3):
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from particlesystem_tpu.api import NBodySimulation
    from particlesystem_tpu.core.config import GridSpec, NBodyConfig

    cfg = NBodyConfig(n_fill=1 << 20, grid=GridSpec(grid_dim=16))
    sim = NBodySimulation(cfg, impl="blocks")
    sim.load(ckpt)
    # load() defers the prefix pick to run() (dynamic re-bucketing is the
    # default since the round-5 gate flip) — apply it NOW through the
    # production mechanism so every measured rep runs at the plateau
    # prefix the bench slope uses, not a full-width first batch
    alive = int(np.asarray(sim.state.alive).sum())
    sim._apply_bucketing(alive)
    # warm the batch loop program WITHOUT advancing the sim: one discarded
    # dispatch compiles it (the measurement below then stays inside the
    # initial-cohort plateau window, frames < ~35 at 1M — NOTES.md)
    fn = sim._loop_fn(batch)
    sim._claim_shape(("loop", batch, sim._width, sim._active))
    _s, _st, g = fn(sim.state, jnp.int32(sim.frame))
    np.asarray(g)  # sync; hold results live until here
    del _s, _st, g

    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sim.run(batch, batch=batch)
        out.append((time.perf_counter() - t0) / batch * 1e3)
    print("RESULT " + json.dumps(out), flush=True)


def main():
    td = tempfile.mkdtemp()
    ckpt = os.path.join(td, "plateau_1m.npz")

    def stage(args, tag):
        proc = subprocess.run([sys.executable, *args], capture_output=True,
                              text=True, cwd=REPO, timeout=3600)
        if proc.returncode != 0:
            raise RuntimeError(f"{tag} failed:\n{proc.stderr[-3000:]}")
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("RESULT ")][-1]
        return json.loads(line[7:])

    prefix, alive, frame = stage([BENCH, "--stage", "nbody_warm_1m", ckpt],
                                 "warm")
    print(f"plateau checkpoint: frame {frame}, alive {alive}",
          file=sys.stderr)
    slope_ms, slope_alive = stage([BENCH, "--stage", "nbody_1m", ckpt],
                                  "bench slope")
    driver_ms = stage([os.path.abspath(__file__), "--phase", "driver",
                       ckpt], "driver run(batch=16)")
    med = sorted(driver_ms)[len(driver_ms) // 2]
    print(json.dumps({
        "bench_slope_ms": round(slope_ms, 2),
        "driver_run_batch16_ms": [round(x, 2) for x in driver_ms],
        "driver_minus_slope_ms": round(med - slope_ms, 2),
        "expected_sync_amortized_ms": "~25/16 ~= 1.6",
        "alive": slope_alive,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--phase" \
            and sys.argv[2] == "driver":
        _phase_driver(sys.argv[3])
    else:
        main()

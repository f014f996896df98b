"""Stage-by-stage frame accounting for the n-body workload at any scale —
the data behind the NOTES.md roofline tables (VERDICT r2 item 10 asked for
the 10M/32^3 config, where sort cost at ~13M active rows and packing
efficiency at the larger grid must be measured, not extrapolated).

Each stage is timed in its own subprocess by ``NBodySimulation.
profile_frame`` (dispatch-count slope, host-readback sync), after settling
the population onto the initial-cohort plateau.

Usage: python tools/roofline_nbody.py [n_fill_log2=20] [grid_dim=16]
       python tools/roofline_nbody.py 10M          # 10*2^20 / 32^3 shortcut
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from particlesystem_tpu.api import NBodySimulation
from particlesystem_tpu.core.config import GridSpec, NBodyConfig


def main():
    if len(sys.argv) > 1 and sys.argv[1].upper() == "10M":
        n_fill, grid_dim = 10 << 20, 32
    else:
        n_fill = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
        grid_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = NBodyConfig(n_fill=n_fill, grid=GridSpec(grid_dim=grid_dim))
    sim = NBodySimulation(cfg)
    print(f"n_fill={n_fill} grid={grid_dim}^3 slots={cfg.slots} "
          f"active={sim._active or cfg.slots}", flush=True)
    sim.run(3)
    print(f"settled: alive={int(sim.last_stats.n_alive)}", flush=True)
    stages = sim.profile_frame()
    total = sum(v for k, v in stages.items() if k != "full_frame")
    for k, v in stages.items():
        print(f"  {k:14s} {v:8.2f} ms", flush=True)
    print(f"  {'stage sum':14s} {total:8.2f} ms")
    print(json.dumps({"n_fill": n_fill, "grid_dim": grid_dim,
                      "alive": int(sim.last_stats.n_alive), **stages}))


if __name__ == "__main__":
    main()

"""CLI launcher — the analog of the reference's ``make run``
(``/root/reference/makefile:3-4``: ``mpirun -n 2 ... particleSystem.exe``).

    python -m particlesystem_tpu nbody  --particles 1048576 --iterations 10
    python -m particlesystem_tpu demo   --capacity 1000000 --frames 600
    python -m particlesystem_tpu bench
"""

from __future__ import annotations

import argparse
import sys


def _cmd_nbody(args):
    from .api import NBodySimulation
    from .core.config import GridSpec, NBodyConfig

    cfg = NBodyConfig(n_fill=args.particles,
                      grid=GridSpec(grid_dim=args.grid_dim))
    sim = NBodySimulation(cfg)
    sim.run(args.iterations, verbose=True)
    print(sim.timers.report())


def _cmd_demo(args):
    from .api import ParticleSystem

    ps = (ParticleSystem(capacity=args.capacity, dt=1 / 60,
                         gravity=(0, -9.8, 0), drag=0.2, wind=(2.0, 0, 0),
                         alloc="ring")
          .add_emitter(pos=(0.0, 1.0, 0.0), rate=args.capacity * 0.5,
                       speed=9.0, life_min=1.0, life_max=2.0)
          .add_plane(restitution=0.5, friction=0.2))
    chunk = 60
    for _ in range(args.frames // chunk):
        ps.step(chunk)
        print(f"frame {ps.frame}: alive {ps.alive_count()}")
    print(ps.timers.report())


def _cmd_bench(args):
    sys.path.insert(0, ".")
    import bench
    bench.main()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="particlesystem_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("nbody", help="run the reference n-body simulation")
    p.add_argument("--particles", type=int, default=1 << 20)
    p.add_argument("--grid-dim", type=int, default=16)
    p.add_argument("--iterations", type=int, default=10)
    p.set_defaults(fn=_cmd_nbody)

    p = sub.add_parser("demo", help="run an emitter demo scene")
    p.add_argument("--capacity", type=int, default=1 << 20)
    p.add_argument("--frames", type=int, default=600)
    p.set_defaults(fn=_cmd_demo)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=_cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

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
    from .core.config import GridSpec, NBodyConfig

    cfg = NBodyConfig(n_fill=args.particles,
                      grid=GridSpec(grid_dim=args.grid_dim))
    if args.devices > 1:
        _run_nbody_sharded(args, cfg)
        return
    from .api import NBodySimulation

    sim = NBodySimulation(cfg)
    sim.run(args.iterations, verbose=True)
    print(sim.timers.report())


def _run_nbody_sharded(args, cfg):
    """Multi-device n-body over the chosen spatial decomposition — the
    analog of the reference's ``mpirun -n 2`` launch (``makefile:3-4``).
    Initializes jax.distributed when launched under a multi-host
    coordinator (PSTPU_* envs, see parallel/mesh.py)."""
    import jax.numpy as jnp

    from .models import nbody
    from .parallel import mesh as meshmod

    meshmod.maybe_init_distributed()
    d = args.devices
    if args.decomp == "slab":
        from .parallel.nbody_sharded import (SlabSpec, distribute,
                                             make_sharded_step)
        spec = SlabSpec(n_devices=d, impl=args.impl)
        mesh = meshmod.mesh_1d(d)
        step_fn, shard_state = make_sharded_step(cfg, spec, mesh)
    elif args.decomp == "pencil":
        from .parallel.nbody_pencil import (PencilSpec, distribute,
                                            make_pencil_step)
        d3 = args.d3 or max(2, d // 2)
        spec = PencilSpec(d3=d3, d1=d // d3, impl=args.impl)
        mesh = meshmod.mesh_2d(spec.d3, spec.d1)
        step_fn, shard_state = make_pencil_step(cfg, spec, mesh)
    else:
        from .parallel.nbody_brick import (BrickSpec, distribute,
                                           make_brick_step)
        d3 = args.d3 or 2
        rest = d // d3
        d1 = max(2, rest // 2) if rest > 1 else 1
        spec = BrickSpec(d3=d3, d1=d1, d2=rest // d1, impl=args.impl)
        mesh = meshmod.mesh_3d(spec.d3, spec.d1, spec.d2)
        step_fn, shard_state = make_brick_step(cfg, spec, mesh)

    init, dropped = distribute(nbody.init_fill(cfg), cfg, spec)
    if dropped:
        print(f"warning: {dropped} particles dropped at distribution")
    state = shard_state(init)
    for frame in range(args.iterations):
        state, stats = step_fn(state, jnp.int32(frame))
        print(f"iter {frame + 1}: alive={int(stats['n_alive'])} "
              f"spawned={int(stats['n_spawned'])} "
              f"halo_drop={int(stats['halo_dropped'])} "
              f"mig_drop={int(stats['migration_dropped'])} "
              f"max_cell={int(stats['max_cell_occupancy'])}")


def _cmd_demo(args):
    from .api import ParticleSystem

    ps = (ParticleSystem(capacity=args.capacity, dt=1 / 60,
                         gravity=(0, -9.8, 0), drag=0.2, wind=(2.0, 0, 0),
                         alloc=args.alloc, layout=args.layout)
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
    p.add_argument("--devices", type=int, default=1,
                   help="shard over N devices (the mpirun -n analog)")
    p.add_argument("--decomp", choices=("slab", "pencil", "brick"),
                   default="slab", help="spatial decomposition for --devices>1")
    p.add_argument("--d3", type=int, default=0,
                   help="devices along i3 for pencil/brick (0 = auto)")
    p.add_argument("--impl", choices=("blocks", "dense"), default="blocks",
                   help="per-device neighbor pass")
    p.set_defaults(fn=_cmd_nbody)

    p = sub.add_parser("demo", help="run an emitter demo scene")
    p.add_argument("--capacity", type=int, default=1 << 20)
    p.add_argument("--frames", type=int, default=600)
    p.add_argument("--alloc", choices=("exact", "ring", "strided", "select"),
                   default="ring",
                   help="slot recycling policy (select: fused broadcast-"
                        "select spawn over 2-D state, the fastest path)")
    p.add_argument("--layout", choices=("packed8", "slim"),
                   default="packed8",
                   help="state layout (slim: derived liveness, 13 vs 15 "
                        "HBM words/particle-frame)")
    p.set_defaults(fn=_cmd_demo)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=_cmd_bench)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

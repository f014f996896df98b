"""Worker process for the 2-process multi-host smoke test
(``tests/test_multihost.py``).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
(via ``mesh.maybe_init_distributed``, driven by the PSTPU_* env the way the
reference is driven by the mpirun hostfile, ``/root/reference/makefile:3-4``)
joins them into one 8-device global mesh.  Runs a few slab-sharded n-body
steps over the GLOBAL mesh — collectives cross the process boundary — and
prints one JSON stats line for the parent to compare against the
single-device run.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from particlesystem_tpu.parallel.mesh import maybe_init_distributed  # noqa: E402

assert maybe_init_distributed(), "PSTPU_* env not set"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from particlesystem_tpu import GridSpec, NBodyConfig  # noqa: E402
from particlesystem_tpu.models import nbody  # noqa: E402
from particlesystem_tpu.parallel.mesh import mesh_1d  # noqa: E402
from particlesystem_tpu.parallel.nbody_sharded import (  # noqa: E402
    SlabSpec, distribute, make_sharded_step)

CFG = NBodyConfig(
    n_fill=2000, capacity=8192,
    grid=GridSpec(grid_dim=16, cell_size=5.0, chunk_factor=4),
    particle_life=3.0, seed=11,
)

spec = SlabSpec(n_devices=8)
mesh = mesh_1d(8)
step_fn, shard_state = make_sharded_step(CFG, spec, mesh)

# every process computes the same global initial state, device_put places
# only the addressable shards
init, dropped = distribute(nbody.init_fill(CFG), CFG, spec)
assert dropped == 0
ms = shard_state(init)

out = []
for frame in range(3):
    ms, stats = step_fn(ms, jnp.int32(frame))
    out.append({k: int(np.asarray(v)) for k, v in stats.items()})

print("STATS " + json.dumps(out), flush=True)

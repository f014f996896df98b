"""Device mesh helpers + multi-host initialization.

The reference's launcher is ``mpirun -n 2 --hostfile mpi-hosts``
(``/root/reference/makefile:3-4``); the TPU-native equivalent is
``jax.distributed.initialize`` (once per host) and a ``jax.sharding.Mesh``
over the global device list.  Single-host/single-chip runs need neither —
these helpers degrade gracefully.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when launched under a multi-host
    coordinator (env-driven, mirrors the mpirun hostfile role).  Returns
    True when running multi-host."""
    coord = os.environ.get("PSTPU_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["PSTPU_NUM_PROCESSES"]),
        process_id=int(os.environ["PSTPU_PROCESS_ID"]),
    )
    return True


def mesh_1d(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    """1D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def mesh_2d(d3: int, d1: int, axes=("x", "y")) -> Mesh:
    """2D ``(d3, d1)`` mesh for the pencil decomposition
    (``parallel/nbody_pencil.py``).  Axis "x" shards grid planes (i3),
    "y" shards rows (i1); on a real pod slice lay "x" along the longer
    ICI ring (it carries the cyclic migration traffic)."""
    devs = jax.devices()
    if len(devs) < d3 * d1:
        raise ValueError(f"need {d3 * d1} devices, have {len(devs)}")
    return Mesh(np.array(devs[: d3 * d1]).reshape(d3, d1), axes)


def mesh_3d(d3: int, d1: int, d2: int, axes=("x", "y", "z")) -> Mesh:
    """3D ``(d3, d1, d2)`` mesh for the brick decomposition
    (``parallel/nbody_brick.py``) — the full analog of the reference's
    4x4x4 chunk ownership (``app_common.cu:150-232``)."""
    devs = jax.devices()
    n = d3 * d1 * d2
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(d3, d1, d2), axes)

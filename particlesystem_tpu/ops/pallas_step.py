"""Pallas variant of the fused emitter-scene physics kernel.

Kept alongside the production XLA path (``ops/fused_step.py``) as the
measured comparison point and as the scaffold for kernels XLA cannot express.
On a v5e chip at 10M particles this kernel streams at ~260-290 GB/s while
XLA's own fusion of the identical math reaches ~860 GB/s — elementwise
streaming is a case where hand-scheduling loses to the compiler, so the
engine defaults to the XLA path (``PackedEngine(kernel="xla")``).

Layout notes from the sweep (see git history for the experiments):

* one (8, N) packed array: row-strided DMA, ~130 GB/s — worst;
* (NB, 8, LANE) interleaved blocks, single stream: ~210 GB/s;
* eight separate (N,) field arrays (this file + fused_step.py): Pallas
  ~260-290 GB/s with (8, 4096) blocks, XLA ~860 GB/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import EmitterSceneConfig
from .fused_step import Fields, physics_step

ROWS = 8
LANES = 4096
BLOCK = ROWS * LANES


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(cfg: EmitterSceneConfig, *refs):
    ins, outs = refs[:8], refs[8:]
    out = physics_step(tuple(r[:] for r in ins), cfg)
    for o, v in zip(outs, out):
        o[:] = v


def physics_step_pallas(fields: Fields, cfg: EmitterSceneConfig) -> Fields:
    """Same semantics as ``fused_step.physics_step``, as a Pallas kernel."""
    n = fields[0].shape[0]
    assert n % BLOCK == 0, f"slot count {n} not a multiple of {BLOCK}"
    nb = n // BLOCK
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    f2 = tuple(f.reshape(nb * ROWS, LANES) for f in fields)
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg),
        out_shape=tuple(jax.ShapeDtypeStruct((nb * ROWS, LANES), jnp.float32)
                        for _ in range(8)),
        grid=(nb,),
        in_specs=[spec] * 8,
        out_specs=tuple([spec] * 8),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(flops=40 * n,
                                      bytes_accessed=2 * 8 * n * 4,
                                      transcendentals=0),
    )(*f2)
    return tuple(o.reshape(n) for o in outs)

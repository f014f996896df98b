"""Minimal repro of the jax-0.9 dispatch-cache bug that
``api.NBodySimulation._step_once`` works around.

Symptom: ``ValueError: INVALID_ARGUMENT: Execution supplied 11 buffers but
compiled program expected 12 buffers`` on the SECOND call of a jitted step,
after a differently-signatured jit wrapping the same inner computation ran
earlier in the process.

What we pinned down (2026-08, jax 0.9.0, CPU backend with
``--xla_force_host_platform_device_count=8``; also observed through the TPU
relay):

* No numpy/checkpoint involvement is needed (the round-1 theory that
  ``np.asarray`` on state leaves was the trigger is WRONG — this file is
  pure jax).
* Trigger: jit A ``(state, frame)`` wrapping the blocks n-body step runs
  >=1 time; then jit B ``(state, uvec, fert, frame)`` wrapping the same
  step runs — B's FIRST call succeeds, B's SECOND call fails with the
  buffer-count mismatch.  Fresh ``jax.jit`` objects are affected equally,
  so it is process-global cache state, not per-instance.
* The AOT path exposes the corruption directly:
  ``B.lower(...).compile().in_avals`` comes back with the avals
  MISASSOCIATED across the arg tree — ``state.pos`` is assigned frame's
  ``int32[]`` aval while the trailing args shift by one.  The executable is
  compiled for 13 inputs from 12 arguments.
* ``jaxpr.effects`` is empty and no output buffers alias, ruling out
  effect-token threading and XLA output aliasing.
* The dense (pure-XLA) step never triggers it; only traces containing the
  Pallas cluster-pair kernel (interpret mode on CPU, compiled on TPU) do.

Mitigation (``api.py``, ``tests/test_nbody_parity.py``): every consumer
steps through the ONE module-level ``nbody.step`` jit so a second signature
never exists in the process; a catch-"buffers"/clear_caches/retry remains as
last-line recovery.  Run this file to confirm the bug still exists; if it
prints OK on a newer jax, delete both.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from particlesystem_tpu.core.config import GridSpec, NBodyConfig  # noqa: E402
from particlesystem_tpu.models import nbody  # noqa: E402


def main():
    cfg = NBodyConfig(n_fill=400, capacity=1024,
                      grid=GridSpec(grid_dim=8, chunk_factor=2),
                      particle_life=2.0, seed=5)
    dev = nbody.init_fill(cfg)
    step_a = jax.jit(lambda st, f: nbody.step_fields(
        st, *nbody.frame_fields(cfg, f, st.tag), f, cfg, 0, "blocks"))
    dev, _ = step_a(dev, jnp.int32(0))
    dev, _ = step_a(dev, jnp.int32(1))

    step_b = jax.jit(lambda st, u, ft, f: nbody.step_fields(
        st, u, ft, f, cfg, 0, "blocks"))
    for f in range(2, 5):
        uvec, fert = nbody.frame_fields(cfg, jnp.int32(f), dev.tag)
        dev, _ = step_b(dev, uvec, fert, jnp.int32(f))  # 2nd call raises
    print("OK — bug not reproduced; the api.py workaround can be removed")


if __name__ == "__main__":
    main()

"""particlesystem_tpu — a TPU-native particle-simulation framework.

Built from scratch with JAX/XLA/Pallas to provide the capabilities of the
reference CUDA/MPI particle system (abraj/particleSystem on the Unicorn/pmlib
runtime) with a TPU-first design.  See SURVEY.md for the blueprint and
BASELINE.md for the performance targets.
"""

from .core import (Emitter, EmitterSceneConfig, GridSpec, NBodyConfig,
                   ParticleState, PlaneCollider, SphereCollider, zero_state)

__version__ = "0.1.0"

__all__ = [
    "Emitter", "EmitterSceneConfig", "GridSpec", "NBodyConfig",
    "ParticleState", "PlaneCollider", "SphereCollider", "zero_state",
    "__version__",
]

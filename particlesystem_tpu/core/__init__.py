from .config import (Emitter, EmitterSceneConfig, GridSpec, NBodyConfig,
                     PlaneCollider, SphereCollider)
from .state import ParticleState, pack_state, unpack_state, zero_state

__all__ = [
    "Emitter", "EmitterSceneConfig", "GridSpec", "NBodyConfig",
    "PlaneCollider", "SphereCollider",
    "ParticleState", "pack_state", "unpack_state", "zero_state",
]

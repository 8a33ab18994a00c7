"""nudge_tpu — a TPU-native rigid-body physics engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of rasmusbarr/nudge
(see SURVEY.md): boxes + spheres, broadphase -> SAT/clip narrowphase with
persistent feature-tagged contacts -> warm-started sequential-impulse solver
-> symplectic integration, all inside one jitted step over fixed-capacity SoA
pytrees, vmappable over scene batches and shardable over device meshes.
"""

from .config import SimConfig
from .state import (
    Bodies, Boxes, ContactCache, SimState, SleepState, Spheres, empty_state,
)
from .scenes import SceneBuilder

__version__ = "0.1.0"
__all__ = [
    "SimConfig", "SimState", "Bodies", "Boxes", "Spheres", "ContactCache",
    "SleepState", "empty_state", "SceneBuilder",
]

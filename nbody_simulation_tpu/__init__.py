"""nbody_simulation_tpu — a TPU-native gravitational N-body engine.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
KristinnVikarJ/nbody-simulation (a Rust Barnes-Hut simulator; see SURVEY.md):

- structure-of-arrays particle state on device (``state.ParticleState``)
- the reference's exact softened force law as a vectorized primitive
  (``ops.force``), a blocked all-pairs Pallas kernel (``ops.allpairs``),
  and a flat Morton-BVH Barnes-Hut path (``ops.tree`` / ``ops.traversal``)
- semi-implicit Euler integration (``ops.integrate``)
- an on-device framebuffer raster (``ops.raster``)
- multi-chip scaling via ``shard_map`` + ring ``ppermute`` (``parallel``)
- scenario generators, the step-loop ``World`` (``models``)
- a native C++ lossy snapshot queue + engine/telemetry (``runtime``)
- checkpointing, recording, PNG IO (``utils``)
"""

from nbody_simulation_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.state import ParticleState

__version__ = "0.1.0"

__all__ = ["SimConfig", "ParticleState", "__version__"]

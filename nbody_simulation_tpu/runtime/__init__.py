from nbody_simulation_tpu.runtime.queue import SnapshotQueue
from nbody_simulation_tpu.runtime.engine import Engine

__all__ = ["SnapshotQueue", "Engine"]

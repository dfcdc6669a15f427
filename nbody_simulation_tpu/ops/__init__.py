from nbody_simulation_tpu.ops.force import (
    FLT_MIN_NORMAL,
    pair_accel,
    direct_accel,
)
from nbody_simulation_tpu.ops.integrate import euler_step

__all__ = [
    "FLT_MIN_NORMAL",
    "pair_accel",
    "direct_accel",
    "euler_step",
]

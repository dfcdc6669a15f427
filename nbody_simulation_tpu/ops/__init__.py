from nbody_simulation_tpu.ops.force import (
    FLT_MIN_NORMAL,
    pair_accel,
    direct_accel,
    direct_accel_at,
)
from nbody_simulation_tpu.ops.allpairs import allpairs_accel
from nbody_simulation_tpu.ops.allpairs_grad import allpairs_accel_diff
from nbody_simulation_tpu.ops.energy import (allpairs_potential,
                                             bh_total_energy,
                                             kinetic_energy,
                                             potential_energy, total_energy)
from nbody_simulation_tpu.ops.integrate import euler_step, leapfrog_step
from nbody_simulation_tpu.ops.morton import morton_encode, morton_order
from nbody_simulation_tpu.ops.tree import build_tree, summarize_sorted
from nbody_simulation_tpu.ops.traversal import bh_accel, bh_accel_sorted
from nbody_simulation_tpu.ops.raster import render_frame, render_frame_sparse

__all__ = [
    "FLT_MIN_NORMAL",
    "pair_accel",
    "direct_accel",
    "direct_accel_at",
    "allpairs_accel",
    "allpairs_accel_diff",
    "allpairs_potential",
    "bh_total_energy",
    "kinetic_energy",
    "potential_energy",
    "total_energy",
    "euler_step",
    "leapfrog_step",
    "morton_encode",
    "morton_order",
    "build_tree",
    "summarize_sorted",
    "bh_accel",
    "bh_accel_sorted",
    "render_frame",
    "render_frame_sparse",
]

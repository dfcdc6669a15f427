from nbody_simulation_tpu.parallel.mesh import make_1d_mesh, shard_state
from nbody_simulation_tpu.parallel.ring import (ring_allpairs_accel,
                                                ring_allpairs_accel_symring)
from nbody_simulation_tpu.parallel.ring_grad import ring_allpairs_accel_diff
from nbody_simulation_tpu.parallel.sharded_step import (
    make_sharded_step, sharded_diagnostics, sharded_total_energy)
from nbody_simulation_tpu.parallel.bh_sharded import (
    bh_sharded_accel, make_sharded_bh_step)
from nbody_simulation_tpu.parallel.bh_distributed import (
    adjacency_stages, bh_distributed_accel, bh_distributed_total_energy,
    distribute_state, make_distributed_bh_step, rebalance_state,
    resolved_seam_stages)
from nbody_simulation_tpu.parallel.bh_distributed_grad import (
    bh_distributed_accel_diff)
from nbody_simulation_tpu.parallel.raster import (
    sharded_render_frame, simulate_distributed)
from nbody_simulation_tpu.parallel.repartition import (
    collective_rebalance, make_collective_rebalance)

__all__ = ["make_1d_mesh", "shard_state", "ring_allpairs_accel",
           "ring_allpairs_accel_symring",
           "ring_allpairs_accel_diff",
           "make_sharded_step", "sharded_diagnostics",
           "sharded_total_energy",
           "bh_sharded_accel", "make_sharded_bh_step",
           "adjacency_stages", "bh_distributed_accel",
           "bh_distributed_accel_diff",
           "bh_distributed_total_energy", "distribute_state",
           "make_distributed_bh_step", "rebalance_state",
           "resolved_seam_stages",
           "sharded_render_frame", "simulate_distributed",
           "collective_rebalance", "make_collective_rebalance"]

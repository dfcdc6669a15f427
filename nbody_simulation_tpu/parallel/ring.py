"""Ring ppermute all-pairs force exchange — the multi-chip force path.

Each of P shards holds N/P particles. (position, mass) tiles rotate P-1 times
around the ICI ring while every shard accumulates accelerations of its local
targets against the visiting sources with the blocked Pallas kernel — exactly
the ring-attention dataflow, applied to gravity (SURVEY.md §5: the structural
analogue of sequence parallelism for N-body).

Step k=0 interacts the shard with itself (self-pairs masked by the force
law's is_normal guard); communication of step k+1 overlaps the compute of
step k because ppermute is issued before the local kernel and XLA schedules
the collective-permute concurrently with the pallas_call.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_simulation_tpu.ops.allpairs import allpairs_accel
from nbody_simulation_tpu.parallel.mesh import AXIS


def ring_allpairs_accel(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                        axis: str = AXIS, softening2: float = 1e-3,
                        tile_i: int = 512, tile_j: int = 2048,
                        rcp: str = "newton") -> jax.Array:
    """All-pairs acceleration with particles sharded over ``axis``.

    ``pos`` f32[N,2] and ``mass`` f32[N] must be shardable by the mesh
    (N divisible by P; the local N/P must be divisible by the tile sizes
    or smaller than them). Returns f32[N,2] with the same sharding.
    """
    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local(pos_l, mass_l):
        acc = jnp.zeros_like(pos_l)
        vis_pos, vis_mass = pos_l, mass_l
        for k in range(n_dev):
            if k > 0:
                vis_pos = jax.lax.ppermute(vis_pos, axis, perm)
                vis_mass = jax.lax.ppermute(vis_mass, axis, perm)
            acc = acc + allpairs_accel(
                pos_l, mass_l, src_pos=vis_pos, src_mass=vis_mass,
                softening2=softening2, tile_i=tile_i, tile_j=tile_j, rcp=rcp)
        return acc

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes info.
    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis)),
                      out_specs=P(axis, None), check_vma=False)
    return f(pos, mass)

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

from nbody_simulation_tpu.ops.allpairs import allpairs_accel, allpairs_accel_sym
from nbody_simulation_tpu.parallel.mesh import AXIS


def ring_allpairs_accel(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                        axis: str = AXIS, softening2: float = 1e-3,
                        tile_i: int = 512, tile_j: int = 2048,
                        rcp: str = "newton", sym: bool = True,
                        sym_tile: int = 1024) -> jax.Array:
    """All-pairs acceleration with particles sharded over ``axis``.

    ``pos`` f32[N,2] and ``mass`` f32[N] must be shardable by the mesh
    (N divisible by P; the local N/P must be divisible by the tile sizes
    or smaller than them). Returns f32[N,2] with the same sharding.

    ``sym``: run the k=0 SELF-interaction stage with the symmetric
    third-law kernel (each unordered local pair evaluated once — measured
    1.26-1.37× the ordered kernel at 1M-scale tiles, docs/PERFORMANCE.md
    round 4). Visiting stages (k>0) stay on the ordered kernel: their
    j-side accumulator lives on another shard, so symmetry would need the
    partial sums shipped back around the ring (not worth P extra hops for
    a 1/P fraction of the work at small P; revisit if P grows).
    """
    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local(pos_l, mass_l):
        n_l = pos_l.shape[0]
        use_sym = sym and n_l % min(sym_tile, n_l) == 0
        vis_pos, vis_mass = pos_l, mass_l
        if use_sym:
            acc = allpairs_accel_sym(pos_l, mass_l, softening2=softening2,
                                     tile=sym_tile, rcp=rcp)
        else:
            acc = allpairs_accel(
                pos_l, mass_l, softening2=softening2,
                tile_i=tile_i, tile_j=tile_j, rcp=rcp)
        for k in range(1, n_dev):
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

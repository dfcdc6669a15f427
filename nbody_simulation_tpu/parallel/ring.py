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

from nbody_simulation_tpu.ops.allpairs import (allpairs_accel,
                                               allpairs_accel_sym,
                                               allpairs_accel_sym_pair)
from nbody_simulation_tpu.parallel.mesh import AXIS


def symring_profitable(n_dev: int) -> bool:
    """Whether the fully symmetric ring beats the ordered ring at ``n_dev``.

    Measured on the real chip at 1M-shard tile shapes
    (benchmarks/probe_ring_sym.py, docs/PERFORMANCE.md round 5): one
    symmetric cross-shard block costs ~1.57× an ordered block
    (384.6 vs 245.7 ms at rcp=approx+clamp; 1.44× at newton) but covers
    TWO shards' outputs, so the ring total is ⌈(P−1)/2⌉·t_sym vs
    (P−1)·t_ord. Odd P (no half-gated round) wins from P=3
    (2·245.7=491 vs 384.6 ms); even P pays a discarded half block and
    crosses over at P=6 (1228 vs 1154 ms). P=2/4 stay ordered.
    """
    return n_dev >= 3 and (n_dev % 2 == 1 or n_dev >= 6)


def ring_allpairs_accel(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                        axis: str = AXIS, softening2: float = 1e-3,
                        tile_i: int = 512, tile_j: int = 2048,
                        rcp: str = "newton", sym: bool = True,
                        sym_tile: int = 1024,
                        sym_ring: bool | str = "auto") -> jax.Array:
    """All-pairs acceleration with particles sharded over ``axis``.

    ``pos`` f32[N,2] and ``mass`` f32[N] must be shardable by the mesh
    (N divisible by P; the local N/P must be divisible by the tile sizes
    or smaller than them). Returns f32[N,2] with the same sharding.

    ``sym``: run the k=0 SELF-interaction stage with the symmetric
    third-law kernel (each unordered local pair evaluated once — measured
    1.26-1.37× the ordered kernel at 1M-scale tiles, docs/PERFORMANCE.md
    round 4).

    ``sym_ring``: symmetrize the k>0 VISITING stages too, via the
    partial-accel ring circuit of ``ring_allpairs_accel_symring``.
    ``"auto"`` (default) dispatches by the measured crossover
    (``symring_profitable``: odd P≥3, even P≥6 — 1.12×/1.20× per-step at
    P=8/16, docs/PERFORMANCE.md round 5); ``True``/``False`` force it.
    Same physics either way, fp32 summation order differs.
    """
    n_dev = mesh.shape[axis]
    use_symring = (symring_profitable(n_dev) if sym_ring == "auto"
                   else bool(sym_ring))
    n_l = pos.shape[0] // n_dev
    use_symring = use_symring and n_l % min(sym_tile, n_l) == 0
    if use_symring and sym and n_dev > 1:
        return ring_allpairs_accel_symring(
            pos, mass, mesh, axis=axis, softening2=softening2, rcp=rcp,
            sym_tile=sym_tile)
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


def ring_allpairs_accel_symring(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                                axis: str = AXIS, softening2: float = 1e-3,
                                rcp: str = "newton",
                                sym_tile: int = 1024) -> jax.Array:
    """Fully symmetric ring: Newton's third law ACROSS shards.

    ``ring_allpairs_accel`` symmetrizes only the k=0 self stage; at the
    flagship mesh (P=16) the visiting stages are 15/16 of the pair work.
    This variant forward-ports the cotangent ring-circuit dataflow of
    parallel/ring_grad._bwd to the force pass (round-4 verdict item 5):

    - rounds k=1..⌈(P−1)/2⌉: the rotating (pos, mass, PARTIAL-ACCEL)
      tuple arrives from shard i−k; the symmetric pair kernel
      (ops/allpairs.allpairs_accel_sym_pair) evaluates each unordered
      cross-shard pair ONCE, accumulating the local side in place and the
      visiting side onto the tuple's accel — which rides the ring home;
    - for even P the last round is a HALF round (pairs (i, i+P/2) would
      otherwise be computed twice): shards i ≥ P/2 zero their
      contributions (SPMD runs the kernel everywhere regardless);
    - one closing ppermute of distance K returns every partial to its
      owner (the same "accumulator completes the circuit" step as
      ring_grad._bwd:88-90).

    Pair-block count per shard: ⌈(P−1)/2⌉ symmetric blocks vs P−1 ordered
    blocks — each block shared between two shards' outputs. Same result
    as ``ring_allpairs_accel`` up to fp32 summation order.
    """
    n_dev = mesh.shape[axis]
    if n_dev == 1:
        return ring_allpairs_accel(pos, mass, mesh, axis=axis,
                                   softening2=softening2, rcp=rcp,
                                   sym_tile=sym_tile)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    K = n_dev // 2 if n_dev % 2 == 0 else (n_dev - 1) // 2
    half_last = n_dev % 2 == 0
    home = [(i, (i - K) % n_dev) for i in range(n_dev)]

    def local(pos_l, mass_l):
        acc = allpairs_accel_sym(pos_l, mass_l, softening2=softening2,
                                 tile=sym_tile, rcp=rcp)
        vis_pos, vis_mass = pos_l, mass_l
        vis_acc = pos_l * jnp.float32(0.0)
        my = jax.lax.axis_index(axis)
        for k in range(1, K + 1):
            vis_pos = jax.lax.ppermute(vis_pos, axis, perm)
            vis_mass = jax.lax.ppermute(vis_mass, axis, perm)
            vis_acc = jax.lax.ppermute(vis_acc, axis, perm)
            ai, aj = allpairs_accel_sym_pair(
                pos_l, mass_l, vis_pos, vis_mass,
                softening2=softening2, tile=sym_tile, rcp=rcp)
            if half_last and k == K:
                gate = jnp.where(my < jnp.int32(K), jnp.float32(1.0),
                                 jnp.float32(0.0))
                ai = ai * gate
                aj = aj * gate
            acc = acc + ai
            vis_acc = vis_acc + aj
        vis_acc = jax.lax.ppermute(vis_acc, axis, home)
        return acc + vis_acc

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis)),
                      out_specs=P(axis, None), check_vma=False)
    return f(pos, mass)

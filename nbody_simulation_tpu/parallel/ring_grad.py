"""Differentiable ring all-pairs force: custom VJP over shard_map/ppermute.

Extends ops/allpairs_grad.py's kernel-level VJP to the sharded force path —
``jax.grad`` through a MULTI-CHIP force evaluation, so gradient workflows
(trajectory optimization, initial-condition fitting) run at the N where the
distributed engine is interesting. The reference has no gradients at all;
SURVEY §2's DP row names the ring exchange this differentiates.

Dataflow (flash-attention-backward-over-a-ring):

- forward: source tiles (pos_j, mass_j) rotate P−1 times; each shard
  accumulates its local targets' acceleration (parallel/ring.py).
- backward: two reductions per visited pair block (ops/allpairs_grad.py):
  p̄_i (over sources — accumulates LOCALLY, like the forward) and
  p̄_j/m̄_j (over targets — the targets that saw tile j live on every
  shard, so the j-cotangent accumulators ROTATE WITH THE TILE: the tuple
  (pos_j, mass_j, p̄_j, m̄_j) makes a full P-hop ring circuit, each shard
  adding its local targets' contribution, arriving home complete after
  the P-th hop).

Per-device cost: P pair-block sweeps of O((N/P)²) each for both
reductions — the same O(N²/P) as the forward, ~2.5× its constant (two
backward kernels with ~6 live temporaries vs one forward with ~3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_simulation_tpu.ops.allpairs_grad import bwd_sweeps
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.parallel.ring import ring_allpairs_accel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def ring_allpairs_accel_diff(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                             axis: str = AXIS, softening2: float = 1e-3,
                             tile_i: int = 512,
                             tile_j: int = 2048,
                             rcp: str = "newton", sym: bool = True,
                             sym_tile: int = 1024) -> jax.Array:
    """Differentiable sharded all-pairs acceleration.

    ``pos`` f32[N,2] / ``mass`` f32[N] sharded over ``axis`` (N divisible
    by P; local N/P compatible with the tile sizes). Returns f32[N,2] with
    the same sharding. The primal IS ``ring_allpairs_accel`` with the same
    ``rcp``/``sym`` knobs (and the same defaults), so grad-mode forward
    values are bitwise equal to run-mode forward values under the
    configured mode — a user who configured approx+clamp gets the same
    trajectory whether or not a grad is being taken
    (tests/test_allpairs_grad.py asserts it). The backward evaluates the
    closed-form J^T·ḡ with its own Newton-refined reciprocal regardless of
    ``rcp`` (the mode selects forward arithmetic, not the differentiated
    function).
    """
    return ring_allpairs_accel(pos, mass, mesh, axis=axis,
                               softening2=softening2, tile_i=tile_i,
                               tile_j=tile_j, rcp=rcp, sym=sym,
                               sym_tile=sym_tile)


def _fwd(pos, mass, mesh, axis, softening2, tile_i, tile_j, rcp, sym,
         sym_tile):
    out = ring_allpairs_accel_diff(pos, mass, mesh, axis, softening2,
                                   tile_i, tile_j, rcp, sym, sym_tile)
    return out, (pos, mass)


def _bwd(mesh, axis, softening2, tile_i, tile_j, rcp, sym, sym_tile, res, g):
    pos, mass = res
    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local(pos_l, mass_l, g_l):
        pb_i = jnp.zeros_like(pos_l)
        vis_pos, vis_mass = pos_l, mass_l
        vis_pb = jnp.zeros_like(pos_l)
        vis_mb = jnp.zeros_like(mass_l)
        for k in range(n_dev):
            if k > 0:
                vis_pos = jax.lax.ppermute(vis_pos, axis, perm)
                vis_mass = jax.lax.ppermute(vis_mass, axis, perm)
                vis_pb = jax.lax.ppermute(vis_pb, axis, perm)
                vis_mb = jax.lax.ppermute(vis_mb, axis, perm)
            d_pi, d_pj, d_mj = bwd_sweeps(pos_l, g_l, vis_pos, vis_mass,
                                          softening2, tile_i, tile_j)
            pb_i = pb_i + d_pi
            vis_pb = vis_pb + d_pj
            vis_mb = vis_mb + d_mj
        # After P−1 rotations the accumulator for shard d's tile sits on
        # shard d−1; the closing hop completes the circuit and brings every
        # shard its own tile's source cotangents.
        vis_pb = jax.lax.ppermute(vis_pb, axis, perm)
        vis_mb = jax.lax.ppermute(vis_mb, axis, perm)
        return pb_i + vis_pb, vis_mb

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis), P(axis, None)),
                      out_specs=(P(axis, None), P(axis)), check_vma=False)
    return f(pos, mass, g)


ring_allpairs_accel_diff.defvjp(_fwd, _bwd)

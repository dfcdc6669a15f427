"""Differentiable DISTRIBUTED Barnes-Hut — jax.grad through the flagship path.

Round-4 closed the gap for the ring all-pairs force (parallel/ring_grad.py);
this module closes it for the path the engine actually runs at scale:
``bh_distributed_accel``'s staged pipeline — local subtree walk, the two
Morton-neighbor near stages (including the compute-to-data seam-row
exchange), adjacency seam matchings, and the gathered coarse forest.

No new VJP is needed at the distributed level. Every stage is built from
pieces JAX already knows how to differentiate:

- the tree summaries are reshape-reductions (ops/tree.py) — gradients flow
  from accepted node COMs/quadrupoles back to positions, exactly as in the
  single-chip ``ops.traversal_grad.bh_accel_diff``;
- the planner's decisions are integer/boolean (constants under AD, like
  attention masks); its gathers/take_along_axis are linear;
- the collectives are linear: ``ppermute`` transposes to the inverse
  permutation, ``all_gather`` (the forest) to ``psum_scatter`` — the ring
  circuit of ring_grad._bwd emerges automatically from transposing the
  forward's ppermutes;
- only the Pallas force sweep needs a custom VJP, and
  ``ops.traversal_grad.grouped_force_diff`` already provides it.

So the entry below simply re-runs ``bh_distributed_accel`` with the
differentiable sweep substituted (its ``force`` hook) and multipole pinned
to 1 — the quadrupole correction has no hand-written VJP (its backward
would need third derivatives of the reference kernel), matching the
single-chip ``bh_accel_diff``'s monopole-only contract. ``rcp`` is taken
from the config (grad-mode forward == run-mode forward at multipole=1;
see ops/allpairs_grad.py on why the backward keeps its own reciprocal).

Reference anchor: the traversal being differentiated is
/root/reference/src/main.rs:348-386 over the rayon DP row of SURVEY §2
(src/main.rs:406-416); the reference has no gradients at all.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.ops.traversal_grad import grouped_force_diff
from nbody_simulation_tpu.parallel.bh_distributed import bh_distributed_accel
from nbody_simulation_tpu.parallel.mesh import AXIS


def _force_diff(tgt_pos, src_x, src_y, src_m, softening2=1e-3,
                rcp="newton", interpret=False, tile_j=4096, src_q=None):
    """_grouped_force-signature adapter over the differentiable sweep.
    ``interpret``/``tile_j`` are resolved inside grouped_force_diff;
    ``src_q`` must be None (multipole=1 is pinned by the diff entry)."""
    assert src_q is None, "quadrupole sweep has no VJP (multipole=1 only)"
    return grouped_force_diff(tgt_pos, src_x, src_y, src_m, softening2, rcp)


def bh_distributed_accel_diff(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                              axis: str = AXIS,
                              config: SimConfig | None = None,
                              extra_pairs=()) -> jax.Array:
    """Differentiable distributed-BH acceleration (sharded in, sharded out).

    Same staging, sharding contract, and arguments as
    ``bh_distributed_accel`` (thread ``adjacency_stages`` results through
    ``extra_pairs`` exactly as the run path does); differentiable w.r.t.
    ``pos`` and ``mass``. Forward values are bitwise equal to the run path
    at ``multipole=1`` (the diff mode pins it — at physics-quality θ the
    run path auto-upgrades to quadrupole, a finer approximation whose
    correction term is not differentiated; pass
    ``config.replace(multipole=1)`` to run-mode calls that must match
    grad-mode trajectories exactly). Mass gradients flow through leaf
    tiles only — node masses are exact int32 sums, non-differentiable by
    construction (same contract as ops.traversal_grad.bh_accel_diff).
    """
    cfg = (config or SimConfig(force_path="bh")).replace(multipole=1)
    return bh_distributed_accel(pos, mass, mesh, axis=axis, config=cfg,
                                extra_pairs=extra_pairs, force=_force_diff)

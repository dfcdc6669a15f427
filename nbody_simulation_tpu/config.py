"""Simulation configuration.

The reference tunes everything through compile-time consts
(reference src/main.rs:31-35, src/bvh_tree.rs:37); this dataclass exposes the
same knobs at runtime with the reference values as defaults:

- ``world_size``    = HEIGHT = 100_000            (src/main.rs:31)
- ``render_size``   = RENDER_HEIGHT = 1250        (src/main.rs:32)
- ``dt``            = STEP_SIZE = 0.1             (src/main.rs:34)
- ``theta``         = THETA = 50.0                (src/main.rs:35) — the
  reference's *inverted* convention: a node's COM is accepted whenever
  max(w,h)^2 < d^2·θ^2, so larger θ = MORE approximation
- ``leaf_size``     = TARGET_POINTS = 64          (src/bvh_tree.rs:37)
- ``softening2``    = 1e-3 squared-distance clamp (src/main.rs:247-249)
"""

from __future__ import annotations

import dataclasses
from typing import Literal

ForcePath = Literal["direct", "pallas", "bh", "ring"]

# Canonical reciprocal/guard modes for the force kernels — the single
# source of truth for kernel validation (ops/allpairs.py, ops/traversal.py)
# and both CLI parsers (run.py, run_multihost.py). Lives here because this
# module is jax-free: run_multihost must build its parser before
# jax.distributed.initialize. "+clamp" swaps the reference's 4-op
# is_normal NaN-freeze guard (src/main.rs:240-243) for a 1-op L1 clamp —
# bitwise-identical on finite states. There is deliberately no
# "exact+clamp": the exact-IEEE path keeps the reference guard.
RCP_MODES = ("exact", "newton", "approx", "newton+clamp", "approx+clamp")


@dataclasses.dataclass(frozen=True)
class SimConfig:
    # World / render geometry (src/main.rs:31-32).
    world_size: float = 100_000.0
    render_size: int = 1250

    # Integration (src/main.rs:34). "euler" is the reference's semi-implicit
    # Euler; "leapfrog" (kick-drift-kick, two force evals/step) is an
    # optional higher-order scheme the reference lacks.
    dt: float = 0.1
    integrator: str = "euler"

    # Barnes-Hut quality knob (src/main.rs:35). Acceptance test is
    # max(w,h)^2 < d2 * theta^2 — reference convention (s/d < θ accepts).
    theta: float = 50.0

    # BVH leaf size (src/bvh_tree.rs:37).
    leaf_size: int = 64

    # Squared-distance softening clamp (src/main.rs:247-249).
    softening2: float = 1e-3

    # Which force path World.step uses.
    force_path: ForcePath = "pallas"

    # BH path: re-sort the particles in Morton order every k-th step. Between
    # resorts the tree summaries (AABB/mass/COM) are STILL rebuilt from
    # current positions every step, so force quality is unchanged — a stale
    # order only loosens AABBs (the conservative traversal then opens a bit
    # more). 16 measured fastest net at a 1M shard (15.4 vs 16.25 ms
    # composite at 8 — the dt=0.1 drift per 16 steps barely moves the
    # AABBs); set 1 to mimic the reference's full per-step rebuild exactly.
    resort_every: int = 16

    # Reference quirk (src/bvh_tree.rs:98-116): a leaf's center of gravity is
    # the UNWEIGHTED mean of its particle positions, while internal-node COMs
    # are mass-weighted. True reproduces the reference; False uses the
    # physically-correct mass-weighted COM everywhere.
    unweighted_leaf_com: bool = True

    # Pallas all-pairs tile sizes (i = sublane/rows, j = lane/cols) and
    # reciprocal mode ("exact" | "newton" | "approx", each optionally with
    # a "+clamp" suffix replacing the is_normal mask by a 1-op L1 clamp —
    # bitwise-identical on finite world-scale states, see
    # ops/allpairs.mono_tile); (512, 2048, newton) measured
    # fastest-accurate on v5e. rcp=None resolves per path: "newton"
    # for the exact force paths (≤6e-6 relative deviation), and for BH by θ:
    # "approx" in the reference's θ≥2 regime (the walk's own approximation
    # error is orders of magnitude above the ≤6e-4 reciprocal noise; saves
    # ~14% sweep flops), "newton" at physics-quality θ<2 where 6e-4 would
    # dominate the ~2.7e-4 quadrupole-walk error.
    tile_i: int = 512
    tile_j: int = 2048
    rcp: str | None = None

    # Symmetric third-law all-pairs kernel (ops/allpairs.allpairs_accel_sym)
    # for SELF-interaction sweeps: each unordered pair is evaluated once and
    # applied to both particles, sharing the reciprocal pipeline between the
    # directions (the leaf exact-loop economics of src/main.rs:355-362,
    # system-wide). Measured at N=1M on v5e (docs/PERFORMANCE.md round 4):
    # 3.36e11 vs 2.46e11 pairs/s at rcp=newton (1.37×), 3.55e11 vs 2.83e11
    # at approx+clamp. (sym_tile, sym_strips) = (1024, 4) measured fastest;
    # 512-tiles lose (1.78e11 — too little work per revisit), 2048 trips
    # the 16 MB scoped-VMEM limit. Source-≠-target sweeps (ring visiting
    # stages) always use the ordered kernel: symmetry needs both sides local.
    sym_allpairs: bool = True
    sym_tile: int = 1024
    sym_strips: int = 4

    def resolved_rcp(self, bh: bool = False) -> str:
        if self.rcp is not None:
            return self.rcp
        if bh:
            return "approx" if self.theta >= 2.0 else "newton"
        return "newton"

    # Barnes-Hut traversal capacities: frontier slots per level and leaf-list
    # slots per group. Overflow falls back to COM approximation (never drops
    # force). θ=50 needs little; θ≈0.5 wants leaf_cap ≳ the near-field leaf
    # count (raise these for high-quality runs).
    # None = resolved from θ: (16, 8) for the reference's aggressive θ≥2
    # regime (measured quality-equal to (128, 64) at θ=50 on the galaxy and
    # ~3x faster), (256, 256·…) for physics-quality θ<2 where the near
    # field spans many more nodes. Overflow falls back to COM on the
    # FARTHEST opened nodes (closest-first compaction, ops/traversal.py),
    # so under-capping degrades smoothly — measured at N=65k Plummer θ=0.5
    # quadrupole: 2.0e-4 median at F=512, 7.5e-4 at 128, 1.2e-2 at 32.
    frontier_cap: int | None = None
    leaf_cap: int | None = None

    def resolved_caps(self) -> tuple[int, int]:
        # Leaf lists are per planning row, so the cap scales with the
        # super-group size (each row's near field covers its own
        # plan_leaves leaves plus a neighborhood ring).
        pl = max(1, self.plan_leaves)
        f = self.frontier_cap if self.frontier_cap is not None else (
            16 if self.theta >= 2.0 else 256)
        l = self.leaf_cap if self.leaf_cap is not None else (
            max(8, 4 * pl) if self.theta >= 2.0 else max(256, 32 * pl))
        return f, l

    # Morton key depth in bits per axis. None resolves from θ: 15 (one int32
    # key, one sort — cell ≈ 3 world units) for the reference's aggressive
    # θ≥2 regime, 24 (two key words, LSD radix 2-sort — cell ≈ 0.006 units)
    # for physics-quality θ<2, where dense cluster cores must keep
    # subdividing spatially or every core leaf overlaps and the walk falls
    # back to COM there (the round-1 source of >1e-3 Plummer force error).
    morton_bits: int | None = None

    def resolved_morton_bits(self) -> int:
        if self.morton_bits is not None:
            return self.morton_bits
        return 15 if self.theta >= 2.0 else 24

    # Multipole order of accepted-node forces: 1 = COM monopole (the
    # reference's approximation, src/main.rs:374-379), 2 = + quadrupole
    # correction from the node's second moments (≈10-100× lower acceptance
    # error for ~2× sweep flops — the route to <1e-3 force error at θ=0.5,
    # where monopole acceptance error is inherently ~1.6e-3). None resolves
    # from θ: monopole in the reference's θ≥2 regime, quadrupole below.
    # NOTE on the unweighted-leaf-COM quirk: the expansion about the
    # stored COM is valid term-by-term regardless of the COM convention,
    # but with the quirk ON an unequal-mass leaf carries a nonzero FIRST
    # moment (dipole) that no term here corrects — the quadrupole then
    # only buys its tightened acceptance, and total error stays
    # quirk-dominated (measured heavy-galaxy θ=0.5: ours 1.3e-3 vs the
    # reference walk's 1.2e-2). The <1e-3 north-star numbers are measured
    # with unweighted_leaf_com=False (benchmarks/suite.py config 2).
    multipole: int | None = None

    def resolved_multipole(self) -> int:
        if self.multipole is not None:
            return self.multipole
        return 1 if self.theta >= 2.0 else 2

    # Traversal fan-out: 2 walks the binary BVH level by level; 4 walks two
    # levels at once (the 4-ary subdivision of the reference's dead QuadTree,
    # quad_tree.rs / SURVEY §2.7) — same candidate work, half the planning
    # iterations, equal-or-finer approximation.
    tree_arity: int = 2

    # Planning granularity: one planner row covers this many adjacent leaves
    # (its AABB = their common ancestor). Bigger = cheaper planning but a
    # wider shared near field (leaf_cap scales with pl, so sweep width
    # grows); the tree/COM semantics are unchanged. With the batched sweep
    # kernel, 4 measured fastest at N=1M θ=50 (10.1-11.2 ms vs 16.8 at 8 —
    # the halved leaf list cuts sweep pairs 1.8×) while still beating the
    # reference walk's error on the galaxy slice (median 0.149 vs 0.161,
    # p90 0.348 vs 0.979; tests/test_ref_walk.py gates this).
    plan_leaves: int = 4

    # Occupancy-bucketed force sweep (ops/traversal._grouped_force_bucketed):
    # (block_frac, col_frac) — sort 128-group blocks by max last-nonzero
    # source column and sweep the sparse tail blocks with a col_frac-narrow
    # static tile (two pallas_calls; lax.cond falls back to the full sweep
    # whenever the data exceeds the static budgets, so quality is
    # unaffected). Pays on occupancy-skewed scenes (galaxy: 46% of columns
    # past the per-row last nonzero — (0.625, 0.125) measured 1.15×,
    # 408.8 → 469.0 ups, docs/PERFORMANCE.md round 5); the uniform disc
    # triggers the fallback every step (0.972× guard overhead). None = off
    # (the single full-width sweep) — the right default for dense scenes.
    sweep_buckets: tuple | None = None

    # Distributed-BH (parallel/bh_distributed.py) capacities for visiting
    # subtrees that are ring-FAR (neither the local stage nor a ring
    # neighbor): those are almost always accepted near their root, so small
    # caps save sweep width; overflow degrades to node-COM, never drops
    # force. None = use the full resolved caps (exactness-matching mode).
    far_frontier_cap: int | None = None
    far_leaf_cap: int | None = None

    # How the distributed step covers ring-far subtrees. "ring": every
    # subtree visits every device (P-1 ppermute stages, per-stage plan+sweep
    # — exact-capable but per-stage fixed costs scale with P). "forest": the
    # top ``forest_levels`` levels of every subtree are all_gathered once
    # per step (O(P·2^forest_levels) bytes — KBs) and ONE bounded walk
    # (plan_rows max_levels flush) covers all far subtrees; only the two
    # Morton-neighbor subtrees — plus, at physics quality, every
    # SPATIALLY-adjacent shard pair (Morton seams, scheduled as static
    # ppermute matchings at distribute/rebalance time:
    # parallel/bh_distributed.adjacency_stages) — ride the ring at full
    # caps. Forest is the default at every θ (O(1)-in-P stages); the
    # adjacency threshold guarantees any non-adjacent pair θ-accepts above
    # the gathered cut, so quality matches the exact ring sweep
    # structurally, not just in the median (tests/test_distributed.py).
    far_mode: str | None = None
    forest_levels: int = 6

    def resolved_far_mode(self) -> str:
        if self.far_mode is not None:
            return self.far_mode
        return "forest"

    # Near-stage (ring-neighbor) row refinement for the distributed forest
    # mode: a cheap ``near_refine_levels``-deep bounded walk runs for ALL
    # rows, then only the ``near_rows`` closest rows that still hold open
    # nodes (the Morton-seam rows) continue to full depth; the rest flush
    # to COM (distance-ranked, so only the farthest unresolved rows — where
    # COM is benign — ever degrade). 0 disables (every row walks full
    # depth — 15.9 ms/stage at a 1M shard vs 3.9 refined). None resolves
    # by θ: 1 level in the θ≥2 regime (round-3 sweep at a 1M shard:
    # 4.58/3.89/3.85 ms per stage for 3/2/1 levels with BIT-IDENTICAL
    # forest-vs-ring error at θ=50 — the error is forest-dominated, so the
    # cheapest depth wins), off at physics quality (exactness-parity mode;
    # seam-stage rows refine at plan granularity instead).
    near_refine_levels: int | None = None
    near_rows: int | None = None

    def resolved_near_refine(self) -> int:
        if self.near_refine_levels is not None:
            return self.near_refine_levels
        return 1 if self.theta >= 2.0 else 0

    # Compute-to-data near stages (refined mode only): ship a visiting
    # subtree's levels 0..cut (the bounded walk needs no leaf data) and
    # send the unresolved seam rows' targets BACK to the subtree's owner,
    # which runs the full-depth continuation against its local tree and
    # returns just the row accelerations — bitwise-identical arithmetic
    # (tests/test_distributed.py asserts it), but the per-stage ICI
    # payload drops from the whole subtree block (≈13 MB at a 1M shard)
    # to levels + seam targets + results (≈1 MB). False ships whole
    # subtree blocks (the round-2 protocol).
    near_remote: bool = True

    # Heavy-particle render threshold: weight > 10 draws solid green
    # (src/main.rs:55-59).
    heavy_weight: float = 10.0

    @property
    def pixels_per_world(self) -> int:
        """Integer world-units-per-pixel scale (src/main.rs:51-52 uses
        integer division HEIGHT / RENDER_HEIGHT = 80)."""
        return int(self.world_size) // self.render_size

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = SimConfig()

"""Barnes-Hut traversal: masked BFS planning + one Pallas force sweep.

The reference walks the tree recursively per particle (reference
src/main.rs:348-386): a node's COM is accepted when the particle is outside
the node AABB **and** ``max(w,h)^2 < d2(particle, com) * THETA^2``
(src/main.rs:370-373, the inverted s/d<θ convention with θ=50 default);
otherwise both children are visited, and leaves run the exact per-particle
loop (src/main.rs:355-362).

TPU has no recursion or per-particle control flow, so this re-design splits
the walk into a cheap planning pass and a dense compute pass:

1. **Planning (XLA, integer/bool ops only).** Each **leaf group** (the 64
   Morton-adjacent particles of one leaf) walks the tree level-synchronously
   with a fixed-capacity frontier of nodes to open. The acceptance test is
   *group-conservative*: the node must be disjoint from the group's AABB
   (⊇ "every particle outside" — the reference's Rectangle::contains is
   strict, src/bvh_tree.rs:15-20, so touching boxes count as outside) and
   the θ test must hold at the minimum distance from the group AABB to the
   node COM. Anything the group-test accepts would be accepted by every
   particle under the reference rule; borderline nodes are opened instead,
   so the result is at least as accurate as the per-particle walk.
2. **Source assembly.** Accepted nodes need no compaction at all: each
   level's candidate array becomes a column-slice of the per-group source
   list with non-accepted masses zeroed (zero mass ⇒ zero force, exactly as
   the force law computes it). Nodes reaching the leaf level land in a
   compacted per-group leaf list whose particle tiles are gathered in.
3. **Force sweep (Pallas).** One rectangular kernel: for group g, its S
   targets interact with its C = depth·2F + L·S sources — pure VPU tiles at
   all-pairs kernel efficiency.

Capacity overflow degrades gracefully: a node that cannot fit in the
frontier or leaf list is **accepted** (COM approximation) rather than
dropped, so force is never lost; with caps ≥ level widths the walk is
exact Barnes-Hut, and θ=0 reproduces direct summation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_simulation_tpu.ops.allpairs import RCP_MODES, mono_tile
from nbody_simulation_tpu.ops.force import FLT_MIN_NORMAL
from nbody_simulation_tpu.ops.tree import BIG, FlatTree, build_tree


def accept_node_scalar(p, nmin, nmax, com, theta):
    """The reference's per-particle criterion (src/main.rs:370-373), kept
    for tests: accept iff NOT contains(p) and max(w,h)^2 < d2(p,com)·θ²."""
    contains = ((p[1] > nmin[1]) & (p[0] > nmin[0])
                & (p[0] < nmax[0]) & (p[1] < nmax[1]))
    size = nmax - nmin
    s2 = jnp.maximum(size[0], size[1]) ** 2
    d2 = (p[0] - com[0]) ** 2 + (p[1] - com[1]) ** 2
    return (~contains) & (s2 < d2 * theta * theta)


def _group_node_d2(gmin, gmax, nmin, nmax, ncom):
    """Min squared distance from the group AABB to the node COM; plus the
    strict-disjoint flag and node size² (shared by acceptance variants)."""
    disjoint = ((gmax[..., 0] <= nmin[..., 0]) | (gmin[..., 0] >= nmax[..., 0])
                | (gmax[..., 1] <= nmin[..., 1]) | (gmin[..., 1] >= nmax[..., 1]))
    size = nmax - nmin
    s2 = jnp.maximum(size[..., 0], size[..., 1]) ** 2
    dx = jnp.maximum(jnp.maximum(gmin[..., 0] - ncom[..., 0],
                                 ncom[..., 0] - gmax[..., 0]), 0.0)
    dy = jnp.maximum(jnp.maximum(gmin[..., 1] - ncom[..., 1],
                                 ncom[..., 1] - gmax[..., 1]), 0.0)
    return disjoint, s2, dx * dx + dy * dy


def _accept_group(gmin, gmax, nmin, nmax, ncom, theta):
    """Group-conservative acceptance. gmin/gmax: (G,1,2); node data (G,K,2)."""
    disjoint, s2, d2 = _group_node_d2(gmin, gmax, nmin, nmax, ncom)
    return disjoint & (s2 < d2 * jnp.float32(theta * theta))


def _compact(flags: jax.Array, values: jax.Array, cap: int):
    """Scatter ``values`` where ``flags`` into per-row lists of width cap.

    Returns (lists (G,cap) int32, valid (G,cap) bool, overflow (G,K) bool).
    """
    g, _ = flags.shape
    slot = jnp.cumsum(flags, axis=1) - 1
    overflow = flags & (slot >= cap)
    store = flags & (slot < cap)
    rows = jnp.arange(g, dtype=jnp.int32)[:, None] * cap
    flat_idx = jnp.where(store, rows + slot, g * cap)  # OOB → dropped
    lists = (jnp.zeros((g * cap,), jnp.int32)
             .at[flat_idx.ravel()].set(values.ravel(), mode="drop")
             .reshape(g, cap))
    valid = (jnp.zeros((g * cap,), dtype=bool)
             .at[flat_idx.ravel()].set(store.ravel(), mode="drop")
             .reshape(g, cap))
    return lists, valid, overflow


# Candidate widths up to this run the dense rank compaction; wider ones
# (physics-quality caps, K up to ~512) fall back to argsort+scatter, whose
# cost is flat in K while the rank path is O(K²) elements per row.
_RANK_COMPACT_MAX_K = 128

# Interior levels per lax.scan in the planner walk. Each bucket's level
# records are padded only to ITS deepest width — the TPU gather lowering
# scans the whole table per gather, so one scan padded to 2^last_scan made
# shallow levels as expensive as the deepest one (docs/PERFORMANCE.md).
_SCAN_BUCKET_LEVELS = 4


def _compact_ranked(flags: jax.Array, values: jax.Array, key: jax.Array,
                    cap: int):
    """Closest-first compaction as dense VPU arithmetic — no sort, no scatter.

    Semantically identical to "stable-argsort rows by (key, index), then
    prefix-compact the flagged entries into width-``cap`` lists": entry j's
    slot is its rank among flagged entries ordered by (key, index), and the
    list/valid outputs are one-hot contractions over that rank. On TPU both
    ``jnp.argsort`` and the ``.at[].set`` scatter of ``_compact`` are
    scalar-unit/sort-network bound (~1.3 ms EACH at (2048, 32) planner
    shapes); this dense O(K²) formulation is pure vector work (~0.05 ms),
    which is why the planner uses it for every level whose candidate width
    is small (the θ≥2 regime — wide physics-quality walks keep the sort).

    Returns (lists (G,cap) int32, valid (G,cap) bool, overflow (G,K) bool).
    """
    g, k = flags.shape
    kf = jnp.where(flags, key, jnp.float32(jnp.inf))
    idx = jnp.arange(k, dtype=jnp.int32)
    # rank[g, j] = #{j' flagged : (key_j', j') < (key_j, j)}
    first = kf[:, :, None] < kf[:, None, :]
    tie = (kf[:, :, None] == kf[:, None, :]) & (idx[:, None] < idx[None, :])
    less = (first | tie) & flags[:, :, None]
    rank = jnp.sum(less, axis=1, dtype=jnp.int32)
    overflow = flags & (rank >= cap)
    store = flags & (rank < cap)
    slots = jnp.arange(cap, dtype=jnp.int32)
    onehot = (rank[:, :, None] == slots) & store[:, :, None]  # (G, K, cap)
    lists = jnp.sum(jnp.where(onehot, values[:, :, None], 0), axis=1,
                    dtype=jnp.int32)
    valid = jnp.any(onehot, axis=1)
    return lists, valid, overflow


def _quad_tile(dx, dy, mj, qxx, qxy, qyy, softening2: float, rcp: str):
    """Monopole + quadrupole force contributions (cx, cy) for a (TI,TJ) tile.

    Sources carry second moments Q = Σ m·δδᵀ about their COM (ops/tree.py);
    the correction is ½·Q : ∇∇f evaluated at the COM displacement, with the
    Hessian of the reference kernel f(d) = d/(‖d‖₁·‖d‖₂²) in closed form
    (validated against jax.hessian in tests/test_traversal.py). Leaf-particle
    sources have Q = 0, so the correction vanishes for exact interactions.

    A "+clamp" rcp suffix (ops/allpairs.mono_tile) is ignored here: the
    quadrupole correction terms (e.g. gx·qxx) carry no dx/dy factor, so a
    coincident source COM would contribute a huge finite garbage force
    under the clamp instead of the reference's silent skip — the masked
    select is load-bearing in this kernel, not just a guard.
    """
    rcp = rcp.partition("+")[0]
    adx = jnp.abs(dx)
    ady = jnp.abs(dy)
    s = adx + ady
    normal = (s >= FLT_MIN_NORMAL) & (s <= jnp.float32(3.4028235e38))
    d2 = jnp.maximum(dx * dx + dy * dy, jnp.float32(softening2))
    if rcp == "exact":
        a = jnp.float32(1.0) / s
        b = jnp.float32(1.0) / d2
    else:
        a = pl.reciprocal(s, approx=True)
        b = pl.reciprocal(d2, approx=True)
        if rcp == "newton":
            a = a * (jnp.float32(2.0) - s * a)
            b = b * (jnp.float32(2.0) - d2 * b)
    w = mj * (a * b)
    # Hessian pieces of g(d) = 1/(‖d‖₁·‖d‖₂²): g_x, g_y and g_{xx,xy,yy}.
    sx = jnp.where(dx >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    sy = jnp.where(dy >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    ab = a * b
    a2b = a * ab
    ab2 = b * ab
    a3b = a * a2b
    a2b2 = b * a2b
    ab3 = b * ab2
    gx = -(sx * a2b + jnp.float32(2.0) * dx * ab2)
    gy = -(sy * a2b + jnp.float32(2.0) * dy * ab2)
    t1 = jnp.float32(2.0) * a3b
    t2 = jnp.float32(2.0) * ab2
    gxx = t1 + jnp.float32(4.0) * adx * a2b2 - t2 + jnp.float32(8.0) * dx * dx * ab3
    gyy = t1 + jnp.float32(4.0) * ady * a2b2 - t2 + jnp.float32(8.0) * dy * dy * ab3
    gxy = (jnp.float32(2.0) * sx * sy * a3b
           + jnp.float32(2.0) * (sx * dy + sy * dx) * a2b2
           + jnp.float32(8.0) * dx * dy * ab3)
    half = jnp.float32(0.5)
    corr_x = half * ((jnp.float32(2.0) * gx + dx * gxx) * qxx
                     + jnp.float32(2.0) * (gy + dx * gxy) * qxy
                     + (dx * gyy) * qyy)
    corr_y = half * ((dy * gxx) * qxx
                     + jnp.float32(2.0) * (gx + dy * gxy) * qxy
                     + (jnp.float32(2.0) * gy + dy * gyy) * qyy)
    cx = jnp.where(normal, dx * w + corr_x, jnp.float32(0.0))
    cy = jnp.where(normal, dy * w + corr_y, jnp.float32(0.0))
    return cx, cy


def _sweep_kernel(*refs, softening2: float, rcp: str, n_sub: int,
                  quad: bool):
    """Grouped force sweep over ``n_sub`` groups per grid step.

    Ref layout: (xi, yi) targets of (S, n_sub) — one LANE column per group
    (an (X, 1) column block would tile as T(8,128) and waste 128× VMEM;
    measured 16+ MB of column buffers at n_sub=8); sources (xj, yj, mj
    [, qxx, qxy, qyy]) of (n_sub, TJ) — one sublane row per group; outputs
    (ax, ay) like the targets. Batching n_sub groups per grid step amortizes
    the per-step DMA/sequencing overhead that dominated the single-group
    sweep (per-group source rows are ~5 KB).
    """
    xi_ref, yi_ref = refs[0], refs[1]
    n_src = 6 if quad else 3
    srcs = refs[2:2 + n_src]
    ax_ref, ay_ref = refs[2 + n_src], refs[3 + n_src]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        ax_ref[:] = jnp.zeros_like(ax_ref)
        ay_ref[:] = jnp.zeros_like(ay_ref)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n_sub), 1)

    # fori_loop (not an unrolled Python loop) on purpose: Mosaic pipelines
    # an unrolled loop's independent iterations and keeps every sub's tile
    # temporaries live at once (measured 19-21 MB of scoped VMEM at gb=8 —
    # over the 16 MB budget). The sequential loop reuses one iteration's
    # buffers; the grid pipeline still overlaps the next block's DMAs.
    def body(sub, _):
        # Column extract/scatter by masked lane-reduction/broadcast: a
        # width-1 dynamic lane slice needs a 128-aligned index (Mosaic
        # restriction — "cannot statically prove index is a multiple of
        # 128"), and a one-hot MXU matmul rounds operands to bf16
        # (measured 4e-3 rel err). The masked sum is exact (one surviving
        # lane) and costs ~2% of the tile flops.
        m = lanes == sub
        xi = jnp.sum(jnp.where(m, xi_ref[:], 0.0), axis=1, keepdims=True)
        yi = jnp.sum(jnp.where(m, yi_ref[:], 0.0), axis=1, keepdims=True)
        row = pl.ds(sub, 1)
        dx = srcs[0][row, :] - xi              # (1,TJ) − (S,1) → (S,TJ)
        dy = srcs[1][row, :] - yi
        mj = srcs[2][row, :]
        if quad:
            cx, cy = _quad_tile(dx, dy, mj, srcs[3][row, :],
                                srcs[4][row, :], srcs[5][row, :],
                                softening2, rcp)
        else:
            cx, cy = mono_tile(dx, dy, mj, softening2, rcp)
        ax_ref[:] += jnp.where(m, jnp.sum(cx, axis=1, keepdims=True), 0.0)
        ay_ref[:] += jnp.where(m, jnp.sum(cy, axis=1, keepdims=True), 0.0)
        return 0

    jax.lax.fori_loop(0, n_sub, body, 0)


def bh_plan_sources(tree: FlatTree, theta: float, frontier_cap: int,
                    leaf_cap: int, arity: int = 2, plan_leaves: int = 1,
                    multipole: int = 1):
    """BFS planning pass → per-group source lists (src_x, src_y, src_m),
    each (G, C). Masked (zero-mass) entries contribute zero force.

    The walk starts at level k0 = log2(F) with ALL 2^k0 nodes in the
    frontier: levels above k0 can never produce a finer answer than their
    children, so skipping them only refines the approximation (and saves
    k0 planning iterations — the gathers here are the BH wall-clock cost).

    ``arity=4`` walks TWO binary levels at a time — node k's candidates are
    its four grandchildren 4k..4k+3 — which is the 4-ary spatial subdivision
    of the reference's (dead) QuadTree (quad_tree.rs:139-227, SURVEY §2.7)
    expressed over the same flat tree: half the planning iterations for the
    same total candidate count, and a strictly finer approximation (skipped
    intermediate nodes could only have been coarser).
    """
    assert arity in (2, 4), arity
    depth = tree.depth
    n_leaves, S, _ = tree.leaf_pos.shape
    # Planning granularity: one planning row covers ``plan_leaves`` adjacent
    # leaves; its AABB is the common ancestor node at level depth-log2(pl),
    # so the walk stays conservative while the planner shrinks by pl×. The
    # tree itself (leaf size, COM semantics) is unchanged.
    pl_ = plan_leaves
    while pl_ > 1 and (n_leaves % pl_ or (1 << depth) < pl_):
        pl_ //= 2
    own_level = tree.levels[depth - (pl_.bit_length() - 1)]
    return plan_rows(tree, own_level, theta, frontier_cap, leaf_cap, arity,
                     multipole=multipole)


def plan_rows(tree: FlatTree, own, theta: float, frontier_cap: int,
              leaf_cap: int, arity: int = 2, multipole: int = 1,
              max_levels: int | None = None, seed=None,
              return_frontier: bool = False):
    """The planner over explicit own-AABB rows.

    ``own`` holds one AABB per planning row (a Level or slice of one);
    candidate records and leaf tiles are gathered from ``tree``. The row
    count need not equal the leaf count — the sharded walk
    (parallel/bh_sharded.py) plans a slice of the rows against the full
    tree through this same entry.

    Returns ``(src_x, src_y, src_m)`` lists of (G, C) for ``multipole=1``,
    plus ``(src_qxx, src_qxy, src_qyy)`` for ``multipole=2`` (accepted nodes
    carry their second moments; leaf-particle sources carry zeros).

    ``max_levels``: bounded walk — expand at most this many levels past the
    frontier seed, then FLUSH: every node still open at the cut level is
    emitted as a COM source (the same graceful degradation as capacity
    overflow — force is approximated, never dropped). The leaf tiles are
    never gathered in this mode, so it also serves trees with no leaf data
    (the distributed coarse forest, parallel/bh_distributed.py). Flushed
    nodes failed the θ test (they are close), so they emit monopole-only
    even at ``multipole=2`` — the same rule as overflow fallback.

    ``seed``: ``(level, frontier, valid)`` — resume a walk from an explicit
    frontier at ``level`` instead of seeding with all of level log2(F)
    (frontier width must equal ``frontier_cap``). ``return_frontier``: with
    ``max_levels`` set, skip the flush and return
    ``(cols_tuple, frontier, valid)`` so the caller can hand unresolved
    rows to a deeper continuation walk (the near-stage refinement of
    parallel/bh_distributed.py).

    Compile-time shape: for ``arity=2`` all interior levels run as ONE
    ``lax.scan`` over the stacked (width-padded) level records, so the
    traced graph no longer grows with tree depth — only the first (frontier
    seed) and last (leaf compaction) iterations are peeled.
    """
    assert multipole in (1, 2), multipole
    depth = tree.depth
    S = tree.leaf_pos.shape[1]
    F = frontier_cap
    g_rows = own.aabb_min.shape[0]
    gmin = own.aabb_min[:, None, :]     # (G',1,2) group AABB
    gmax = own.aabb_max[:, None, :]

    # Deepest level whose full width fits the frontier (or the seed level).
    if seed is not None:
        k0 = seed[0]
        assert seed[1].shape[1] == F, (seed[1].shape, F)
    else:
        k0 = min(max(F.bit_length() - 1, 0), depth - 1) if depth > 0 else 0

    def level_body(packed_child, frontier, valid, fan, cap):
        """Expand one level: test fan·F candidate children, emit their COM
        source columns, compact the opened ones (closest first) into a
        width-``cap`` list. Returns (new_list, new_valid, cols)."""
        g_, fw = frontier.shape
        w, ncols_ = packed_child.shape
        # The fan children of frontier node k are the adjacent table rows
        # fan·k .. fan·k+fan−1, so reshaping the child table to
        # (W/fan, fan·ncols) and gathering by the PARENT index fetches all
        # of them in ONE row. TPU gathers at these shapes are row-count
        # bound, not byte bound (32 B rows move ~10 GB/s): fetching fan×
        # fewer, fan×-wider rows measured the 9-level 1M-shape scan gather
        # 3.46 → 2.29 ms. Candidates come out child-interleaved per parent
        # (vs the old [all left | all right] blocks) — only an fp32
        # source-summation-order change downstream.
        rec = (packed_child.reshape(w // fan, fan * ncols_)[frontier]
               .reshape(g_, fw * fan, ncols_))                  # ONE gather
        cand = (frontier[:, :, None] * fan
                + jnp.arange(fan, dtype=jnp.int32)).reshape(g_, fw * fan)
        cvalid = jnp.broadcast_to(valid[:, :, None],
                                  (g_, fw, fan)).reshape(g_, fw * fan)
        nmin = rec[..., 0:2]
        nmax = rec[..., 2:4]
        ncom = rec[..., 4:6]
        nonempty = rec[..., 7] > 0
        disjoint, s2, d2 = _group_node_d2(gmin, gmax, nmin, nmax, ncom)
        accept = cvalid & disjoint & (s2 < d2 * jnp.float32(theta * theta))
        both_sep = None
        if multipole == 2:
            # The force kernel's ‖d‖₁ factor kinks at dx=0 / dy=0, so the
            # quadrupole expansion is only trustworthy when the node is
            # strictly separated from the group in BOTH axes (no member pair
            # can straddle a kink). Axis-straddling nodes instead face a
            # 2×-tightened θ and keep monopole-only treatment — measured
            # (tests/test_traversal.py) this cuts median θ=0.5 error ~20×
            # over monopole for ~10% more opened nodes.
            sep_x = ((gmax[..., 0] <= nmin[..., 0])
                     | (gmin[..., 0] >= nmax[..., 0]))
            sep_y = ((gmax[..., 1] <= nmin[..., 1])
                     | (gmin[..., 1] >= nmax[..., 1]))
            both_sep = sep_x & sep_y
            tight = (cvalid & disjoint
                     & (s2 < d2 * jnp.float32(theta * theta * 0.25)))
            accept = (accept & both_sep) | tight
        opened = cvalid & ~accept & nonempty

        # CLOSEST-FIRST compaction: order candidates by group→node distance
        # so capacity overflow always falls back to COM on the FARTHEST
        # opened nodes, where that approximation is benign. Without this,
        # overflow COM'd whichever opened nodes came last in Morton order —
        # at N=65k/θ=0.5 that put coarse COMs right next to dense cores and
        # cost a 1e-3→5e-2 median-error cliff once tree depth outgrew the
        # frontier cap.
        if cand.shape[1] <= _RANK_COMPACT_MAX_K:
            # Narrow candidates (θ≥2 regime): dense rank compaction — same
            # closest-first result, no sort/scatter ops (each ~1.3 ms at
            # planner shapes; this path measured the 1M-BH planner 31.9 →
            # ~9 ms). Candidate order is untouched, so no take() is needed.
            take = lambda a: a
            new_list, new_valid, overflow = _compact_ranked(
                opened, cand, d2, cap)
        else:
            # Wide candidates (physics-quality caps): rank is O(K²)/row —
            # keep the argsort+scatter path, skipping the sort when the list
            # holds every candidate (overflow impossible → order irrelevant).
            if cap < cand.shape[1]:
                perm = jnp.argsort(jnp.where(opened, d2, BIG), axis=1)
                take = lambda a: jnp.take_along_axis(a, perm, axis=1)
                cand, opened, accept = take(cand), take(opened), take(accept)
                rec = jnp.take_along_axis(rec, perm[..., None], axis=1)
            else:
                take = lambda a: a
            new_list, new_valid, overflow = _compact(opened, cand, cap)
        use_com = accept | overflow  # overflow → COM fallback, never dropped

        cols = [rec[..., 4], rec[..., 5],
                jnp.where(use_com, rec[..., 6], 0.0)]
        if multipole == 2:
            # Quadrupole ONLY for θ-accepted nodes. Overflow-fallback nodes
            # are CLOSE (they failed acceptance): the expansion is invalid
            # there and the b³ Hessian terms blow up — measured a 0.05
            # median error at N=65k Plummer (dense core → leaf_cap overflow)
            # before this mask; they keep the plain COM monopole instead.
            use_q = accept & take(both_sep)
            for k in range(3):
                cols.append(jnp.where(use_q, rec[..., 8 + k], 0.0))
        return new_list, new_valid, tuple(cols)

    def packed_of(level):
        return level.packed_quad if multipole == 2 else level.packed

    ncols = 6 if multipole == 2 else 3
    src_cols = [[] for _ in range(ncols)]
    if seed is not None:
        frontier, valid = seed[1], seed[2]
    else:
        width = 1 << k0
        frontier = jnp.broadcast_to(
            jnp.arange(width, dtype=jnp.int32)[None, :], (g_rows, width))
        if width < F:
            frontier = jnp.concatenate(
                [frontier, jnp.zeros((g_rows, F - width), jnp.int32)], axis=1)
        valid = (jnp.arange(F, dtype=jnp.int32)[None, :] < width)
        valid = jnp.broadcast_to(valid, (g_rows, F))
    leaf_ids = jnp.zeros((g_rows, 1), jnp.int32)
    leaf_valid = jnp.ones((g_rows, 1), dtype=bool)

    # ``cut``: deepest level the bounded walk expands to (then flushes);
    # None = unbounded (the last expansion is the leaf-cap compaction).
    cut = None if max_levels is None else min(depth, k0 + max_levels)
    last_scan = (depth - 1) if cut is None else cut
    if arity == 2 and last_scan - k0 >= 2:
        # One scan iteration per interior level: stack the (width-padded)
        # child records so the traced graph is depth-independent. Levels are
        # BUCKETED (≤4 per scan, shallow-first) and each bucket padded only
        # to ITS deepest width: the TPU gather lowering scans the whole
        # table per gather (measured cost grows with table rows — 0.85 →
        # 1.89 ms for 9 (4096,16)-row gathers as the table grows 512 →
        # 8192), so padding every level to 2^last_scan made the shallow
        # levels as expensive as the deepest one. Graph size stays
        # depth-independent per bucket (≈depth/4 scan bodies total).
        def scan_body(carry, packed_child):
            frontier, valid = carry
            frontier, valid, cols = level_body(packed_child, frontier,
                                               valid, 2, F)
            return (frontier, valid), cols

        lvls = list(range(k0 + 1, last_scan + 1))
        bs = _SCAN_BUCKET_LEVELS
        for i in range(0, len(lvls), bs):
            chunk = lvls[i:i + bs]
            wpad = 1 << chunk[-1]
            stacked = jnp.stack([
                jnp.pad(packed_of(tree.levels[l]),
                        ((0, wpad - (1 << l)), (0, 0)))
                for l in chunk])
            (frontier, valid), col_stacks = jax.lax.scan(
                scan_body, (frontier, valid), stacked)
            for k in range(ncols):
                # (T, G, 2F) → (G, T·2F)
                src_cols[k].append(
                    col_stacks[k].transpose(1, 0, 2).reshape(g_rows, -1))
        if cut is None:
            leaf_ids, leaf_valid, leaf_cols = level_body(
                packed_of(tree.levels[depth]), frontier, valid, 2, leaf_cap)
            for k in range(ncols):
                src_cols[k].append(leaf_cols[k])
    else:
        lvl = k0
        end = depth if cut is None else cut
        while lvl < end:
            step = 2 if (arity == 4 and lvl + 2 <= end) else 1
            last = cut is None and lvl + step >= depth
            out_list, out_valid, cols = level_body(
                packed_of(tree.levels[lvl + step]), frontier, valid,
                1 << step, leaf_cap if last else F)
            if last:
                leaf_ids, leaf_valid = out_list, out_valid
            else:
                frontier, valid = out_list, out_valid
            for k in range(ncols):
                src_cols[k].append(cols[k])
            lvl += step
    if cut is not None and return_frontier:
        # Hand the cut frontier to the caller (near-stage refinement)
        # instead of flushing; emitted cols cover the walked levels only.
        cols = tuple(
            jnp.concatenate(src_cols[k], axis=1) if src_cols[k]
            else jnp.zeros((g_rows, 0), jnp.float32) for k in range(ncols))
        return cols, frontier, valid
    if cut is not None:
        # FLUSH: still-open frontier nodes at the cut level become COM
        # sources (close ⇒ quadrupole invalid ⇒ monopole-only, like
        # overflow fallback). No leaf tiles in this mode.
        rec = packed_of(tree.levels[cut])[frontier]
        src_cols[0].append(rec[..., 4])
        src_cols[1].append(rec[..., 5])
        src_cols[2].append(jnp.where(valid, rec[..., 6], 0.0))
        if multipole == 2:
            z = jnp.zeros((g_rows, frontier.shape[1]), jnp.float32)
            for k in range(3):
                src_cols[3 + k].append(z)
        return tuple(jnp.concatenate(src_cols[k], axis=1)
                     for k in range(ncols))
    src_x, src_y, src_m = src_cols[0], src_cols[1], src_cols[2]
    src_q = src_cols[3:]

    # Leaf tiles: gather (G', L, S) particle data; invalid slots masked.
    lp = tree.leaf_pos[leaf_ids]                        # (G', L, S, 2)
    lm = tree.leaf_mass[leaf_ids] * leaf_valid[..., None]
    L = leaf_ids.shape[1]
    src_x.append(lp[..., 0].reshape(g_rows, L * S))
    src_y.append(lp[..., 1].reshape(g_rows, L * S))
    src_m.append(lm.reshape(g_rows, L * S))
    out = (jnp.concatenate(src_x, axis=1),
           jnp.concatenate(src_y, axis=1),
           jnp.concatenate(src_m, axis=1))
    if multipole == 2:
        z = jnp.zeros((g_rows, L * S), jnp.float32)  # particles: Q = 0
        out = out + tuple(
            jnp.concatenate(src_q[k] + [z], axis=1) for k in range(3))
    return out


def _grouped_force(tgt_pos: jax.Array, src_x, src_y, src_m,
                   softening2: float, rcp: str, interpret: bool,
                   tile_j: int = 4096, src_q=None) -> jax.Array:
    """Targets (G, S, 2) vs per-group sources (G, C) → accel (G, S, 2).

    ``src_q``: optional (qxx, qxy, qyy) arrays of (G, C) — switches the
    sweep to the monopole+quadrupole kernel (_quad_kernel).
    """
    # Validate BEFORE the interpret override: an unknown mode would
    # otherwise silently run as "approx" on TPU (mono_tile's partition
    # falls through) and as "exact" on CPU — misuse must fail loudly on
    # both backends.
    if rcp not in RCP_MODES:
        raise ValueError(f"rcp must be one of {RCP_MODES}, got {rcp!r}")
    if interpret:
        rcp = "exact"  # pl.reciprocal(approx) has no interpreter lowering
    g, s, _ = tgt_pos.shape
    c = src_x.shape[1]
    srcs = [src_x, src_y, src_m] + (list(src_q) if src_q is not None else [])
    # Pick a lane-aligned j tile, then pad C to a multiple of it with inert
    # (zero-mass) sources. The (s, tj) tile area is capped at ~1M f32
    # elements (Mosaic keeps ~3 full-tile temporaries live; 3x4 MB fits the
    # 16 MB scoped-VMEM budget — the quad kernel carries more temporaries,
    # so its cap is halved), and tj is chosen to minimize padding waste.
    def ceil_to(x, m):
        return -(-x // m) * m

    # Groups per grid step: per-group source rows are tiny (tj·4B ≈ 5 KB),
    # so single-group steps were DMA/sequencing-overhead bound. Batching
    # groups per step amortizes that. gb=128 makes the (s, gb) target block
    # lane-aligned (Mosaic: lane block dim must be a multiple of 128 or the
    # whole array); smaller g runs as one block (block == array dim is the
    # other allowed case). Groups are padded with inert zero rows.
    gb = min(128, g)
    g_pad = ceil_to(g, gb)
    if g_pad != g:
        zt = jnp.zeros((g_pad - g, s, 2), jnp.float32)
        tgt_pos = jnp.concatenate([tgt_pos, zt], 0)
        zs = jnp.zeros((g_pad - g, c), jnp.float32)
        srcs = [jnp.concatenate([a, zs], 0) for a in srcs]

    # The quad kernel keeps ~20 tile-sized temporaries live (a/b powers,
    # g-derivatives, Hessian pieces); its area cap is 2^16 — at gb=128 the
    # six double-buffered (gb, tj) source blocks add ~6 KB/lane on top of
    # the temporaries, and 2^17 at s=64 measured 16.53 MB scoped VMEM
    # (544 KB over budget). The monopole kernel carries ~8 and gets 2^19.
    area = (1 << 16) if src_q is not None else (1 << 19)
    tile_cap = min(tile_j, max(128, (area // s) // 128 * 128))
    # Additional scoped-VMEM cap for large-s groups: the (s, gb) target and
    # output column blocks (4, single-buffered), the double-buffered
    # (gb, tj) source blocks, and ~T live (s, tj) tile temporaries must fit
    # the 16 MB budget. T fitted to measured pass/fail points: s=4096/tj=128
    # mono measured 16.38 MB (T≈4), quad s=64/tj=2048 measured 16.53 MB
    # with 12.6 MB of source double-buffers (T≈8).
    t_live = 8 if src_q is not None else 4
    tgt_bytes = 4 * s * gb * 4
    per_tj = 2 * len(srcs) * gb * 4 + t_live * s * 4
    tile_cap = min(tile_cap,
                   max(128, ((15 << 20) - tgt_bytes) // per_tj // 128 * 128))
    n_tiles = max(1, -(-c // tile_cap))
    tj = ceil_to(-(-c // n_tiles), 128)
    target_c = n_tiles * tj
    if target_c != c:
        z = jnp.zeros((g_pad, target_c - c), jnp.float32)
        srcs = [jnp.concatenate([a, z], 1) for a in srcs]
        c = target_c

    # Targets/outputs laid out (S, G): one LANE column per group. The
    # previous (G·S, 1) column layout tiled each (gb·S, 1) block as T(8,128)
    # — 128× VMEM waste, 16+ MB of column buffers at gb=8.
    tgt_t = jnp.transpose(tgt_pos, (1, 0, 2))   # (S, G, 2)
    x_cols = tgt_t[..., 0]                      # (S, G)
    y_cols = tgt_t[..., 1]
    jt = c // tj  # j-tiles per group
    kernel = functools.partial(_sweep_kernel, softening2=softening2, rcp=rcp,
                               n_sub=gb, quad=src_q is not None)
    grid = (g_pad // gb, jt)
    tgt_spec = pl.BlockSpec((s, gb), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    src_spec = pl.BlockSpec((gb, tj), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    ax, ay = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tgt_spec, tgt_spec] + [src_spec] * len(srcs),
        out_specs=[tgt_spec, tgt_spec],
        out_shape=[
            jax.ShapeDtypeStruct((s, g_pad), jnp.float32),
            jax.ShapeDtypeStruct((s, g_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_cols, y_cols, *srcs)
    return jnp.stack([ax.T, ay.T], axis=-1)[:g]  # (G, S, 2)


def _grouped_force_bucketed(tgt_pos, src_x, src_y, src_m,
                            softening2: float, rcp: str, interpret: bool,
                            src_q=None,
                            block_frac: float = 0.5,
                            col_frac: float = 0.5) -> jax.Array:
    """Occupancy-bucketed grouped sweep: plan-time work elision.

    The planner's per-group source rows have data-dependent trailing zeros
    (galaxy shapes: 46% of columns lie past the per-row last nonzero,
    benchmarks/probe_lastnz.py) and the sweep pays full C for all of them.
    In-kernel skipping is a measured dead end at block AND row granularity
    (conditional chunk boundaries break Mosaic's pipelining; j-tiling
    multiplies the lane-extract overhead — docs/STATUS.md dead ends). This
    variant moves the branching to PLAN time instead:

    - compute each 128-group block's max last-nonzero column (``block_u``),
    - order blocks by it (descending) — a B-element argsort, B = G/128,
    - issue TWO pallas_calls with STATIC shapes: the top ``block_frac`` of
      blocks sweep the full C, the rest sweep only the first
      ``col_frac``·C columns — each call remains a single full-width
      j-tile, so the per-sub lane-extract overhead is UNCHANGED (the exact
      overhead that killed the in-kernel variants),
    - block indirection rides scalar-prefetch index maps (no materialized
      permutation; the DMAs gather the right blocks directly),
    - a ``lax.cond`` guards soundness: if any low-bucket block's occupancy
      exceeds its static budget (e.g. the uniform disc, where every block
      holds a full row), the step falls back to the one-call full sweep —
      approximation quality is NEVER data-dependent, only speed is.

    Anchor: the leaf exact-loop economics of reference src/main.rs:355-362
    — the reference's recursion naturally does less work for particles
    whose walk terminates early; this recovers that economy for the dense
    bucketed sweep (round-4 verdict item 6).
    """
    if rcp not in RCP_MODES:
        raise ValueError(f"rcp must be one of {RCP_MODES}, got {rcp!r}")
    g, s, _ = tgt_pos.shape
    c = src_x.shape[1]
    srcs = [src_x, src_y, src_m] + (list(src_q) if src_q is not None else [])

    def ceil_to(x, m):
        return -(-x // m) * m

    gb = min(128, g)
    g_pad = ceil_to(g, gb)
    c_pad = ceil_to(c, 128)
    n_blocks = g_pad // gb
    # Single-j-tile regime only (galaxy/flagship θ≥2 shapes): the area and
    # VMEM caps of _grouped_force must admit C as ONE tile, and there must
    # be enough blocks to bucket. Everything else → the plain sweep.
    area = (1 << 16) if src_q is not None else (1 << 19)
    t_live = 8 if src_q is not None else 4
    per_tj = 2 * len(srcs) * gb * 4 + t_live * s * 4
    vmem_cap = max(128, ((15 << 20) - 4 * s * gb * 4) // per_tj // 128 * 128)
    c2 = max(128, int(ceil_to(int(c_pad * col_frac), 128)))
    if (n_blocks < 4 or gb < 128
            or c_pad > min(max(128, (area // s) // 128 * 128), vmem_cap)
            or c2 >= c_pad):
        return _grouped_force(tgt_pos, src_x, src_y, src_m,
                              softening2=softening2, rcp=rcp,
                              interpret=interpret, src_q=src_q)
    b1 = min(n_blocks - 1, max(1, int(round(n_blocks * block_frac))))

    if g_pad != g:
        zt = jnp.zeros((g_pad - g, s, 2), jnp.float32)
        tgt_pos = jnp.concatenate([tgt_pos, zt], 0)
        zs = jnp.zeros((g_pad - g, c), jnp.float32)
        srcs = [jnp.concatenate([a, zs], 0) for a in srcs]
    if c_pad != c:
        z = jnp.zeros((g_pad, c_pad - c), jnp.float32)
        srcs = [jnp.concatenate([a, z], 1) for a in srcs]

    # Per-block occupancy: max last-nonzero source column over the block.
    cols1 = jax.lax.broadcasted_iota(jnp.int32, (g_pad, c_pad), 1) + 1
    u = jnp.max(jnp.where(srcs[2] != 0, cols1, 0), axis=1)       # (G,)
    block_u = jnp.max(u.reshape(n_blocks, gb), axis=1)           # (B,)
    order = jnp.argsort(-block_u).astype(jnp.int32)
    inv = jnp.argsort(order)
    ok = block_u[order[b1]] <= jnp.int32(c2)

    tgt_t = jnp.transpose(tgt_pos, (1, 0, 2))
    x_cols, y_cols = tgt_t[..., 0], tgt_t[..., 1]

    def run_bucket(ids, cb):
        nb = ids.shape[0]

        def kernel(ids_ref, *refs):  # leading scalar-prefetch ref unused
            _sweep_kernel(*refs, softening2=softening2, rcp=rcp,
                          n_sub=gb, quad=src_q is not None)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb, 1),
            in_specs=([pl.BlockSpec((s, gb), lambda i, j, ids: (0, ids[i]),
                                    memory_space=pltpu.VMEM)] * 2
                      + [pl.BlockSpec((gb, cb), lambda i, j, ids: (ids[i], 0),
                                      memory_space=pltpu.VMEM)] * len(srcs)),
            out_specs=[pl.BlockSpec((s, gb), lambda i, j, ids: (0, i),
                                    memory_space=pltpu.VMEM)] * 2,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((s, nb * gb), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(ids, x_cols, y_cols, *srcs)

    def bucketed():
        ax1, ay1 = run_bucket(order[:b1], c_pad)
        ax2, ay2 = run_bucket(order[b1:], c2)
        ax = jnp.concatenate([ax1, ax2], axis=1)
        ay = jnp.concatenate([ay1, ay2], axis=1)
        # Un-permute at block granularity (gather of B lane blocks).
        def unperm(a):
            return (a.reshape(s, n_blocks, gb)[:, inv, :]
                    .reshape(s, g_pad))
        return jnp.stack([unperm(ax).T, unperm(ay).T], axis=-1)[:g]

    def full():
        return _grouped_force(tgt_pos[:g], src_x, src_y, src_m,
                              softening2=softening2, rcp=rcp,
                              interpret=interpret, src_q=src_q)

    return jax.lax.cond(ok, bucketed, full)


@functools.partial(jax.jit,
                   static_argnames=("theta", "softening2", "frontier_cap",
                                    "leaf_cap", "interpret", "arity",
                                    "plan_leaves", "multipole", "rcp",
                                    "sweep_buckets"))
def bh_accel_sorted(tree: FlatTree, theta: float = 50.0,
                    softening2: float = 1e-3, frontier_cap: int = 32,
                    leaf_cap: int = 16, interpret: bool = False,
                    arity: int = 2, plan_leaves: int = 1,
                    multipole: int = 1, rcp: str | None = None,
                    sweep_buckets: tuple | None = None) -> jax.Array:
    """Accelerations for all (sorted, padded) particles in the tree.

    Returns f32[n_leaves*leaf_size, 2] in sorted order. ``multipole=2``
    adds the quadrupole correction for accepted nodes (≈10-100× lower
    acceptance error at physics-quality θ, ~2× sweep flops). ``rcp=None``
    resolves from θ like SimConfig.resolved_rcp: the fast approximate
    reciprocal (≤6e-4) in the θ≥2 regime where the walk's own error
    dominates, Newton-refined (≤6e-6) at physics quality.
    """
    if jax.default_backend() == "cpu":
        interpret = True
    if rcp is None:
        rcp = "approx" if theta >= 2.0 else "newton"
    n_leaves, S, _ = tree.leaf_pos.shape
    pl_ = max(1, min(plan_leaves, n_leaves))
    while n_leaves % pl_:
        pl_ //= 2
    planned = bh_plan_sources(tree, theta, frontier_cap,
                              leaf_cap, arity=arity, plan_leaves=pl_,
                              multipole=multipole)
    src_x, src_y, src_m = planned[:3]
    src_q = planned[3:] if multipole == 2 else None
    tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)
    if sweep_buckets is not None:
        # Occupancy-bucketed sweep (sound: lax.cond falls back to the full
        # sweep whenever the static budgets don't hold the data).
        bf, cf = sweep_buckets
        acc = _grouped_force_bucketed(tgt, src_x, src_y, src_m,
                                      softening2=softening2, rcp=rcp,
                                      interpret=interpret, src_q=src_q,
                                      block_frac=bf, col_frac=cf)
    else:
        acc = _grouped_force(tgt, src_x, src_y, src_m,
                             softening2=softening2, rcp=rcp,
                             interpret=interpret, src_q=src_q)
    return acc.reshape(n_leaves * S, 2)


def bh_accel(pos: jax.Array, mass: jax.Array, *, theta: float = 50.0,
             softening2: float = 1e-3, leaf_size: int = 64,
             world_size: float = 100_000.0, unweighted_leaf_com: bool = True,
             frontier_cap: int | None = None, leaf_cap: int | None = None,
             arity: int = 2,
             plan_leaves: int = 1, morton_bits: int | None = None,
             multipole: int | None = None, rcp: str | None = None,
             group_chunk: int | None = None,
             sweep_buckets: tuple | None = None) -> jax.Array:
    """Full Barnes-Hut acceleration: sort + build + plan + sweep + unsort.

    Returns accelerations in the ORIGINAL particle order. ``group_chunk`` is
    accepted for API compatibility and ignored (the planning pass is cheap
    enough to run unchunked). ``morton_bits=None``/``multipole=None``/cap
    ``None`` resolve from θ exactly like SimConfig: (15 bits, monopole,
    small caps) for the reference's θ>=2 regime, (24 bits, quadrupole, big
    caps) for physics-quality θ<2 — an under-capped θ=0.5 walk silently
    costs ~100× in force error (it was the round-1 config-2 miss).
    """
    n = pos.shape[0]
    if morton_bits is None:
        morton_bits = 15 if theta >= 2.0 else 24
    if multipole is None:
        multipole = 1 if theta >= 2.0 else 2
    pl_ = max(1, plan_leaves)
    if frontier_cap is None:
        frontier_cap = 16 if theta >= 2.0 else 256
    if leaf_cap is None:
        leaf_cap = max(8, 4 * pl_) if theta >= 2.0 else max(256, 32 * pl_)
    tree, order = build_tree(pos, mass, leaf_size=leaf_size,
                             world_size=world_size,
                             unweighted_leaf_com=unweighted_leaf_com,
                             morton_bits=morton_bits)
    acc_sorted = bh_accel_sorted(tree, theta=theta, softening2=softening2,
                                 frontier_cap=frontier_cap, leaf_cap=leaf_cap,
                                 arity=arity, plan_leaves=plan_leaves,
                                 multipole=multipole, rcp=rcp,
                                 sweep_buckets=sweep_buckets)
    return jnp.zeros((n, 2), jnp.float32).at[order].set(acc_sorted[:n])


def bh_accel_fn(config):
    """World adapter: (pos, mass) -> accel from a SimConfig."""
    return functools.partial(
        bh_accel, theta=config.theta, softening2=config.softening2,
        leaf_size=config.leaf_size, world_size=config.world_size,
        unweighted_leaf_com=config.unweighted_leaf_com,
        frontier_cap=config.resolved_caps()[0],
        leaf_cap=config.resolved_caps()[1],
        arity=config.tree_arity, plan_leaves=config.plan_leaves,
        morton_bits=config.resolved_morton_bits(),
        multipole=config.resolved_multipole(),
        rcp=config.resolved_rcp(bh=True),
        sweep_buckets=config.sweep_buckets)

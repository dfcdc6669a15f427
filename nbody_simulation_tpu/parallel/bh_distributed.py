"""Fully distributed Barnes-Hut: ring-subtree sweep, no device holds full N.

Round-1's sharded BH (parallel/bh_sharded.py) all_gathered the complete
particle set to every device and built the full Morton tree replicated —
O(N) memory and an O(N log N) replicated sort per chip per step. This module
replaces it with a design where per-device memory is O(N/P):

- **Ownership.** Particles are globally Morton-ordered once at
  ``distribute_state`` (host-side sort, init time); device d owns the d-th
  contiguous run of Z-order leaves. Each step every device re-sorts ONLY its
  local shard (stale global order between host rebalances just loosens
  AABBs — the conservative walk opens more; physics is unchanged, exactly
  like the single-chip ``resort_every`` contract, ops/tree.py).
- **Local subtree.** Each device builds the flat BVH over its own shard —
  by construction the same nodes as the global tree's subtree covering its
  leaf range (binary combines of the same leaf blocks).
- **Ring sweep.** The per-device subtree block (leaf tiles + level
  summaries, ≈ the size of the particle shard itself) rotates P−1 times
  around the ICI ring (``ppermute``), the ring-attention dataflow of
  parallel/ring.py applied to *trees*: at each stage every device plans its
  own leaf groups against the visiting subtree (ops/traversal.plan_rows)
  and accumulates one Pallas force sweep. Communication overlaps compute —
  XLA schedules the next permute against the current sweep.
- **Distance-dependent capacities.** A visiting subtree that is ring-far is
  almost always accepted near its root, so far stages run with small
  frontier/leaf caps (overflow degrades to the node-COM approximation,
  never dropped force — ops/traversal.py contract). Ring-adjacent stages
  carry the full near-field caps because the Morton boundary leaves are
  spatial neighbors.

Equivalence: with caps ≥ level widths (no overflow) and frontier_cap ≥
n_leaves_global/2, the union of per-stage walks tests exactly the node set
of the single-chip walk, so the result matches a single chip to fp32
summation order (asserted at 1e-5 in tests/test_distributed.py).

Reference scale anchor: the traversal being sharded is
/root/reference/src/main.rs:348-386; the reference itself has no
distributed backend (SURVEY.md §2, parallelism table).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.ops.morton import morton_keys, morton_sort_state
from nbody_simulation_tpu.ops.traversal import (_group_node_d2,
                                                _grouped_force, plan_rows)
from nbody_simulation_tpu.ops.tree import (EMPTY_POS, FlatTree, Level,
                                           _combine, summarize_sorted)
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.state import PAD_POS, ParticleState

# Row granularities of the non-local stages (leaves per planning row) —
# shared with the suite's single-chip flagship proxy (benchmarks/suite.py
# config 5) so retunes stay in lockstep with what it measures.
NEAR_ROW_LEAVES = 8    # refined neighbor stages (finer rows doubled their
#                        planner cost and halved sweep tiles: 6.7->14.8 ms)
FOREST_ROW_LEAVES = 32  # forest walk (s=2048 is the largest row the sweep's
#                         scoped-VMEM model admits)


def distribute_state(state: ParticleState, mesh: Mesh, config: SimConfig,
                     axis: str = AXIS) -> ParticleState:
    """Globally Morton-sort (host side, init/rebalance time) and shard.

    Each device receives an equal contiguous Z-order run of ceil(N/P) real
    particles, padded per device to L = (next power of two of leaf count) ×
    leaf_size so the local tree is a complete subtree. Device memory after
    this call is O(N/P); the host-side sort is the only O(N) step and runs
    outside the simulation loop.
    """
    n_dev = mesh.shape[axis]
    n = state.n_real
    hi, lo = morton_keys(jnp.asarray(np.asarray(state.pos[:n])),
                         jnp.asarray(np.asarray(state.mass[:n])),
                         config.world_size,
                         bits=config.resolved_morton_bits())
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    pos = np.asarray(state.pos[:n])[order]
    vel = np.asarray(state.vel[:n])[order]
    mass = np.asarray(state.mass[:n])[order]

    per_dev = -(-n // n_dev)
    leaves = -(-per_dev // config.leaf_size)
    leaves = 1 << max(0, (leaves - 1).bit_length())
    local = max(leaves * config.leaf_size, config.leaf_size)

    def chunk(a, fill=0.0):
        out = np.full((n_dev * local,) + a.shape[1:], fill, np.float32)
        for d in range(n_dev):
            src = a[d * per_dev:(d + 1) * per_dev]
            out[d * local:d * local + len(src)] = src
        return out

    cpos = chunk(pos, PAD_POS)
    cvel = chunk(vel)
    cmass = chunk(mass)
    shp = NamedSharding(mesh, P(axis, None))
    shm = NamedSharding(mesh, P(axis))
    # n_real covers the WHOLE padded layout: padding here is interleaved
    # per device (each shard is real-first, but shard d+1's real particles
    # sit after shard d's padding), so the package-wide "first n_real rows
    # are live" contract (state.py) cannot name the true count — zero mass
    # is the only live marker. distributed=True makes real_slice() refuse
    # instead of silently returning padding (use .compact()).
    return ParticleState(jax.device_put(jnp.asarray(cpos), shp),
                         jax.device_put(jnp.asarray(cvel), shp),
                         jax.device_put(jnp.asarray(cmass), shm),
                         n_real=n_dev * local, distributed=True)


def rebalance_state(state: ParticleState, mesh: Mesh, config: SimConfig,
                    axis: str = AXIS) -> ParticleState:
    """Host-side global re-partition of a drifted distributed state.

    Between rebalances each device re-sorts only its own shard, so global
    ownership goes stale as particles drift across Morton boundaries —
    physics stays correct (the conservative walk absorbs overlapping shard
    AABBs) but near/forest stages gradually open more. Production cadence:
    every O(10³) steps, or when step time creeps. Zero-mass padding rows
    are dropped before re-partitioning, so repeated rebalances don't
    accumulate padding.
    """
    return distribute_state(state.compact(), mesh, config, axis=axis)


def shard_cut_aabbs(state: ParticleState, mesh: Mesh, config: SimConfig,
                    axis: str = AXIS):
    """Per-shard AABBs of the ``2^(forest_levels-1)`` equal slot ranges —
    exactly the leaf ranges of the deepest gathered forest level (complete
    subtree ⇒ equal-slot nodes; zero-mass padding masked like the tree
    build, ops/tree.py). Tiny: (P, W, 2) each, fetched to host once per
    adjacency scheduling. Returns (mins, maxs) as NumPy."""
    W = 1 << max(0, config.forest_levels - 1)
    mn, mx = _cut_aabbs_fn(mesh, W, axis)(state.pos, state.mass)
    return np.asarray(mn), np.asarray(mx)


@functools.lru_cache(maxsize=16)
def _cut_aabbs_fn(mesh: Mesh, W: int, axis: str):
    """Memoized jitted collective for shard_cut_aabbs: it runs after EVERY
    rebalance (DistributedWorld.step → adjacency_stages), so a fresh
    jit(shard_map(...)) closure per call would retrace each time and pay
    the serial-compile tunnel at the rebalance cadence (the same hazard
    repartition._cached solves the same way)."""

    def local(pos_l, mass_l):
        L = pos_l.shape[0]
        w = W
        while L % w or w > L:
            w //= 2
        seg = pos_l.reshape(w, L // w, 2)
        m = (mass_l.reshape(w, L // w) > 0)[..., None]
        big = jnp.float32(3.0e38)
        mn = jnp.min(jnp.where(m, seg, big), axis=1)
        mx = jnp.max(jnp.where(m, seg, -big), axis=1)
        return (jax.lax.all_gather(mn, axis, axis=0, tiled=False),
                jax.lax.all_gather(mx, axis, axis=0, tiled=False))

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis, None), P(axis)),
        out_specs=(P(), P()), check_vma=False))


def adjacency_stages(state: ParticleState, mesh: Mesh, config: SimConfig,
                     axis: str = AXIS):
    """Schedule seam near stages: static ppermute matchings covering every
    shard pair the forest cut cannot θ-accept.

    The coarse forest flushes still-open nodes at its deepest gathered
    level; flushes only happen for node/destination pairs that fail the
    planner's acceptance test there. For each ordered pair (dest a,
    source b) this helper checks, on the host with the tiny cut-level
    AABBs, that EVERY nonempty cut node v of b is strictly disjoint from
    shard a and satisfies ``2·size(v) < θ_eff·gap(v, A_a)`` (θ_eff = θ/2
    under quadrupole — the planner's axis-straddling tightening; the 2× is
    drift margin between rebalances, and gap(v, A_a) lower-bounds the
    planner's row-AABB-to-COM distance for every row of a). Pairs that
    fail — the Morton SEAMS: shards far on the ring but spatially touching
    (the Z-curve revisits neighborhoods) — get a full per-group near stage,
    exact like the ring-neighbor stages. In 2-D a shard has O(1) spatial
    neighbors, so this adds O(1) stages regardless of P — the forest path
    stays O(1)-in-P while matching the exact ring sweep structurally (every
    spatially-near pair refined per group, every far pair θ-accepted with
    quadrupole above the cut).

    Returns a tuple of matchings; each matching is a tuple of (src, dst)
    ppermute pairs (disjoint devices, both directions — greedy edge
    coloring, ≤ max-degree+1 matchings). Recompute at every rebalance;
    ``make_distributed_bh_step`` takes the result as ``extra_pairs``
    (static → a changed adjacency recompiles, typically rare and cached).
    """
    n_dev = mesh.shape[axis]
    if n_dev < 4:
        return ()
    mn, mx = shard_cut_aabbs(state, mesh, config, axis=axis)
    empty = mn[..., 0] > mx[..., 0]
    size = np.where(empty[..., None], 0.0, mx - mn).max(-1)     # (P, W)
    smin = np.where(empty[..., None], np.float32(3e38), mn)
    smax = np.where(empty[..., None], np.float32(-3e38), mx)
    amin = smin.min(axis=1)                                     # (P, 2)
    amax = smax.max(axis=1)
    theta_eff = config.theta * (
        0.5 if config.resolved_multipole() == 2 else 1.0)
    edges = set()
    for a in range(n_dev):
        for b in range(n_dev):
            if b in (a, (a + 1) % n_dev, (a - 1) % n_dev):
                continue
            gap = np.sqrt((np.maximum(
                0.0, np.maximum(mn[b] - amax[a], amin[a] - mx[b])) ** 2
            ).sum(-1))                                          # (W,)
            ok = empty[b] | ((gap > 0) & (2.0 * size[b] < theta_eff * gap))
            if not ok.all():
                edges.add((min(a, b), max(a, b)))
    matchings: list[list[tuple[int, int]]] = []
    used: list[set[int]] = []
    for a, b in sorted(edges):
        for m, u in zip(matchings, used):
            if a not in u and b not in u:
                m += [(a, b), (b, a)]
                u |= {a, b}
                break
        else:
            matchings.append([(a, b), (b, a)])
            used.append({a, b})
    return tuple(tuple(m) for m in matchings)


def resolved_seam_stages(config: SimConfig) -> bool:
    """Whether the forest mode schedules adjacency seam stages: on at
    physics quality (θ<2, where flush error at the cut would break the
    <1e-3 budget), off in the reference's θ≥2 regime (round-2 behavior —
    the θ=50 walk's own error dwarfs seam flushes)."""
    return config.theta < 2.0


def _stage_caps(config: SimConfig, dist: int, n_dev: int):
    """Frontier/leaf caps for a visiting subtree at ring distance ``dist``.

    Ring-adjacent subtrees (Morton neighbors — the spatial near field
    crosses their boundary) get the full caps; ring-far subtrees default to
    caps/4 / caps/8 (overflow → closest-first COM fallback on the farthest
    opened nodes, so far seams degrade smoothly). Set
    ``far_frontier_cap=frontier_cap`` etc. for bit-level parity with the
    single-chip walk at any distance.
    """
    fcap, lcap = config.resolved_caps()
    # Callers pass the FOLDED ring distance min(s, n_dev - s), so dist <= 1
    # already covers both neighbors.
    if dist <= 1 or n_dev <= 4:
        return fcap, lcap
    ff = config.far_frontier_cap or max(4, fcap // 4)
    fl = config.far_leaf_cap or max(2, lcap // 8)
    return min(fcap, ff), min(lcap, fl)


def _gather_forest(tree: FlatTree, axis: str, n_dev: int,
                   top_levels: int, covered_np=None) -> FlatTree:
    """All-gather the top ``top_levels`` levels of every device's subtree
    and assemble ONE complete binary FlatTree over them.

    Subtrees covered by a dedicated near stage are emptied (zero mass,
    point AABB at EMPTY_POS) — by default ring distance 0 and ±1 (the local
    walk and the two neighbor ring stages); ``covered_np`` (a static
    (P, P) bool matrix, row d = subtrees device d covers elsewhere) extends
    this to the adjacency-scheduled seam stages of the physics-quality
    mode. Virtual combine levels are built above the subtree roots, so the
    concatenated per-subtree levels index exactly like the lower part of a
    complete binary tree (subtree ``s`` node ``i`` at ``s·2^l + i`` has
    children ``2(s·2^l+i)``, ``+1``). Gathered bytes are
    O(P·2^top_levels) — a few hundred KB at P=256 — independent of N.

    The forest has NO leaf data; walk it with ``plan_rows(...,
    max_levels=forest.depth - k0)`` so the walk flushes at the deepest
    gathered level instead of gathering leaf tiles.
    """
    levels_m = min(top_levels, tree.depth + 1)
    my = jax.lax.axis_index(axis)
    if covered_np is not None:
        covered = jnp.asarray(covered_np)[my]
    else:
        src = jnp.arange(n_dev, dtype=jnp.int32)
        d = (src - my) % n_dev
        covered = (d == 0) | (d == 1) | (d == n_dev - 1)  # local + ring
    p2 = 1 << max(0, (n_dev - 1).bit_length())

    gathered = []
    for l in range(levels_m):
        lvl = tree.levels[l]
        g = Level(*[jax.lax.all_gather(x, axis, axis=0, tiled=False)
                    for x in lvl])  # each field (P, 2^l, ...)

        def mask_pad(x, fill):
            m = covered.reshape((n_dev,) + (1,) * (x.ndim - 1))
            x = jnp.where(m, jnp.asarray(fill, x.dtype), x)
            if p2 != n_dev:
                pad = jnp.full((p2 - n_dev,) + x.shape[1:],
                               fill, x.dtype)
                x = jnp.concatenate([x, pad], axis=0)
            return x.reshape((p2 * x.shape[1],) + x.shape[2:])

        gathered.append(Level(
            aabb_min=mask_pad(g.aabb_min, EMPTY_POS),
            aabb_max=mask_pad(g.aabb_max, EMPTY_POS),
            com=mask_pad(g.com, EMPTY_POS),
            mass_i=mask_pad(g.mass_i, 0),
            count=mask_pad(g.count, 0),
            quad=mask_pad(g.quad, 0.0),
        ))

    # Virtual top levels: pairwise combines of the P2 subtree roots up to a
    # single root, exactly the summarize pass over the forest.
    vlevels = [gathered[0]]
    while vlevels[0].aabb_min.shape[0] > 1:
        vlevels.insert(0, _combine(vlevels[0]))
    levels = vlevels + gathered[1:]
    w = levels[-1].aabb_min.shape[0]
    return FlatTree(levels=levels,
                    leaf_pos=jnp.zeros((w, 1, 2), jnp.float32),
                    leaf_mass=jnp.zeros((w, 1), jnp.float32))


class SeamRows(NamedTuple):
    """Minimal 'own' rows for a seeded continuation walk — plan_rows reads
    only the row AABBs (ops/traversal.py), so a seam-row request ships two
    (r, 2) arrays instead of a full Level."""
    aabb_min: jax.Array
    aabb_max: jax.Array


def _near_geometry(cfg: SimConfig, caps, depth: int):
    """(k0, cut, refine?) of a near stage against a depth-``depth`` subtree.

    k0 = the walk's seed level, cut = the bounded walk's flush level.
    Computed from the FULL subtree depth — callers of the split stages
    (bounded walk on shipped levels + owner-side continuation) must pass
    these explicitly, since the requester only holds levels 0..cut.
    """
    fcap = caps[0]
    k0 = min(max(fcap.bit_length() - 1, 0), depth - 1)
    ma = cfg.resolved_near_refine()
    cut = min(depth - 1, k0 + ma) if ma else depth
    return k0, cut, bool(ma) and cut > k0


def _near_bounded(acc, visiting: FlatTree, own, tgt, cfg: SimConfig,
                  mp: int, rcp: str, interpret: bool, caps, k0: int,
                  cut: int, force=None):
    """The bounded (``near_refine_levels``-deep) part of a near stage: a
    cheap walk for ALL rows over the visiting subtree's levels 0..cut
    (never leaf data — plan_rows runs with lcap=0), a flush-to-COM sweep
    for every unresolved row beyond the ``near_rows`` cap, and the seam-row
    selection. Unresolved rows are distance-ranked, so only the farthest
    (where COM is benign) ever degrade.

    Returns ``(acc, ids, request)`` where ``request = (tgt_rows, own_min,
    own_max, frontier, valid)`` is everything the full-depth continuation
    needs — small enough to ship to the subtree's owner (_near_deep_serve)
    instead of shipping the subtree's leaf tiles here.
    """
    fcap, _ = caps
    cols, frontier, valid = plan_rows(
        visiting, own, cfg.theta, fcap, 0, cfg.tree_arity,
        multipole=mp, max_levels=cut - k0, return_frontier=True)
    g = own.aabb_min.shape[0]
    r = min(g, cfg.near_rows or max(64, g // 16))
    deep = jnp.any(valid, axis=1)
    root = visiting.levels[0]
    _, _, d2 = _group_node_d2(own.aabb_min, own.aabb_max,
                              root.aabb_min[0], root.aabb_max[0],
                              root.com[0])
    order = jnp.argsort(jnp.where(deep, d2, jnp.float32(jnp.inf)))
    ids = order[:r]
    rank = jnp.argsort(order)
    flush_rows = deep & (rank >= r)
    lvl = visiting.levels[cut]
    rec = (lvl.packed_quad if mp == 2 else lvl.packed)[frontier]
    fm = flush_rows[:, None] & valid
    cols = list(cols)
    cols[0] = jnp.concatenate([cols[0], rec[..., 4]], 1)
    cols[1] = jnp.concatenate([cols[1], rec[..., 5]], 1)
    cols[2] = jnp.concatenate([cols[2], jnp.where(fm, rec[..., 6], 0.0)], 1)
    if mp == 2:
        z = jnp.zeros_like(rec[..., 6])
        for k in range(3, 6):
            cols[k] = jnp.concatenate([cols[k], z], 1)
    acc = acc + (force or _grouped_force)(
        tgt, *cols[:3], softening2=cfg.softening2, rcp=rcp,
        interpret=interpret, src_q=tuple(cols[3:]) if mp == 2 else None)
    # valid travels as int8: the request crosses the ICI (ppermute), and
    # pred-typed collectives are the one dtype no other exchange in this
    # repo exercises — int8 is the safe wire format.
    request = (tgt[ids], own.aabb_min[ids], own.aabb_max[ids],
               frontier[ids], valid[ids].astype(jnp.int8))
    return acc, ids, request


def _near_deep_serve(tree: FlatTree, request, cfg: SimConfig, mp: int,
                     rcp: str, interpret: bool, caps, cut: int,
                     force=None):
    """Full-depth continuation of a bounded near walk, run against ``tree``
    — which is the subtree the request's frontier indices refer to: the
    requester's ``visiting`` in the same-device case, or the LOCAL tree on
    the owning device in the compute-to-data exchange (identical arrays,
    so the arithmetic is bitwise the same wherever it runs)."""
    fcap, lcap = caps
    tgt_rows, own_min, own_max, frontier, valid = request
    deep_cols = plan_rows(
        tree, SeamRows(own_min, own_max), cfg.theta, fcap, lcap,
        cfg.tree_arity, multipole=mp,
        seed=(cut, frontier, valid != 0))
    return (force or _grouped_force)(
        tgt_rows, *deep_cols[:3], softening2=cfg.softening2,
        rcp=rcp, interpret=interpret,
        src_q=deep_cols[3:] if mp == 2 else None)


def _near_stage(acc, visiting: FlatTree, own, tgt, cfg: SimConfig,
                mp: int, rcp: str, interpret: bool, caps=None, force=None):
    """One full-quality visiting-subtree stage, with optional row
    refinement: a cheap ``near_refine_levels``-deep bounded walk runs for
    ALL rows (_near_bounded), then a full-depth continuation for only the
    ``near_rows`` closest rows whose frontier is still open (the
    Morton-seam rows; most rows accept a neighbor subtree within a few
    levels) — _near_deep_serve. Pure per-device compute (no collectives),
    so the suite's single-chip proxy times this exact function; the
    distributed step splits the same two pieces across the ICI instead
    (bounded walk at the targets, continuation at the data — see
    bh_distributed_accel). ``caps``: (frontier, leaf) override — the
    caller may run near stages at a coarser row granularity than the local
    walk, with leaf caps scaled to the row size.
    """
    caps = caps if caps is not None else cfg.resolved_caps()
    fcap, lcap = caps
    k0, cut, refine = _near_geometry(cfg, caps, visiting.depth)
    if not refine:
        planned = plan_rows(visiting, own, cfg.theta, fcap, lcap,
                            cfg.tree_arity, multipole=mp)
        return acc + (force or _grouped_force)(
            tgt, *planned[:3], softening2=cfg.softening2, rcp=rcp,
            interpret=interpret, src_q=planned[3:] if mp == 2 else None)
    acc, ids, request = _near_bounded(acc, visiting, own, tgt, cfg, mp,
                                      rcp, interpret, caps, k0, cut,
                                      force=force)
    acc_deep = _near_deep_serve(visiting, request, cfg, mp, rcp,
                                interpret, caps, cut, force=force)
    return acc.at[ids].add(acc_deep)


def bh_distributed_accel(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                         axis: str = AXIS, config: SimConfig | None = None,
                         extra_pairs=(), force=None) -> jax.Array:
    """Distributed-BH acceleration for an already-distributed state.

    ``pos``/``mass`` are sharded over ``axis`` with each shard locally
    Morton-ordered (``distribute_state``). Returns accelerations in the SAME
    (sharded, sorted) order — the step keeps the state in sorted order, so
    no unsort/gather of full N ever happens.

    ``extra_pairs``: static seam-stage matchings from ``adjacency_stages``
    (physics-quality forest mode); each runs one additional full near stage
    and the matched subtrees are emptied out of the forest walk.

    ``force``: optional sweep-kernel override with _grouped_force's
    signature — parallel/bh_distributed_grad.py substitutes the
    differentiable sweep (ops.traversal_grad.grouped_force_diff) to make
    this whole staged pipeline a jax.grad-able function.
    """
    cfg = config or SimConfig(force_path="bh")
    n_dev = mesh.shape[axis]
    interpret = jax.default_backend() == "cpu"
    mp = cfg.resolved_multipole()
    rcp = cfg.resolved_rcp(bh=True)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    # forest mode needs ≥4 devices to have any ring-far subtree at all.
    forest = cfg.resolved_far_mode() == "forest" and n_dev >= 4
    if forest and resolved_seam_stages(cfg) and not extra_pairs:
        # Physics quality (θ<2) REQUIRES the adjacency seam stages — flush
        # error at the forest cut would break the <1e-3 budget (the
        # resolved_seam_stages docstring). A caller that didn't thread
        # adjacency_stages through ``extra_pairs`` (DistributedWorld and
        # the dryrun do; a direct bh_distributed_accel call may not) falls
        # back to the exact ring sweep rather than silently degrading.
        forest = False
    covered_np = None
    if forest and extra_pairs:
        covered_np = np.zeros((n_dev, n_dev), bool)
        for d in range(n_dev):
            covered_np[d, [d, (d + 1) % n_dev, (d - 1) % n_dev]] = True
        for matching in extra_pairs:
            for s, d in matching:
                covered_np[d, s] = True

    def local(pos_l, mass_l):
        tree = summarize_sorted(pos_l, mass_l, leaf_size=cfg.leaf_size,
                                unweighted_leaf_com=cfg.unweighted_leaf_com)
        n_leaves, S, _ = tree.leaf_pos.shape
        pl_ = max(1, min(cfg.plan_leaves, n_leaves))
        while n_leaves % pl_:
            pl_ //= 2
        own = tree.levels[tree.depth - (pl_.bit_length() - 1)]
        tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)

        acc = jnp.zeros((n_leaves // pl_, pl_ * S, 2), jnp.float32)

        def sweep(acc, planned):
            return acc + (force or _grouped_force)(
                tgt, *planned[:3], softening2=cfg.softening2, rcp=rcp,
                interpret=interpret,
                src_q=planned[3:] if mp == 2 else None)

        if forest:
            # Local at full depth; the two Morton-neighbor subtrees with
            # row refinement (_near_stage); ALL ring-far subtrees in one
            # bounded walk over the gathered coarse forest (_gather_forest).
            fcap, lcap = cfg.resolved_caps()
            back = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            acc = sweep(acc, plan_rows(tree, own, cfg.theta, fcap, lcap,
                                       cfg.tree_arity, multipole=mp))
            # Near-stage rows: 8 leaves in the θ≥2 regime (finer rows double
            # the refined stage's planner rows and halve its sweep tiles —
            # measured 6.7 -> 14.8 ms at a 1M shard when the local walk
            # moved to pl=4); at physics quality the rows match the local
            # plan granularity — coarse 8-leaf rows overflowed the frontier
            # on dense seams and cost a 1.5e-3 p99 error tail (COM
            # fallback), vs 3e-7 at plan granularity. Leaf caps scale with
            # the row size.
            base_rows = NEAR_ROW_LEAVES if cfg.theta >= 2.0 else 1
            pln = max(pl_, min(base_rows, n_leaves))
            while n_leaves % pln:
                pln //= 2
            own_n = tree.levels[tree.depth - (pln.bit_length() - 1)]
            tgt_n = tree.leaf_pos.reshape(n_leaves // pln, pln * S, 2)
            ncaps = (fcap, max(lcap, 4 * pln))
            stage_perms = [perm, back] + [list(m) for m in extra_pairs]
            k0n, cutn, refine = _near_geometry(cfg, ncaps, tree.depth)
            if refine and cfg.near_remote:
                # Compute-to-data near stages: the bounded walk needs only
                # the subtree's levels 0..cut (plan_rows lcap=0 — no leaf
                # data), so ship THOSE (KBs) instead of the whole subtree
                # block (≈ the shard's own size). The unresolved seam rows'
                # targets travel BACK to the subtree's owner, which runs
                # the full-depth continuation against its LOCAL tree
                # (bitwise-identical arithmetic — same arrays, same seeded
                # walk) and returns just the row accelerations. Per-stage
                # ICI payload: full subtree ≈13 MB → levels + seam targets
                # + results ≈1 MB at a 1M shard.
                top = FlatTree(
                    levels=list(tree.levels[:cutn + 1]),
                    leaf_pos=jnp.zeros((1, S, 2), jnp.float32),
                    leaf_mass=jnp.zeros((1, S), jnp.float32))
                for sperm in stage_perms:
                    # Devices outside a seam matching receive all-zero
                    # levels from the ppermute: zero count ⇒ nothing
                    # opened, zero mass ⇒ zero emitted force — the stage
                    # is a cheap no-op for them (SPMD would have them
                    # idle regardless).
                    inv = [(d, s) for (s, d) in sperm]
                    vis_top = jax.tree.map(
                        lambda x: jax.lax.ppermute(x, axis, sperm), top)
                    acc_n, ids, req = _near_bounded(
                        jnp.zeros(tgt_n.shape, jnp.float32), vis_top,
                        own_n, tgt_n, cfg, mp, rcp, interpret, ncaps,
                        k0n, cutn, force=force)
                    req = jax.tree.map(
                        lambda x: jax.lax.ppermute(x, axis, inv), req)
                    served = _near_deep_serve(tree, req, cfg, mp, rcp,
                                              interpret, ncaps, cutn,
                                              force=force)
                    acc_back = jax.lax.ppermute(served, axis, sperm)
                    acc_n = acc_n.at[ids].add(acc_back)
                    acc = acc + acc_n.reshape(acc.shape)
            else:
                for sperm in stage_perms:
                    # near_refine_levels=0: the full-depth walk needs the
                    # visiting subtree's leaf tiles here — ship the whole
                    # block (the round-2 protocol).
                    visiting = jax.tree.map(
                        lambda x: jax.lax.ppermute(x, axis, sperm), tree)
                    acc_n = _near_stage(
                        jnp.zeros(tgt_n.shape, jnp.float32), visiting,
                        own_n, tgt_n, cfg, mp, rcp, interpret, caps=ncaps,
                        force=force)
                    acc = acc + acc_n.reshape(acc.shape)
            ftree = _gather_forest(tree, axis, n_dev, cfg.forest_levels,
                                   covered_np=covered_np)
            ff = max(16, 1 << max(0, (n_dev - 1).bit_length()))
            k0 = min(max(ff.bit_length() - 1, 0), ftree.depth - 1)
            # Coarse rows for the forest walk: far subtrees resolve high
            # in the tree, so one planning row per 32 leaves costs 4× fewer
            # planner gathers at identical sweep pair count; coarser group
            # AABBs only make the conservative walk open MORE (quality ≥).
            # 32 (s=2048) is the largest row the sweep's scoped-VMEM model
            # admits (the 4 (s,gb) column blocks grow with s).
            plf = max(pl_, min(FOREST_ROW_LEAVES, n_leaves))
            while n_leaves % plf:
                plf //= 2
            own_f = tree.levels[tree.depth - (plf.bit_length() - 1)]
            tgt_f = tree.leaf_pos.reshape(n_leaves // plf, plf * S, 2)
            planned = plan_rows(ftree, own_f, cfg.theta, ff, 0,
                                arity=2, multipole=mp,
                                max_levels=ftree.depth - k0)
            acc_f = (force or _grouped_force)(
                tgt_f, *planned[:3], softening2=cfg.softening2, rcp=rcp,
                interpret=interpret,
                src_q=planned[3:] if mp == 2 else None)
            acc = acc + acc_f.reshape(acc.shape)
        else:
            visiting = tree
            for s in range(n_dev):
                if s > 0:
                    visiting = jax.tree.map(
                        lambda x: jax.lax.ppermute(x, axis, perm), visiting)
                fcap, lcap = _stage_caps(cfg, min(s, n_dev - s), n_dev)
                planned = plan_rows(visiting, own, cfg.theta, fcap, lcap,
                                    cfg.tree_arity, multipole=mp)
                acc = sweep(acc, planned)
        return acc.reshape(n_leaves * S, 2)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis)),
                      out_specs=P(axis, None), check_vma=False)
    return f(pos, mass)


def bh_distributed_total_energy(state: ParticleState, mesh: Mesh,
                                config: SimConfig, axis: str = AXIS,
                                extra_pairs=()):
    """O(N·C/P) psum'd total energy: the distributed θ-consistent cadence
    diagnostic (SURVEY §5 telemetry row, src/main.rs:74-79,148-156).

    Same staging as ``bh_distributed_accel`` — local subtree, the two
    Morton-neighbor subtrees, seam matchings from ``extra_pairs``, the
    coarse forest for everything ring-far (or the subtree ring when forest
    mode is off) — but the planned source columns feed the counterpart
    pair potential (ops/energy.bh_potential_from_columns) instead of the
    force kernel, mirroring the single-chip ``ops.bh_total_energy``.
    Differences from the force pass, both fine at diagnostic cadence:

    - near stages ship the WHOLE visiting subtree block (≈ the shard size,
      ~13 MB at a 1M shard) instead of the compute-to-data level protocol —
      a per-cadence cost, not per-step;
    - plans run monopole, un-refined, at the local plan granularity: the
      potential approximation is θ-consistent with the forces, so its
      step-to-step DRIFT tracks the integrator like the exact evaluation
      (tests/test_energy.py exactness classes apply per stage).

    vs the exact ring sweep (parallel.sharded_total_energy, O(N²/P) per
    device): at the 16.7M flagship that is ~1.8e13 pairs/device ≈ tens of
    seconds per evaluation; this is O(N·C/P) ≈ milliseconds.

    The jitted evaluator is memoized on (mesh, config, axis, extra_pairs)
    — the ``_step_fns`` pattern — so a cadence of evaluations (EnergyMeter
    fires this every ``--energy-every`` steps) compiles ONCE per seam set
    instead of re-tracing a fresh shard_map closure per call (a full
    recompile over the serial tunnel, minutes at flagship scale).
    """
    f = _energy_fn(mesh, config, axis, tuple(extra_pairs))
    pe, ke = f(state.pos, state.vel, state.mass)
    return {"potential_energy": pe, "kinetic_energy": ke,
            "total_energy": pe + ke}


@functools.lru_cache(maxsize=32)
def _energy_fn(mesh: Mesh, config: SimConfig, axis: str, extra_pairs):
    """The compiled core of bh_distributed_total_energy: a jitted
    shard_map over (pos, vel, mass) → replicated (pe, ke). Cached so the
    jit cache survives across cadence evaluations and seam-set changes."""
    from nbody_simulation_tpu.ops.energy import bh_potential_from_columns

    cfg = config
    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    forest = cfg.resolved_far_mode() == "forest" and n_dev >= 4
    if forest and resolved_seam_stages(cfg) and not extra_pairs:
        forest = False      # same quality gate as bh_distributed_accel
    covered_np = None
    if forest and extra_pairs:
        covered_np = np.zeros((n_dev, n_dev), bool)
        for d in range(n_dev):
            covered_np[d, [d, (d + 1) % n_dev, (d - 1) % n_dev]] = True
        for matching in extra_pairs:
            for s, d in matching:
                covered_np[d, s] = True

    def local(pos_l, vel_l, mass_l):
        tree = summarize_sorted(pos_l, mass_l, leaf_size=cfg.leaf_size,
                                unweighted_leaf_com=cfg.unweighted_leaf_com)
        n_leaves, S, _ = tree.leaf_pos.shape
        pl_ = max(1, min(cfg.plan_leaves, n_leaves))
        while n_leaves % pl_:
            pl_ //= 2
        own = tree.levels[tree.depth - (pl_.bit_length() - 1)]
        tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)
        tgtm = tree.leaf_mass.reshape(n_leaves // pl_, pl_ * S)
        fcap, lcap = cfg.resolved_caps()

        def pot(planned):
            return bh_potential_from_columns(
                tgtm, tgt, *planned[:3], softening2=cfg.softening2)

        if forest:
            u = pot(plan_rows(tree, own, cfg.theta, fcap, lcap,
                              cfg.tree_arity, multipole=1))
            back = [(i, (i - 1) % n_dev) for i in range(n_dev)]
            for sperm in [perm, back] + [list(m) for m in extra_pairs]:
                visiting = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, axis, sperm), tree)
                u = u + pot(plan_rows(visiting, own, cfg.theta, fcap,
                                      max(lcap, 4 * pl_), cfg.tree_arity,
                                      multipole=1))
            ftree = _gather_forest(tree, axis, n_dev, cfg.forest_levels,
                                   covered_np=covered_np)
            ff = max(16, 1 << max(0, (n_dev - 1).bit_length()))
            k0 = min(max(ff.bit_length() - 1, 0), ftree.depth - 1)
            u = u + pot(plan_rows(ftree, own, cfg.theta, ff, 0, arity=2,
                                  multipole=1,
                                  max_levels=ftree.depth - k0))
        else:
            u = jnp.float32(0.0)
            visiting = tree
            for s in range(n_dev):
                if s > 0:
                    visiting = jax.tree.map(
                        lambda x: jax.lax.ppermute(x, axis, perm), visiting)
                f_s, l_s = _stage_caps(cfg, min(s, n_dev - s), n_dev)
                u = u + pot(plan_rows(visiting, own, cfg.theta, f_s, l_s,
                                      cfg.tree_arity, multipole=1))
        pe = jax.lax.psum(u, axis)
        ke = jax.lax.psum(
            jnp.sum(jnp.float32(0.5) * mass_l * jnp.sum(vel_l ** 2, -1)),
            axis)
        return pe, ke

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(), P()), check_vma=False))


def make_distributed_bh_step(mesh: Mesh, config: SimConfig,
                             axis: str = AXIS, extra_pairs=()):
    """Full multi-chip distributed-BH step: local re-sort (amortized over
    ``config.resort_every`` like the single-chip World) → local subtree →
    ring/forest force sweep → integrate (semi-implicit Euler, or leapfrog
    with two distributed force evaluations when ``config.integrator`` says
    so — same contract as World). Jitted, donated; per-device memory
    O(N/P) (visiting subtrees + the KB-scale coarse forest in flight).

    Returns a callable with a host-side step counter: every
    ``resort_every``-th call runs the locally-sorting variant, the others
    reuse the stale local order (summaries still rebuild from live
    positions each step — the conservative walk absorbs looser AABBs,
    exactly the single-chip ``resort_every`` contract, ops/tree.py).

    The jitted step pair is memoized on (mesh, config, axis, extra_pairs):
    a rebalance whose seam adjacency flips BETWEEN already-seen matching
    sets swaps to the already-compiled program instead of recompiling over
    the serial tunnel (minutes at flagship scale — the hazard
    repartition._cached solves the same way). Only the host-side cadence
    counter is fresh per call, so concurrent worlds never share state.
    """
    step_resort, step_stale = _step_fns(mesh, config, axis,
                                        tuple(extra_pairs))
    every = max(1, config.resort_every)
    counter = [0]

    def step(state: ParticleState) -> ParticleState:
        fn = step_resort if counter[0] % every == 0 else step_stale
        counter[0] += 1
        return fn(state)

    # After a rebalance the state is freshly globally sorted; callers reset
    # the resort cadence instead of rebuilding the closure (a rebuild
    # discards the jit caches and forces a full recompile at unchanged
    # shapes).
    def reset() -> None:
        counter[0] = 0

    step.reset = reset
    return step


@functools.lru_cache(maxsize=32)
def _step_fns(mesh: Mesh, config: SimConfig, axis: str, extra_pairs):
    """The compiled core of make_distributed_bh_step: (resort, stale) jitted
    step functions. Cached so their jit caches survive seam-set changes."""
    cfg = config
    fdt = np.float32(cfg.dt)
    mbits = cfg.resolved_morton_bits()

    def local_sort(pos_l, vel_l, mass_l):
        return morton_sort_state(pos_l, vel_l, mass_l, cfg.world_size,
                                 bits=mbits)

    sort_sharded = jax.shard_map(
        local_sort, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis)))

    def make(resort: bool):
        # Donation is safe on BOTH variants despite the pallas-donation
        # hazard (models/world.py:137): every sweep operand is either a
        # planner output (fresh buffers) or the (S, G)-transposed target
        # columns — the transpose is copy-producing, so no donated buffer
        # aliases a pallas_call input. Measured no stall (t_local 12 ms at
        # a 1M shard).
        @functools.partial(jax.jit, donate_argnums=0)
        def step(state: ParticleState) -> ParticleState:
            if resort:
                spos, svel, smass = sort_sharded(state.pos, state.vel,
                                                 state.mass)
            else:
                spos, svel, smass = state.pos, state.vel, state.mass
            acc = bh_distributed_accel(spos, smass, mesh, axis=axis,
                                       config=cfg, extra_pairs=extra_pairs)
            if cfg.integrator == "leapfrog":
                v_half = svel + acc * (fdt * np.float32(0.5))
                pos = spos + v_half * fdt
                acc2 = bh_distributed_accel(pos, smass, mesh, axis=axis,
                                            config=cfg,
                                            extra_pairs=extra_pairs)
                vel = v_half + acc2 * (fdt * np.float32(0.5))
            else:
                vel = svel + acc * fdt
                pos = spos + vel * fdt
            return state.replace(pos=pos, vel=vel, mass=smass)
        return step

    return make(True), make(False)

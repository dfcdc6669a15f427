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

from nbody_simulation_tpu.ops.allpairs import _allpairs_kernel
from nbody_simulation_tpu.ops.tree import FlatTree, build_tree


def accept_node_scalar(p, nmin, nmax, com, theta):
    """The reference's per-particle criterion (src/main.rs:370-373), kept
    for tests: accept iff NOT contains(p) and max(w,h)^2 < d2(p,com)·θ²."""
    contains = ((p[1] > nmin[1]) & (p[0] > nmin[0])
                & (p[0] < nmax[0]) & (p[1] < nmax[1]))
    size = nmax - nmin
    s2 = jnp.maximum(size[0], size[1]) ** 2
    d2 = (p[0] - com[0]) ** 2 + (p[1] - com[1]) ** 2
    return (~contains) & (s2 < d2 * theta * theta)


def _accept_group(gmin, gmax, nmin, nmax, ncom, theta):
    """Group-conservative acceptance. gmin/gmax: (G,1,2); node data (G,K,2)."""
    disjoint = ((gmax[..., 0] <= nmin[..., 0]) | (gmin[..., 0] >= nmax[..., 0])
                | (gmax[..., 1] <= nmin[..., 1]) | (gmin[..., 1] >= nmax[..., 1]))
    size = nmax - nmin
    s2 = jnp.maximum(size[..., 0], size[..., 1]) ** 2
    dx = jnp.maximum(jnp.maximum(gmin[..., 0] - ncom[..., 0],
                                 ncom[..., 0] - gmax[..., 0]), 0.0)
    dy = jnp.maximum(jnp.maximum(gmin[..., 1] - ncom[..., 1],
                                 ncom[..., 1] - gmax[..., 1]), 0.0)
    d2 = dx * dx + dy * dy
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


def bh_plan_sources(tree: FlatTree, theta: float, frontier_cap: int,
                    leaf_cap: int, arity: int = 2, plan_leaves: int = 1):
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
    return plan_rows(tree, own_level, theta, frontier_cap, leaf_cap, arity)


def plan_rows(tree: FlatTree, own, theta: float, frontier_cap: int,
              leaf_cap: int, arity: int = 2):
    """The planner over explicit own-AABB rows.

    ``own`` holds one AABB per planning row (a Level or slice of one);
    candidate records and leaf tiles are gathered from ``tree``. The row
    count need not equal the leaf count — the sharded walk
    (parallel/bh_sharded.py) plans a slice of the rows against the full
    tree through this same entry.
    """
    depth = tree.depth
    S = tree.leaf_pos.shape[1]
    F = frontier_cap
    g_rows = own.aabb_min.shape[0]
    gmin = own.aabb_min[:, None, :]     # (G',1,2) group AABB
    gmax = own.aabb_max[:, None, :]

    # Deepest level whose full width fits the frontier.
    k0 = min(max(F.bit_length() - 1, 0), depth - 1) if depth > 0 else 0

    src_x, src_y, src_m = [], [], []
    width = 1 << k0
    frontier = jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[None, :],
                                (g_rows, width))
    if width < F:
        frontier = jnp.concatenate(
            [frontier, jnp.zeros((g_rows, F - width), jnp.int32)], axis=1)
    valid = (jnp.arange(F, dtype=jnp.int32)[None, :] < width)
    valid = jnp.broadcast_to(valid, (g_rows, F))
    leaf_ids = jnp.zeros((g_rows, 1), jnp.int32)
    leaf_valid = jnp.ones((g_rows, 1), dtype=bool)

    lvl = k0
    while lvl < depth:
        step = 2 if (arity == 4 and lvl + 2 <= depth) else 1
        fan = 1 << step
        child_lv = tree.levels[lvl + step]
        cand = jnp.concatenate([frontier * fan + i for i in range(fan)],
                               axis=1)                          # (G, fan*F)
        cvalid = jnp.concatenate([valid] * fan, axis=1)
        rec = child_lv.packed[cand]                             # ONE gather
        nmin = rec[..., 0:2]
        nmax = rec[..., 2:4]
        ncom = rec[..., 4:6]
        nmassf = rec[..., 6]
        nonempty = rec[..., 7] > 0
        accept = cvalid & _accept_group(gmin, gmax, nmin, nmax, ncom, theta)
        opened = cvalid & ~accept & nonempty

        if lvl + step < depth:
            frontier, valid, overflow = _compact(opened, cand, F)
        else:
            leaf_ids, leaf_valid, overflow = _compact(opened, cand, leaf_cap)
        use_com = accept | overflow  # overflow → COM fallback, never dropped

        src_x.append(ncom[..., 0])
        src_y.append(ncom[..., 1])
        src_m.append(jnp.where(use_com, nmassf, 0.0))
        lvl += step

    # Leaf tiles: gather (G', L, S) particle data; invalid slots masked.
    lp = tree.leaf_pos[leaf_ids]                        # (G', L, S, 2)
    lm = tree.leaf_mass[leaf_ids] * leaf_valid[..., None]
    L = leaf_ids.shape[1]
    src_x.append(lp[..., 0].reshape(g_rows, L * S))
    src_y.append(lp[..., 1].reshape(g_rows, L * S))
    src_m.append(lm.reshape(g_rows, L * S))

    return (jnp.concatenate(src_x, axis=1),
            jnp.concatenate(src_y, axis=1),
            jnp.concatenate(src_m, axis=1))


def _grouped_force(tgt_pos: jax.Array, src_x, src_y, src_m,
                   softening2: float, rcp: str, interpret: bool,
                   tile_j: int = 4096) -> jax.Array:
    """Targets (G, S, 2) vs per-group sources (G, C) → accel (G, S, 2)."""
    if interpret:
        rcp = "exact"  # pl.reciprocal(approx) has no interpreter lowering
    g, s, _ = tgt_pos.shape
    c = src_x.shape[1]
    # Pick a lane-aligned j tile, then pad C to a multiple of it with inert
    # (zero-mass) sources. The (s, tj) tile area is capped at ~1M f32
    # elements (Mosaic keeps ~3 full-tile temporaries live; 3x4 MB fits the
    # 16 MB scoped-VMEM budget), and tj is chosen to minimize padding waste.
    def ceil_to(x, m):
        return -(-x // m) * m

    tile_cap = min(tile_j, max(128, ((1 << 20) // s) // 128 * 128))
    n_tiles = max(1, -(-c // tile_cap))
    tj = ceil_to(-(-c // n_tiles), 128)
    target_c = n_tiles * tj
    if target_c != c:
        z = jnp.zeros((g, target_c - c), jnp.float32)
        src_x = jnp.concatenate([src_x, z], 1)
        src_y = jnp.concatenate([src_y, z], 1)
        src_m = jnp.concatenate([src_m, z], 1)
        c = target_c

    x_col = tgt_pos[..., 0].reshape(g * s, 1)
    y_col = tgt_pos[..., 1].reshape(g * s, 1)
    # Sources flattened to (1, G*C): Mosaic requires the sublane block dim to
    # divide 8 or equal the array dim, so per-group rows can't be blocked as
    # (1, tj) out of (G, C) — but in a flat row, group g's tile j is simply
    # block g*(C/tj)+j.
    src_x = src_x.reshape(1, g * c)
    src_y = src_y.reshape(1, g * c)
    src_m = src_m.reshape(1, g * c)
    jt = c // tj  # j-tiles per group
    kernel = functools.partial(_allpairs_kernel, softening2=softening2,
                               rcp=rcp)
    grid = (g, jt)
    ax, ay = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, i * jt + j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, i * jt + j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tj), lambda i, j: (0, i * jt + j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g * s, 1), jnp.float32),
            jax.ShapeDtypeStruct((g * s, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_col, y_col, src_x, src_y, src_m)
    return jnp.concatenate([ax, ay], 1).reshape(g, s, 2)


@functools.partial(jax.jit,
                   static_argnames=("theta", "softening2", "frontier_cap",
                                    "leaf_cap", "interpret", "arity",
                                    "plan_leaves"))
def bh_accel_sorted(tree: FlatTree, theta: float = 50.0,
                    softening2: float = 1e-3, frontier_cap: int = 32,
                    leaf_cap: int = 16, interpret: bool = False,
                    arity: int = 2, plan_leaves: int = 1) -> jax.Array:
    """Accelerations for all (sorted, padded) particles in the tree.

    Returns f32[n_leaves*leaf_size, 2] in sorted order.
    """
    if jax.default_backend() == "cpu":
        interpret = True
    n_leaves, S, _ = tree.leaf_pos.shape
    pl_ = max(1, min(plan_leaves, n_leaves))
    while n_leaves % pl_:
        pl_ //= 2
    src_x, src_y, src_m = bh_plan_sources(tree, theta, frontier_cap,
                                          leaf_cap, arity=arity,
                                          plan_leaves=pl_)
    tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)
    acc = _grouped_force(tgt, src_x, src_y, src_m,
                         softening2=softening2, rcp="newton",
                         interpret=interpret)
    return acc.reshape(n_leaves * S, 2)


def bh_accel(pos: jax.Array, mass: jax.Array, *, theta: float = 50.0,
             softening2: float = 1e-3, leaf_size: int = 64,
             world_size: float = 100_000.0, unweighted_leaf_com: bool = True,
             frontier_cap: int = 32, leaf_cap: int = 16, arity: int = 2,
             plan_leaves: int = 1,
             group_chunk: int | None = None) -> jax.Array:
    """Full Barnes-Hut acceleration: sort + build + plan + sweep + unsort.

    Returns accelerations in the ORIGINAL particle order. ``group_chunk`` is
    accepted for API compatibility and ignored (the planning pass is cheap
    enough to run unchunked).
    """
    n = pos.shape[0]
    tree, order = build_tree(pos, mass, leaf_size=leaf_size,
                             world_size=world_size,
                             unweighted_leaf_com=unweighted_leaf_com)
    acc_sorted = bh_accel_sorted(tree, theta=theta, softening2=softening2,
                                 frontier_cap=frontier_cap, leaf_cap=leaf_cap,
                                 arity=arity, plan_leaves=plan_leaves)
    return jnp.zeros((n, 2), jnp.float32).at[order].set(acc_sorted[:n])


def bh_accel_fn(config):
    """World adapter: (pos, mass) -> accel from a SimConfig."""
    return functools.partial(
        bh_accel, theta=config.theta, softening2=config.softening2,
        leaf_size=config.leaf_size, world_size=config.world_size,
        unweighted_leaf_com=config.unweighted_leaf_com,
        frontier_cap=config.resolved_caps()[0],
        leaf_cap=config.resolved_caps()[1],
        arity=config.tree_arity, plan_leaves=config.plan_leaves)

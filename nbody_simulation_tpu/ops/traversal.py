"""Barnes-Hut traversal as level-synchronous masked BFS over the flat BVH.

The reference walks the tree recursively per particle (reference
src/main.rs:348-386): a node's COM is accepted when the particle is outside
the node AABB **and** ``max(w,h)^2 < d2(particle, com) * THETA^2``
(src/main.rs:370-373, the inverted s/d<θ convention with θ=50 default);
otherwise both children are visited, and leaves do the exact per-particle
loop (src/main.rs:355-362).

TPU has no recursion or per-particle control flow, so this re-design walks
the tree once per **leaf group** (the 64 Morton-adjacent particles of one
leaf), breadth-first with fixed-capacity frontiers:

- the acceptance test is made *group-conservative*: the node must be
  disjoint from the group's AABB (⊇ "every particle outside": the
  reference's Rectangle::contains is strict, src/bvh_tree.rs:15-20, so
  touching boxes count as outside) and the theta test must hold at the
  minimum distance from the group AABB to the node COM. A node accepted for
  the group is accepted by every particle in it under the reference rule;
  nodes the reference would accept for *some* particles are opened instead,
  so the result is at least as accurate as the per-particle walk.
- accepted nodes contribute their (COM, total-mass) to all 64 group
  particles through the exact force law; opened nodes push their children
  into the next level's frontier; nodes reaching the leaf level land in a
  leaf list that is processed as dense 64×(leaf_cap·64) exact tiles.
- capacity overflow degrades gracefully: a node that cannot fit in the
  frontier/leaf list is **accepted** (COM approximation) rather than dropped,
  so forces are never lost; with caps ≥ level widths the walk is exact-BH.

Empty nodes (padding) have zero mass and zero-size AABBs at a far-away
point, so they are accepted everywhere and contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nbody_simulation_tpu.ops.force import pair_accel
from nbody_simulation_tpu.ops.tree import FlatTree, build_tree


def accept_node_scalar(p, nmin, nmax, com, theta):
    """The reference's per-particle criterion (src/main.rs:370-373), for
    tests: accept iff NOT contains(p) and max(w,h)^2 < d2(p,com)·θ²."""
    contains = ((p[1] > nmin[1]) & (p[0] > nmin[0])
                & (p[0] < nmax[0]) & (p[1] < nmax[1]))
    size = nmax - nmin
    s2 = jnp.maximum(size[0], size[1]) ** 2
    d2 = (p[0] - com[0]) ** 2 + (p[1] - com[1]) ** 2
    return (~contains) & (s2 < d2 * theta * theta)


def _accept_group(gmin, gmax, nmin, nmax, ncom, theta):
    """Group-conservative acceptance. All inputs broadcast to (..., 2)."""
    # Disjoint (touching counts, since contains is strict).
    disjoint = ((gmax[..., 0] <= nmin[..., 0]) | (gmin[..., 0] >= nmax[..., 0])
                | (gmax[..., 1] <= nmin[..., 1]) | (gmin[..., 1] >= nmax[..., 1]))
    size = nmax - nmin
    s2 = jnp.maximum(size[..., 0], size[..., 1]) ** 2
    # Min squared distance from the group AABB to the node COM.
    dx = jnp.maximum(jnp.maximum(gmin[..., 0] - ncom[..., 0],
                                 ncom[..., 0] - gmax[..., 0]), 0.0)
    dy = jnp.maximum(jnp.maximum(gmin[..., 1] - ncom[..., 1],
                                 ncom[..., 1] - gmax[..., 1]), 0.0)
    d2 = dx * dx + dy * dy
    return disjoint & (s2 < d2 * jnp.float32(theta * theta))


def _com_contribution(px, py, com, massf, softening2):
    """Accumulate accepted-node COM forces. px,py: (Gc,S); com: (Gc,K,2);
    massf: (Gc,K) with non-accepted entries zeroed. Returns (Gc,S,2)."""
    dx = com[:, None, :, 0] - px[:, :, None]
    dy = com[:, None, :, 1] - py[:, :, None]
    ax, ay = pair_accel(dx, dy, massf[:, None, :], softening2)
    return jnp.stack([ax.sum(-1), ay.sum(-1)], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("theta", "softening2", "frontier_cap",
                                    "leaf_cap", "group_chunk"))
def bh_accel_sorted(tree: FlatTree, theta: float = 50.0,
                    softening2: float = 1e-3, frontier_cap: int = 128,
                    leaf_cap: int = 64, group_chunk: int = 256) -> jax.Array:
    """Accelerations for all (sorted, padded) particles in the tree.

    Returns f32[n_leaves*leaf_size, 2] in sorted order.
    """
    depth = tree.depth
    n_leaves, S, _ = tree.leaf_pos.shape
    F = frontier_cap
    L = leaf_cap
    gc = min(group_chunk, n_leaves)
    assert n_leaves % gc == 0, (n_leaves, gc)
    leaves = tree.levels[depth]

    def chunk_fn(g0):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, g0, gc, 0)
        px = sl(tree.leaf_pos)[..., 0]          # (Gc, S)
        py = sl(tree.leaf_pos)[..., 1]
        gmin = sl(leaves.aabb_min)              # (Gc, 2) own-leaf AABB
        gmax = sl(leaves.aabb_max)
        acc = jnp.zeros((gc, S, 2), jnp.float32)

        # Frontier of nodes to OPEN at the current level.
        frontier = jnp.zeros((gc, F), jnp.int32)      # level-0 root = id 0
        valid = jnp.zeros((gc, F), dtype=bool).at[:, 0].set(True)

        for lvl in range(depth):
            child_lv = tree.levels[lvl + 1]
            cand = jnp.concatenate([frontier * 2, frontier * 2 + 1], axis=1)
            cvalid = jnp.concatenate([valid, valid], axis=1)      # (Gc, 2F)
            nmin = child_lv.aabb_min[cand]
            nmax = child_lv.aabb_max[cand]
            ncom = child_lv.com[cand]
            nmassf = child_lv.mass_i[cand].astype(jnp.float32)
            nonempty = child_lv.count[cand] > 0
            accept = cvalid & _accept_group(gmin[:, None, :], gmax[:, None, :],
                                            nmin, nmax, ncom, theta)
            opened = cvalid & ~accept & nonempty

            if lvl + 1 < depth:
                # Compact opened into the next frontier; overflow → accept.
                slot = jnp.cumsum(opened, axis=1) - 1
                overflow = opened & (slot >= F)
                store = opened & (slot < F)
                rows = jnp.arange(gc, dtype=jnp.int32)[:, None] * F
                flat_idx = jnp.where(store, rows + slot, gc * F)  # OOB → drop
                frontier = (jnp.zeros((gc * F,), jnp.int32)
                            .at[flat_idx.ravel()]
                            .set(cand.ravel(), mode="drop")
                            .reshape(gc, F))
                valid = (jnp.zeros((gc * F,), dtype=bool)
                         .at[flat_idx.ravel()]
                         .set(store.ravel(), mode="drop")
                         .reshape(gc, F))
                use_com = accept | overflow
            else:
                # Last level: opened nodes are leaves → leaf list.
                slot = jnp.cumsum(opened, axis=1) - 1
                overflow = opened & (slot >= L)
                store = opened & (slot < L)
                rows = jnp.arange(gc, dtype=jnp.int32)[:, None] * L
                flat_idx = jnp.where(store, rows + slot, gc * L)  # OOB → drop
                leaf_ids = (jnp.zeros((gc * L,), jnp.int32)
                            .at[flat_idx.ravel()]
                            .set(cand.ravel(), mode="drop")
                            .reshape(gc, L))
                leaf_valid = (jnp.zeros((gc * L,), dtype=bool)
                              .at[flat_idx.ravel()]
                              .set(store.ravel(), mode="drop")
                              .reshape(gc, L))
                use_com = accept | overflow

            acc = acc + _com_contribution(
                px, py, ncom, jnp.where(use_com, nmassf, 0.0), softening2)

        if depth == 0:
            # Degenerate single-leaf tree: exact within the only leaf.
            leaf_ids = jnp.zeros((gc, 1), jnp.int32)
            leaf_valid = jnp.ones((gc, 1), dtype=bool)
            L_eff = 1
        else:
            L_eff = L

        # Exact phase: dense (S) x (L_eff*S) tiles of the reference leaf loop.
        src_pos = tree.leaf_pos[leaf_ids].reshape(gc, L_eff * S, 2)
        src_mass = (tree.leaf_mass[leaf_ids]
                    * leaf_valid[..., None]).reshape(gc, L_eff * S)
        dx = src_pos[:, None, :, 0] - px[:, :, None]
        dy = src_pos[:, None, :, 1] - py[:, :, None]
        ax, ay = pair_accel(dx, dy, src_mass[:, None, :], softening2)
        acc = acc + jnp.stack([ax.sum(-1), ay.sum(-1)], axis=-1)
        return acc

    starts = jnp.arange(0, n_leaves, gc, dtype=jnp.int32)
    out = jax.lax.map(chunk_fn, starts)          # (n_chunks, Gc, S, 2)
    return out.reshape(n_leaves * S, 2)


def bh_accel(pos: jax.Array, mass: jax.Array, *, theta: float = 50.0,
             softening2: float = 1e-3, leaf_size: int = 64,
             world_size: float = 100_000.0, unweighted_leaf_com: bool = True,
             frontier_cap: int = 128, leaf_cap: int = 64,
             group_chunk: int = 256) -> jax.Array:
    """Full Barnes-Hut acceleration: sort + build + traverse + unsort.

    Returns accelerations in the ORIGINAL particle order.
    """
    n = pos.shape[0]
    tree, order = build_tree(pos, mass, leaf_size=leaf_size,
                             world_size=world_size,
                             unweighted_leaf_com=unweighted_leaf_com)
    acc_sorted = bh_accel_sorted(tree, theta=theta, softening2=softening2,
                                 frontier_cap=frontier_cap, leaf_cap=leaf_cap,
                                 group_chunk=min(group_chunk,
                                                 tree.leaf_pos.shape[0]))
    return jnp.zeros((n, 2), jnp.float32).at[order].set(acc_sorted[:n])


def bh_accel_fn(config):
    """World adapter: (pos, mass) -> accel from a SimConfig."""
    return functools.partial(
        bh_accel, theta=config.theta, softening2=config.softening2,
        leaf_size=config.leaf_size, world_size=config.world_size,
        unweighted_leaf_com=config.unweighted_leaf_com)

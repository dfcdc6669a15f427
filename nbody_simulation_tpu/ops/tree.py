"""Flat BVH over Morton-sorted particles: dense level arrays, no pointers.

TPU-native re-design of the reference's pointer BVH (reference
src/bvh_tree.rs:24-158): particles sorted in Z-order are grouped into
``leaf_size``-particle leaves; leaf count is padded to a power of two so
level ``l`` holds exactly ``2^l`` nodes and the children of node ``k`` are
``2k, 2k+1``. The bottom-up summarize pass (src/bvh_tree.rs:133-158) becomes
``log2`` reshape-reductions.

Per-node fields and their reference semantics:

- AABB min/max — the min/max fold of member positions
  (src/bvh_tree.rs:41-49, :58-66); padding particles are excluded.
- mass — summed in int32 and cast to f32 on use, exactly like the
  reference's u32 ``total_mass`` (src/bvh_tree.rs:118-131).
- COM — internal nodes are mass-weighted combinations of children
  (src/bvh_tree.rs:148-155); a LEAF's COM is the **unweighted mean of its
  positions** (src/bvh_tree.rs:98-116) — a reference quirk, reproduced when
  ``unweighted_leaf_com=True`` (default) and replaced by the mass-weighted
  mean otherwise.

Structural difference (by design, not an oversight): the reference splits at
the mean coordinate along the better-balancing axis; the Morton split is a
balanced positional split along alternating axes. Both are median-flavored
binary BVHs with ≤64-particle leaves; force-level parity is enforced by the
traversal criterion + force law, not by matching tree shapes bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.ops.morton import morton_order

BIG = np.float32(3.0e38)  # numpy scalar: a jnp constant at import
#     time would initialize the XLA backend before jax.distributed can run
# Empty nodes collapse to a far-away point: zero-size AABB (always passes the
# theta test) + zero mass (zero force), so they cost nothing to traverse.
EMPTY_POS = np.float32(2.0e5)


class Level(NamedTuple):
    aabb_min: jax.Array   # (2^l, 2)
    aabb_max: jax.Array   # (2^l, 2)
    com: jax.Array        # (2^l, 2)
    mass_i: jax.Array     # (2^l,) int32 — exact integer mass sum
    count: jax.Array      # (2^l,) int32 — real (non-padding) members
    quad: jax.Array       # (2^l, 3) f32 — mass-weighted second moments about
    #                       the stored COM: Σ m·(δxδx, δxδy, δyδy). Feeds the
    #                       optional quadrupole force correction (a capability
    #                       beyond the reference, needed for <1e-3 force error
    #                       at physics-quality θ — the monopole acceptance
    #                       error at θ=0.5 is inherently ~1.6e-3).

    @property
    def packed(self) -> jax.Array:
        """(2^l, 8) f32 record [min_x,min_y,max_x,max_y,com_x,com_y,mass,count]
        so the traversal planner gathers node data in ONE gather."""
        return jnp.concatenate([
            self.aabb_min, self.aabb_max, self.com,
            self.mass_i.astype(jnp.float32)[:, None],
            self.count.astype(jnp.float32)[:, None]], axis=1)

    @property
    def packed_quad(self) -> jax.Array:
        """(2^l, 11) f32 record: ``packed`` + [qxx, qxy, qyy] for the
        quadrupole sweep. A separate property so monopole walks never pay
        for gathering the moment columns."""
        return jnp.concatenate([self.packed, self.quad], axis=1)


class FlatTree(NamedTuple):
    """levels[0] = root ... levels[depth] = leaves; leaf data is the sorted
    particle arrays reshaped to (n_leaves, leaf_size)."""
    levels: list[Level]
    leaf_pos: jax.Array    # (n_leaves, leaf_size, 2) — sorted positions
    leaf_mass: jax.Array   # (n_leaves, leaf_size)

    @property
    def depth(self) -> int:
        return len(self.levels) - 1


def _leaf_level(pos3, mass2, unweighted_leaf_com: bool) -> Level:
    """pos3: (L, S, 2) sorted positions; mass2: (L, S)."""
    real = mass2 > 0
    real3 = real[..., None]
    aabb_min = jnp.min(jnp.where(real3, pos3, BIG), axis=1)
    aabb_max = jnp.max(jnp.where(real3, pos3, -BIG), axis=1)
    count = real.sum(axis=1, dtype=jnp.int32)
    mass_i = jnp.where(real, mass2, 0.0).astype(jnp.int32).sum(axis=1,
                                                               dtype=jnp.int32)
    if unweighted_leaf_com:
        num = jnp.where(real3, pos3, 0.0).sum(axis=1)
        den = jnp.maximum(count, 1).astype(jnp.float32)[:, None]
    else:
        w = jnp.where(real, mass2, 0.0)
        num = (pos3 * w[..., None]).sum(axis=1)
        den = jnp.maximum(w.sum(axis=1), jnp.float32(1e-30))[:, None]
    com = num / den
    empty = (count == 0)[:, None]
    # Second moments about the stored COM (whatever its convention).
    w = jnp.where(real, mass2, 0.0)
    d = pos3 - com[:, None, :]
    qxx = (w * d[..., 0] * d[..., 0]).sum(axis=1)
    qxy = (w * d[..., 0] * d[..., 1]).sum(axis=1)
    qyy = (w * d[..., 1] * d[..., 1]).sum(axis=1)
    return Level(
        aabb_min=jnp.where(empty, EMPTY_POS, aabb_min),
        aabb_max=jnp.where(empty, EMPTY_POS, aabb_max),
        com=jnp.where(empty, EMPTY_POS, com),
        mass_i=mass_i,
        count=count,
        quad=jnp.where(empty, 0.0, jnp.stack([qxx, qxy, qyy], axis=1)),
    )


def _combine(child: Level) -> Level:
    """Pairwise-combine level l+1 (2m nodes) into level l (m nodes) —
    the summarize pass of src/bvh_tree.rs:133-158."""
    m = child.aabb_min.shape[0] // 2

    def pair(x):
        return x.reshape(m, 2, *x.shape[1:])

    cmin, cmax = pair(child.aabb_min), pair(child.aabb_max)
    ccom, cmass, ccount = pair(child.com), pair(child.mass_i), pair(child.count)
    cquad = pair(child.quad)
    count = ccount.sum(axis=1)
    mass_i = cmass.sum(axis=1)
    massf = cmass.astype(jnp.float32)
    num = (ccom * massf[..., None]).sum(axis=1)
    den = jnp.maximum(mass_i.astype(jnp.float32), jnp.float32(1.0))[:, None]
    com = num / den
    # Parallel-axis combine: Q_p = Σ_c Q_c + m_c·(com_c − com_p)⊗(com_c − com_p).
    # Empty children contribute 0 (zero mass, zero Q).
    d = ccom - com[:, None, :]
    shift = jnp.stack([d[..., 0] * d[..., 0], d[..., 0] * d[..., 1],
                       d[..., 1] * d[..., 1]], axis=-1)
    quad = (cquad + massf[..., None] * shift).sum(axis=1)
    # Empty children sit at EMPTY_POS with zero size; min/max over them would
    # inflate the parent AABB toward EMPTY_POS, so mask them out.
    cempty = (ccount == 0)[..., None]
    aabb_min = jnp.min(jnp.where(cempty, BIG, cmin), axis=1)
    aabb_max = jnp.max(jnp.where(cempty, -BIG, cmax), axis=1)
    empty = (count == 0)[:, None]
    return Level(
        aabb_min=jnp.where(empty, EMPTY_POS, aabb_min),
        aabb_max=jnp.where(empty, EMPTY_POS, aabb_max),
        com=jnp.where(empty, EMPTY_POS, com),
        mass_i=mass_i,
        count=count,
        quad=jnp.where(empty, 0.0, quad),
    )


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@functools.partial(jax.jit, static_argnames=("leaf_size",
                                             "unweighted_leaf_com"))
def summarize_sorted(spos: jax.Array, smass: jax.Array,
                     leaf_size: int = 64,
                     unweighted_leaf_com: bool = True) -> FlatTree:
    """Build the flat BVH over ALREADY spatially-ordered particles.

    This is the bottom-up summarize pass alone (src/bvh_tree.rs:133-158
    semantics) — cheap reshape-reductions, no sort. Used every step when the
    Morton order is reused across steps (World resort_every > 1): AABBs,
    masses and COMs are always recomputed from the CURRENT positions, so
    forces stay exact-BH; a stale order only makes leaf AABBs overlap a bit
    more, which the conservative traversal handles by opening more nodes.
    """
    n = spos.shape[0]
    n_leaves = _next_pow2(-(-n // leaf_size))
    n_pad = n_leaves * leaf_size
    if n_pad != n:
        extra = n_pad - n
        spos = jnp.concatenate(
            [spos, jnp.full((extra, 2), EMPTY_POS, jnp.float32)])
        smass = jnp.concatenate([smass, jnp.zeros(extra, jnp.float32)])
    pos3 = spos.reshape(n_leaves, leaf_size, 2)
    mass2 = smass.reshape(n_leaves, leaf_size)

    levels = [_leaf_level(pos3, mass2, unweighted_leaf_com)]
    while levels[0].aabb_min.shape[0] > 1:
        levels.insert(0, _combine(levels[0]))

    return FlatTree(levels=levels, leaf_pos=pos3, leaf_mass=mass2)


@functools.partial(jax.jit, static_argnames=("leaf_size", "world_size",
                                             "unweighted_leaf_com",
                                             "morton_bits"))
def build_tree(pos: jax.Array, mass: jax.Array,
               leaf_size: int = 64, world_size: float = 100_000.0,
               unweighted_leaf_com: bool = True, morton_bits: int = 15):
    """Morton-sort the particles and build the flat BVH.

    Returns ``(tree, order)`` where ``order`` is the applied permutation
    (``sorted_x = x[order]``). Like the reference's in-place partition
    (src/bvh_tree.rs:74-76), the sorted order becomes the particle order for
    the remainder of the step.
    """
    order = morton_order(pos, mass, world_size, bits=morton_bits)
    tree = summarize_sorted(pos[order], mass[order], leaf_size=leaf_size,
                            unweighted_leaf_com=unweighted_leaf_com)
    return tree, order

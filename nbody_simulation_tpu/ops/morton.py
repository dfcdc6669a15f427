"""Morton (Z-order) codes and spatial sorting.

The reference builds its BVH by recursively partitioning the particle slice
in place (reference src/bvh_tree.rs:57-96), which both *orders* particles
spatially and defines the tree. The TPU-native equivalent: sort particles by
Morton code once per step (XLA sort), then treat contiguous 64-particle runs
as leaves of an implicit complete binary tree (ops/tree.py). Like the
reference, the particle array is physically reordered every step.

15 bits per axis (cell ≈ 3 world units at world_size=100000) so the
interleaved code fits in int32 with the sign bit free; padding particles
(mass <= 0) get key INT32_MAX so they always sort last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MORTON_BITS = 15
PAD_KEY = jnp.int32(2**31 - 1)


def _spread_bits(v: jax.Array) -> jax.Array:
    """Insert a 0 bit between each of the low 16 bits of v (int32)."""
    v = (v | (v << 8)) & jnp.int32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.int32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.int32(0x33333333)
    v = (v | (v << 1)) & jnp.int32(0x55555555)
    return v


def morton_encode(pos: jax.Array, mass: jax.Array,
                  world_size: float) -> jax.Array:
    """int32 Morton keys; padding (mass<=0) keys sort last."""
    scale = jnp.float32((1 << MORTON_BITS) / world_size)
    q = jnp.clip((pos * scale).astype(jnp.int32), 0, (1 << MORTON_BITS) - 1)
    code = (_spread_bits(q[:, 1]) << 1) | _spread_bits(q[:, 0])
    return jnp.where(mass > 0, code, PAD_KEY)


def morton_order(pos: jax.Array, mass: jax.Array,
                 world_size: float) -> jax.Array:
    """Stable permutation that sorts particles in Z-order, padding last."""
    return jnp.argsort(morton_encode(pos, mass, world_size), stable=True)

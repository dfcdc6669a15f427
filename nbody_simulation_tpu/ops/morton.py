"""Morton (Z-order) codes and spatial sorting.

The reference builds its BVH by recursively partitioning the particle slice
in place (reference src/bvh_tree.rs:57-96), which both *orders* particles
spatially and defines the tree. The TPU-native equivalent: sort particles by
Morton code once per step (XLA sort), then treat contiguous 64-particle runs
as leaves of an implicit complete binary tree (ops/tree.py). Like the
reference, the particle array is physically reordered every step.

Key depth is configurable (``bits`` per axis):

- ``bits <= 15``: one interleaved int32 key, one sort. Cell ≈ 3 world units
  at world_size=100000 — plenty for the reference's θ=50 regime, where the
  near field is a handful of leaves anyway.
- ``bits <= 24`` (physics-quality θ<2 default): the quantized coordinate is
  split into high/low halves and interleaved into TWO int32 words; the order
  is an LSD radix sort — stable-argsort by the low word, then by the high
  word. Cell ≈ 0.006 world units at bits=24, so dense cluster cores keep
  subdividing spatially instead of collapsing into one 3-unit cell (which
  made every leaf in the core overlap and forced the traversal into COM
  fallback — the round-1 source of >1e-3 force error on Plummer cores).

fp32 note: positions are f32 (24-bit mantissa), so a 24-bit quantization is
exact to ~1 cell — deeper keys would only sort fp noise.

Padding particles (mass <= 0) get key INT32_MAX so they always sort last.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

MORTON_BITS = 15
PAD_KEY = np.int32(2**31 - 1)  # numpy scalar — see ops/tree.py:BIG


def _spread_bits(v: jax.Array) -> jax.Array:
    """Insert a 0 bit between each of the low 16 bits of v (int32)."""
    v = (v | (v << 8)) & jnp.int32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.int32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.int32(0x33333333)
    v = (v | (v << 1)) & jnp.int32(0x55555555)
    return v


def _interleave2(qx: jax.Array, qy: jax.Array) -> jax.Array:
    return (_spread_bits(qy) << 1) | _spread_bits(qx)


def morton_keys(pos: jax.Array, mass: jax.Array, world_size: float,
                bits: int = MORTON_BITS) -> tuple[jax.Array, jax.Array]:
    """(hi, lo) int32 Morton key words; padding (mass<=0) sorts last.

    For ``bits <= 15`` the low word is all zeros (single-sort fast path).
    """
    assert 1 <= bits <= 24, bits
    scale = jnp.float32((1 << bits) / world_size)
    q = jnp.clip((pos * scale).astype(jnp.int32), 0, (1 << bits) - 1)
    pad = mass <= 0
    if bits <= 15:
        hi = _interleave2(q[:, 0], q[:, 1])
        lo = jnp.zeros_like(hi)
    else:
        low_bits = bits // 2  # ≤ 12, fits _spread_bits comfortably
        mask = jnp.int32((1 << low_bits) - 1)
        hi = _interleave2(q[:, 0] >> low_bits, q[:, 1] >> low_bits)
        lo = _interleave2(q[:, 0] & mask, q[:, 1] & mask)
        lo = jnp.where(pad, PAD_KEY, lo)
    return jnp.where(pad, PAD_KEY, hi), lo


def morton_encode(pos: jax.Array, mass: jax.Array,
                  world_size: float, bits: int = MORTON_BITS) -> jax.Array:
    """Single int32 Morton key (the high word for bits > 15)."""
    return morton_keys(pos, mass, world_size, bits)[0]


def morton_order(pos: jax.Array, mass: jax.Array, world_size: float,
                 bits: int = MORTON_BITS) -> jax.Array:
    """Stable permutation that sorts particles in Z-order, padding last.

    bits > 15 runs a 2-word LSD radix sort: stable argsort by the low word,
    then by the high word, composed. Prefer ``morton_sort_state`` when the
    goal is the sorted arrays themselves — applying this permutation with a
    gather is scalar-unit bound on TPU (measured 32 ms for 3 arrays at N=1M
    vs 6.6 ms for the multi-payload sort).
    """
    hi, lo = morton_keys(pos, mass, world_size, bits)
    if bits <= 15:
        return jnp.argsort(hi, stable=True)
    p1 = jnp.argsort(lo, stable=True)
    p2 = jnp.argsort(hi[p1], stable=True)
    return p1[p2]


def morton_sort_state(pos: jax.Array, vel: jax.Array, mass: jax.Array,
                      world_size: float, bits: int = MORTON_BITS):
    """Morton-sort the state arrays via ONE multi-payload ``lax.sort``.

    Equivalent to ``order = morton_order(...); pos[order], vel[order],
    mass[order]`` but ~5x faster at N=1M on TPU: the five state columns ride
    the sort network as payloads instead of going through three scalar-unit
    gathers. For bits > 15 the (hi, lo) key pair sorts lexicographically in
    one pass (num_keys=2) — same order as the two-pass LSD radix of
    ``morton_order``.

    Returns ``(pos, vel, mass)`` sorted, padding (mass<=0) last.
    """
    hi, lo = morton_keys(pos, mass, world_size, bits)
    keys = (hi,) if bits <= 15 else (hi, lo)
    cols = (pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1], mass)
    out = jax.lax.sort(keys + cols, num_keys=len(keys), is_stable=True)
    s = out[len(keys):]
    return (jnp.stack([s[0], s[1]], axis=1),
            jnp.stack([s[2], s[3]], axis=1), s[4])

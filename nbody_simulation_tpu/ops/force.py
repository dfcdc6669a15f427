"""The reference force law as a vectorized JAX primitive.

The reference's single pairwise interaction (reference src/main.rs:234-253):

    diff = p2 - p1
    sum  = |diff.x| + |diff.y|                  # L1 norm
    if !sum.is_normal(): return                 # skips self/NaN/inf/subnormal
    dist = max(diff.square_length(), 1e-3)      # squared-L2, clamped
    accel += (diff * m2) / (sum * dist)         # note numerator FIRST

Two deliberate quirks preserved exactly:

1. the denominator is the **product of the L1 norm and the clamped squared
   L2 norm** ("According to wolfram alpha", src/main.rs:251) — not the
   classical d^3;
2. ``f32::is_normal`` on the L1 norm silently masks self-pairs (sum == 0),
   subnormals, infs and NaNs (src/main.rs:240-243) — expressed here as a
   finite-and-(>= FLT_MIN_NORMAL) mask.

Operation ORDER matters for bitwise fp32 parity: the numerator ``diff * m``
is formed before the division, and the clamp applies to the squared distance
before multiplying by the L1 norm. These functions mirror that order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Smallest positive normal f32 — the threshold of Rust's f32::is_normal.
FLT_MIN_NORMAL = 1.17549435e-38


def pair_accel(dx: jax.Array, dy: jax.Array, mass_j: jax.Array,
               softening2: float = 1e-3) -> tuple[jax.Array, jax.Array]:
    """Acceleration contribution of source(s) j on target(s) i.

    ``dx, dy`` are components of ``p_j - p_i`` (broadcastable), ``mass_j`` is
    the source mass. Returns ``(ax, ay)`` with masked pairs contributing 0.
    """
    s = jnp.abs(dx) + jnp.abs(dy)
    normal = jnp.isfinite(s) & (s >= FLT_MIN_NORMAL)
    d2 = jnp.maximum(dx * dx + dy * dy, jnp.float32(softening2))
    den = s * d2
    # Dead lanes get a denominator of 1 so no NaN/inf leaks through the where.
    den = jnp.where(normal, den, jnp.float32(1.0))
    ax = jnp.where(normal, (dx * mass_j) / den, jnp.float32(0.0))
    ay = jnp.where(normal, (dy * mass_j) / den, jnp.float32(0.0))
    return ax, ay


@partial(jax.jit, static_argnames=("softening2", "row_chunk"))
def direct_accel(pos: jax.Array, mass: jax.Array,
                 softening2: float = 1e-3, row_chunk: int = 1024) -> jax.Array:
    """Direct O(N²) acceleration — the exact-summation reference path.

    Equivalent to running the reference's leaf loop (src/main.rs:355-362)
    over every pair. Self-pairs are masked by the is_normal guard. Memory is
    bounded by evaluating ``row_chunk`` targets at a time with ``lax.map``.

    Any N is accepted: targets are padded internally to a multiple of
    ``row_chunk`` (padding rows are computed and discarded; they cost one
    extra chunk at most) and sources need no padding at all.
    """
    n = pos.shape[0]
    chunk = min(row_chunk, n)
    n_pad = -(-n // chunk) * chunk
    x, y = pos[:, 0], pos[:, 1]
    if n_pad != n:
        xt = jnp.concatenate([x, jnp.zeros(n_pad - n, jnp.float32)])
        yt = jnp.concatenate([y, jnp.zeros(n_pad - n, jnp.float32)])
    else:
        xt, yt = x, y

    def one_chunk(start):
        xi = jax.lax.dynamic_slice(xt, (start,), (chunk,))
        yi = jax.lax.dynamic_slice(yt, (start,), (chunk,))
        dx = x[None, :] - xi[:, None]
        dy = y[None, :] - yi[:, None]
        ax, ay = pair_accel(dx, dy, mass[None, :], softening2)
        return jnp.stack([ax.sum(axis=1), ay.sum(axis=1)], axis=-1)

    starts = jnp.arange(0, n_pad, chunk)
    out = jax.lax.map(one_chunk, starts)  # (n_pad/chunk, chunk, 2)
    return out.reshape(n_pad, 2)[:n]


@partial(jax.jit, static_argnames=("softening2", "row_chunk"))
def direct_accel_at(tpos: jax.Array, pos: jax.Array, mass: jax.Array,
                    softening2: float = 1e-3,
                    row_chunk: int = 1024) -> jax.Array:
    """Direct acceleration at arbitrary target positions ``tpos`` (M,2)
    from all sources ``pos``/``mass`` (N rows) — the sampled-ground-truth
    companion of :func:`direct_accel`.

    At scale a full O(N²) oracle is infeasible, but exact truth for a
    random SAMPLE of targets is O(M·N): this is how the slow-tier tests
    calibrate approximation-class error at half-million N. A target that
    exactly coincides with a source skips that pair via the reference's
    is_normal guard (src/main.rs:240-243) — so passing rows of ``pos``
    as targets reproduces ``direct_accel`` for those rows.
    """
    m = tpos.shape[0]
    chunk = min(row_chunk, m)
    m_pad = -(-m // chunk) * chunk
    x, y = pos[:, 0], pos[:, 1]
    xt, yt = tpos[:, 0], tpos[:, 1]
    if m_pad != m:
        xt = jnp.concatenate([xt, jnp.zeros(m_pad - m, jnp.float32)])
        yt = jnp.concatenate([yt, jnp.zeros(m_pad - m, jnp.float32)])

    def one_chunk(start):
        xi = jax.lax.dynamic_slice(xt, (start,), (chunk,))
        yi = jax.lax.dynamic_slice(yt, (start,), (chunk,))
        dx = x[None, :] - xi[:, None]
        dy = y[None, :] - yi[:, None]
        ax, ay = pair_accel(dx, dy, mass[None, :], softening2)
        return jnp.stack([ax.sum(axis=1), ay.sum(axis=1)], axis=-1)

    starts = jnp.arange(0, m_pad, chunk)
    out = jax.lax.map(one_chunk, starts)
    return out.reshape(m_pad, 2)[:m]

"""Differentiable all-pairs force: custom VJP over the Pallas kernel.

The pure-JAX direct path autodiffs out of the box (tests/test_force.py);
this module extends that to the blocked Pallas kernel so gradient-based
workflows (trajectory optimization, initial-condition fitting) run at
kernel speed.

Math. Per unmasked pair, with d = p_j − p_i, s = ‖d‖₁, q = max(‖d‖₂², ε),
r = 1/(s·q), the contribution is c = m·d·r (reference src/main.rs:234-253).
For a cotangent ḡ_i of a_i = Σ_j c_ij:

    ∂r/∂d = −r²·(sign(d)·q + 2·s·d·κ),   κ = [‖d‖₂² > ε]
    u_ij  = m·( r·ḡ_i + (∂r/∂d)·(d·ḡ_i) )        (= Jᵀḡ, J = ∂c/∂d)
    p̄_j  += u_ij          (reduce over i — transposed sweep)
    p̄_i  −= Σ_j u_ij      (reduce over j — forward-shaped sweep)
    m̄_j  += r·(d·ḡ_i)     (reduce over i)

Masked pairs (self/subnormal/non-finite L1) contribute nothing, exactly as
in the forward. Like flash attention's backward, the two reductions run as
two kernels: one gridded (i, j) accumulating over j, one gridded (j, i)
accumulating over i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_simulation_tpu.ops.allpairs import allpairs_accel, allpairs_accel_sym
from nbody_simulation_tpu.ops.force import FLT_MIN_NORMAL

_FLT_MAX = 3.4028235e38


def _pair_terms(dx, dy, softening2, exact_rcp):
    s = jnp.abs(dx) + jnp.abs(dy)
    normal = (s >= FLT_MIN_NORMAL) & (s <= jnp.float32(_FLT_MAX))
    d2 = dx * dx + dy * dy
    kappa = (d2 > jnp.float32(softening2)).astype(jnp.float32)
    q = jnp.maximum(d2, jnp.float32(softening2))
    den = s * q
    if exact_rcp:  # interpreter path: approx reciprocal has no CPU lowering
        r = jnp.float32(1.0) / jnp.where(normal, den, jnp.float32(1.0))
    else:
        r = pl.reciprocal(den, approx=True)
        r = r * (jnp.float32(2.0) - den * r)    # one Newton step
    r = jnp.where(normal, r, jnp.float32(0.0))  # masked pairs vanish
    return s, q, r, kappa


def _psign(x):
    """JAX's |x| subgradient convention: +1 at x == 0 (lax.abs JVP is
    select(x >= 0, t, -t)), unlike sign(0) = 0."""
    return jnp.where(x >= 0, jnp.float32(1.0), jnp.float32(-1.0))


def _u_terms(dx, dy, gx, gy, m, s, q, r, kappa):
    """u = m·(r·ḡ + ∂r/∂d·(d·ḡ)) and t = d·ḡ (for m̄)."""
    t = dx * gx + dy * gy
    mr2t = m * (r * r) * t
    two_sk = jnp.float32(2.0) * s * kappa
    ux = m * r * gx - mr2t * (_psign(dx) * q + two_sk * dx)
    uy = m * r * gy - mr2t * (_psign(dy) * q + two_sk * dy)
    return ux, uy, t


def _bwd_i_kernel(xi, yi, gx, gy, xj, yj, mj, oux, ouy, softening2,
                  exact_rcp):
    """p̄_i = −Σ_j u. Grid (I, J), j accumulates."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        oux[:] = jnp.zeros_like(oux)
        ouy[:] = jnp.zeros_like(ouy)
    dx = xj[:] - xi[:]
    dy = yj[:] - yi[:]
    s, q, r, kappa = _pair_terms(dx, dy, softening2, exact_rcp)
    ux, uy, _ = _u_terms(dx, dy, gx[:], gy[:], mj[:], s, q, r, kappa)
    oux[:] += -jnp.sum(ux, axis=1, keepdims=True)
    ouy[:] += -jnp.sum(uy, axis=1, keepdims=True)


def _bwd_j_kernel(xj, yj, mj, xi, yi, gx, gy, oux, ouy, om, softening2,
                  exact_rcp):
    """p̄_j = Σ_i u and m̄_j = Σ_i r·t. Grid (J, I), i accumulates.
    Here j is on sublanes (targets of this sweep), i on lanes."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        oux[:] = jnp.zeros_like(oux)
        ouy[:] = jnp.zeros_like(ouy)
        om[:] = jnp.zeros_like(om)
    dx = xj[:] - xi[:]        # (TJ,1) - (1,TI) → d = p_j − p_i  ✓
    dy = yj[:] - yi[:]
    s, q, r, kappa = _pair_terms(dx, dy, softening2, exact_rcp)
    ux, uy, t = _u_terms(dx, dy, gx[:], gy[:], mj[:], s, q, r, kappa)
    oux[:] += jnp.sum(ux, axis=1, keepdims=True)
    ouy[:] += jnp.sum(uy, axis=1, keepdims=True)
    om[:] += jnp.sum(r * t, axis=1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def allpairs_accel_diff(pos: jax.Array, mass: jax.Array,
                        softening2: float = 1e-3,
                        tile_i: int = 512, tile_j: int = 2048,
                        rcp: str = "newton", sym: bool = False,
                        sym_tile: int = 1024,
                        sym_strips: int = 4) -> jax.Array:
    """Differentiable blocked all-pairs acceleration.

    The primal mirrors ``models.world.make_accel_fn``'s pallas path exactly
    — same ``rcp`` mode and, with ``sym=True``, the same symmetric
    third-law kernel/tiling — so grad-mode forward values are BITWISE equal
    to run-mode forward values under the configured mode
    (tests/test_allpairs_grad.py asserts this). The backward is the
    closed-form J^T·ḡ of the force law itself, evaluated with a
    Newton-refined reciprocal regardless of ``rcp``: the reciprocal mode
    perturbs the forward VALUE at the 1e-6..1e-4 level but is not part of
    the differentiated math (like dropout rng or attention-mask layout, it
    selects arithmetic, not function).
    """
    if sym and pos.shape[0] % min(sym_tile, pos.shape[0]) == 0:
        return allpairs_accel_sym(pos, mass, softening2=softening2,
                                  tile=sym_tile, strips=sym_strips, rcp=rcp)
    return allpairs_accel(pos, mass, softening2=softening2,
                          tile_i=tile_i, tile_j=tile_j, rcp=rcp)


def _fwd(pos, mass, softening2, tile_i, tile_j, rcp, sym, sym_tile,
         sym_strips):
    out = allpairs_accel_diff(pos, mass, softening2, tile_i, tile_j,
                              rcp, sym, sym_tile, sym_strips)
    return out, (pos, mass)


def bwd_sweeps(pos_i: jax.Array, g_i: jax.Array,
               pos_j: jax.Array, mass_j: jax.Array,
               softening2: float, tile_i: int, tile_j: int):
    """The two backward sweeps for one (targets i, sources j) block.

    Returns (p̄_i (Ni,2), p̄_j (Nj,2), m̄_j (Nj,)) — the cotangent
    contributions of this block's pairs to target positions, source
    positions, and source masses. ``pos_i``/``pos_j`` may be the same
    array (the single-chip case, where the caller sums both position
    parts) or different shards' tiles (the ring backward,
    parallel/ring_grad.py — the flash-attention-backward-over-a-ring
    dataflow, where p̄_j/m̄_j ride the rotating accumulator).
    """
    ni = pos_i.shape[0]
    nj = pos_j.shape[0]
    ti = min(tile_i, ni)
    tj = min(tile_j, nj)
    # The backward keeps ~6 full (ti, tj) temporaries live (dx, dy, t, ux,
    # uy, ...) vs the forward's ~3 — cap the tile area at 256K f32 so the
    # scoped-VMEM budget holds.
    while ti * tj > (1 << 18) and tj > 128:
        tj //= 2
    while ti * tj > (1 << 18) and ti > 128:
        ti //= 2
    interpret = jax.default_backend() == "cpu"

    x_col, y_col = pos_i[:, 0:1], pos_i[:, 1:2]
    x_row = pos_i[:, 0].reshape(1, ni)
    y_row = pos_i[:, 1].reshape(1, ni)
    xj_col, yj_col = pos_j[:, 0:1], pos_j[:, 1:2]
    xj_row = pos_j[:, 0].reshape(1, nj)
    yj_row = pos_j[:, 1].reshape(1, nj)
    m_row = mass_j.reshape(1, nj)
    gx_col, gy_col = g_i[:, 0:1], g_i[:, 1:2]
    gx_row = g_i[:, 0].reshape(1, ni)
    gy_row = g_i[:, 1].reshape(1, ni)

    col = lambda: pl.BlockSpec((ti, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, tj), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(dimension_semantics=("parallel",
                                                       "arbitrary"))

    # Sweep 1: p̄_i (reduce over j). Grid (I, J).
    pbx, pby = pl.pallas_call(
        functools.partial(_bwd_i_kernel, softening2=softening2,
                          exact_rcp=interpret),
        grid=(ni // ti, nj // tj),
        in_specs=[col(), col(), col(), col(), row(), row(), row()],
        out_specs=[col(), col()],
        out_shape=[jax.ShapeDtypeStruct((ni, 1), jnp.float32)] * 2,
        compiler_params=params, interpret=interpret,
    )(x_col, y_col, gx_col, gy_col, xj_row, yj_row, m_row)

    # Sweep 2: p̄_j and m̄_j (reduce over i; roles of the axes swap).
    colj = lambda: pl.BlockSpec((tj, 1), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
    rowi = lambda: pl.BlockSpec((1, ti), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)
    qbx, qby, mb = pl.pallas_call(
        functools.partial(_bwd_j_kernel, softening2=softening2,
                          exact_rcp=interpret),
        grid=(nj // tj, ni // ti),
        in_specs=[colj(), colj(), colj(), rowi(), rowi(), rowi(), rowi()],
        out_specs=[colj(), colj(), colj()],
        out_shape=[jax.ShapeDtypeStruct((nj, 1), jnp.float32)] * 3,
        compiler_params=params, interpret=interpret,
    )(xj_col, yj_col, mass_j.reshape(nj, 1), x_row, y_row, gx_row, gy_row)

    pb_i = jnp.concatenate([pbx, pby], axis=1)
    pb_j = jnp.concatenate([qbx, qby], axis=1)
    return pb_i, pb_j, mb[:, 0]


def _bwd(softening2, tile_i, tile_j, rcp, sym, sym_tile, sym_strips, res, g):
    pos, mass = res
    pb_i, pb_j, mb = bwd_sweeps(pos, g, pos, mass, softening2,
                                tile_i, tile_j)
    return pb_i + pb_j, mb


allpairs_accel_diff.defvjp(_fwd, _bwd)

"""Differentiable grouped force sweep → end-to-end differentiable Barnes-Hut.

Everything else in the BH pipeline is plain JAX and autodiffs on its own:
the Morton permutation is a gather, the tree summaries are reductions, and
the planner's decisions are integer/boolean (constants under AD, like
attention masks). Only the Pallas force sweep needs a hand-written VJP —
the same closed-form J^T·ḡ as ops/allpairs_grad.py, in the per-group
layout:

    t̄gt[g,s]   = −Σ_c u[g,s,c]
    s̄rc_x/y[g,c] = +Σ_s u[g,s,c]
    s̄rc_m[g,c]  =  Σ_s r·(d·ḡ)

``bh_accel_diff`` is the user-facing entry: identical physics to
ops.traversal.bh_accel, with gradients w.r.t. positions flowing through the
exact leaf interactions AND through the accepted node COMs (via the
summarize reductions). Mass gradients flow through leaf tiles only — node
masses are exact int32 sums (non-differentiable by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_simulation_tpu.ops.allpairs_grad import _pair_terms, _u_terms
from nbody_simulation_tpu.ops import traversal as _tv


def _gf_bwd_tgt_kernel(xi, yi, gx, gy, xj, yj, mj, oux, ouy,
                       softening2, exact_rcp):
    """t̄gt = −Σ_c u. Grid (G·S_tiles, C_tiles), sources accumulate."""
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


def _gf_bwd_src_kernel(xi, yi, gx, gy, xj, yj, mj, oux, ouy, om,
                       softening2, exact_rcp):
    """s̄rc = +Σ_s u, m̄ = Σ_s r·t — same (targets=sublanes, sources=lanes)
    layout as the forward; the reduction runs over SUBLANES and each output
    row block is written exactly once (grid (G, C_tiles), no revisits)."""
    dx = xj[:] - xi[:]          # (1,tjc) - (s,1): d = p_src − p_tgt ✓
    dy = yj[:] - yi[:]
    s, q, r, kappa = _pair_terms(dx, dy, softening2, exact_rcp)
    ux, uy, t = _u_terms(dx, dy, gx[:], gy[:], mj[:], s, q, r, kappa)
    oux[:] = jnp.sum(ux, axis=0, keepdims=True)
    ouy[:] = jnp.sum(uy, axis=0, keepdims=True)
    om[:] = jnp.sum(r * t, axis=0, keepdims=True)


def _pick_tile(total: int, cap_elems: int, other: int) -> int:
    """Largest 128-multiple divisor of ``total`` with tile*other ≤ cap.
    ``total`` is always a multiple of 128, so 128 is a valid floor."""
    cap = max(128, (cap_elems // other) // 128 * 128)
    best = 128
    t = 128
    while t <= min(cap, total):
        if total % t == 0:
            best = t
        t += 128
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def grouped_force_diff(tgt_pos, src_x, src_y, src_m, softening2=1e-3,
                       rcp="newton"):
    """Differentiable version of ops.traversal._grouped_force.

    The primal runs the production sweep kernel with the caller's ``rcp``
    mode, so a grad-mode BH forward equals the run-mode forward under the
    configured mode. The backward uses its own Newton-refined reciprocal
    regardless (``rcp`` selects forward arithmetic, not the function)."""
    interpret = jax.default_backend() == "cpu"
    return _tv._grouped_force(tgt_pos, src_x, src_y, src_m,
                              softening2=softening2, rcp=rcp,
                              interpret=interpret)


def _gf_fwd(tgt_pos, src_x, src_y, src_m, softening2, rcp):
    out = grouped_force_diff(tgt_pos, src_x, src_y, src_m, softening2, rcp)
    return out, (tgt_pos, src_x, src_y, src_m)


def _gf_bwd(softening2, rcp, res, g):
    tgt_pos, src_x, src_y, src_m = res
    gr, s, _ = tgt_pos.shape
    c = src_x.shape[1]
    interpret = jax.default_backend() == "cpu"

    # Pad C to a lane multiple (mirrors the forward's padding).
    c_pad = -(-c // 128) * 128
    if c_pad != c:
        z = jnp.zeros((gr, c_pad - c), jnp.float32)
        src_x = jnp.concatenate([src_x, z], 1)
        src_y = jnp.concatenate([src_y, z], 1)
        src_m = jnp.concatenate([src_m, z], 1)

    x_col = tgt_pos[..., 0].reshape(gr * s, 1)
    y_col = tgt_pos[..., 1].reshape(gr * s, 1)
    gx_col = g[..., 0].reshape(gr * s, 1)
    gy_col = g[..., 1].reshape(gr * s, 1)
    sx_flat = src_x.reshape(1, gr * c_pad)
    sy_flat = src_y.reshape(1, gr * c_pad)
    sm_flat = src_m.reshape(1, gr * c_pad)

    params = pltpu.CompilerParams(dimension_semantics=("parallel",
                                                       "arbitrary"))

    # Sweep T: target gradients. Tiles: (s, tjc) with s fixed per group row.
    tjc = _pick_tile(c_pad, 1 << 18, s)
    jt = c_pad // tjc
    col = lambda: pl.BlockSpec((s, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, tjc), lambda i, j: (0, i * jt + j),
                               memory_space=pltpu.VMEM)
    tbx, tby = pl.pallas_call(
        functools.partial(_gf_bwd_tgt_kernel, softening2=softening2,
                          exact_rcp=interpret),
        grid=(gr, jt),
        in_specs=[col(), col(), col(), col(), row(), row(), row()],
        out_specs=[col(), col()],
        out_shape=[jax.ShapeDtypeStruct((gr * s, 1), jnp.float32)] * 2,
        compiler_params=params, interpret=interpret,
    )(x_col, y_col, gx_col, gy_col, sx_flat, sy_flat, sm_flat)
    tbar = jnp.concatenate([tbx, tby], 1).reshape(gr, s, 2)

    # Sweep S: source gradients — forward layout, sublane reduction, each
    # (1, tjc) output row block written exactly once.
    rowO = lambda: pl.BlockSpec((1, tjc), lambda i, j: (0, i * jt + j),
                                memory_space=pltpu.VMEM)
    sbx, sby, sbm = pl.pallas_call(
        functools.partial(_gf_bwd_src_kernel, softening2=softening2,
                          exact_rcp=interpret),
        grid=(gr, jt),
        in_specs=[col(), col(), col(), col(), row(), row(), row()],
        out_specs=[rowO(), rowO(), rowO()],
        out_shape=[jax.ShapeDtypeStruct((1, gr * c_pad), jnp.float32)] * 3,
        compiler_params=params, interpret=interpret,
    )(x_col, y_col, gx_col, gy_col, sx_flat, sy_flat, sm_flat)
    sxb = sbx.reshape(gr, c_pad)[:, :c]
    syb = sby.reshape(gr, c_pad)[:, :c]
    smb = sbm.reshape(gr, c_pad)[:, :c]

    return tbar, sxb, syb, smb


grouped_force_diff.defvjp(_gf_fwd, _gf_bwd)


def bh_accel_diff(pos: jax.Array, mass: jax.Array, *, theta: float = 50.0,
                  softening2: float = 1e-3, leaf_size: int = 64,
                  world_size: float = 100_000.0,
                  unweighted_leaf_com: bool = True,
                  frontier_cap: int = 32, leaf_cap: int = 16,
                  arity: int = 2, plan_leaves: int = 1,
                  rcp: str = "newton") -> jax.Array:
    """Differentiable Barnes-Hut acceleration (original particle order).

    Same walk as ops.traversal.bh_accel; jax.grad flows through the exact
    leaf interactions and the accepted COMs. Pass the run configuration's
    ``rcp`` (``SimConfig.resolved_rcp(bh=True)``) for forward parity with
    the run-mode sweep under that mode.
    """
    from nbody_simulation_tpu.ops.tree import build_tree

    n = pos.shape[0]
    tree, order = build_tree(pos, mass, leaf_size=leaf_size,
                             world_size=world_size,
                             unweighted_leaf_com=unweighted_leaf_com)
    n_leaves, S, _ = tree.leaf_pos.shape
    pl_ = max(1, min(plan_leaves, n_leaves))
    while n_leaves % pl_:
        pl_ //= 2
    src_x, src_y, src_m = _tv.bh_plan_sources(
        tree, theta, frontier_cap, leaf_cap, arity=arity, plan_leaves=pl_)
    tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)
    acc = grouped_force_diff(tgt, src_x, src_y, src_m, softening2, rcp)
    acc_sorted = acc.reshape(n_leaves * S, 2)
    return jnp.zeros((n, 2), jnp.float32).at[order].set(acc_sorted[:n])

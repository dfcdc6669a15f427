"""Total-energy diagnostics: pairwise potential + kinetic, exact and BH.

**Why a "counterpart" potential.** The reference's force law
``a += m_j·d/(‖d‖₁·‖d‖₂²)`` (reference src/main.rs:234-253) is NOT a
conservative field: writing g = 1/(s·r²) with s = |dx|+|dy|, r² = d·d, the
2-D curl of F = d·g is

    ∂x(dy·g) − ∂y(dx·g) = −g²·r²·(sign(dx)·dy − sign(dy)·dx) ≠ 0

(e.g. d = (1, 2) gives a strictly positive curl), so no scalar potential
reproduces it exactly and "total energy" is not a conserved quantity of the
reference dynamics even with a perfect integrator. The standard N-body
fidelity metric is still wanted (BASELINE.json config 2 names an
energy-drift check), so this module defines the energy against the
**conservative isotropic counterpart** of the law — the radial force with
the same softening clamp, F_iso = m_j·d/ max(r², ε)^{3/2}, whose exact pair
potential is

    u(i, j) = − m_i·m_j / sqrt(max(r², ε))          (ε = softening2)

This is the physically meaningful energy of the system the reference
approximates; its drift measures integrator + force-approximation error in
one number, and (the point of the suite check) the BH path's drift must
track the direct path's drift.

Self-pairs and coincident particles are skipped by the reference's own
``is_normal`` guard on ‖d‖₁ (src/main.rs:240-243), keeping the masking
semantics identical to the force kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_simulation_tpu.ops.force import FLT_MIN_NORMAL

# VPU op estimate per pair for the potential sweep (rsqrt + mask + mul-add).
POT_FLOPS_PER_PAIR = 10


def pot_tile(dx, dy, mj, softening2: float) -> jax.Array:
    """Pair potential contributions −m_j/sqrt(max(r², ε)) on a (TI,TJ) tile.

    Pairs masked exactly like the force law: contributions vanish when
    ‖d‖₁ is zero/subnormal/non-finite (self-pairs, coincident points).
    """
    s = jnp.abs(dx) + jnp.abs(dy)
    normal = (s >= FLT_MIN_NORMAL) & (s <= jnp.float32(3.4028235e38))
    d2 = jnp.maximum(dx * dx + dy * dy, jnp.float32(softening2))
    phi = -mj * jax.lax.rsqrt(d2)
    return jnp.where(normal, phi, jnp.float32(0.0))


def _potential_kernel(xi_ref, yi_ref, xj_ref, yj_ref, mj_ref, phi_ref,
                      softening2: float):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        phi_ref[:] = jnp.zeros_like(phi_ref)

    dx = xj_ref[:] - xi_ref[:]
    dy = yj_ref[:] - yi_ref[:]
    c = pot_tile(dx, dy, mj_ref[:], softening2)
    phi_ref[:] += jnp.sum(c, axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("softening2", "tile_i", "tile_j", "interpret"))
def allpairs_potential(pos: jax.Array, mass: jax.Array,
                       src_pos: jax.Array | None = None,
                       src_mass: jax.Array | None = None,
                       softening2: float = 1e-3,
                       tile_i: int = 512, tile_j: int = 2048,
                       interpret: bool = False) -> jax.Array:
    """Per-target potential φ_i = −Σ_j m_j/sqrt(max(r²,ε)), f32[Ni].

    Same tiling/layout as ops/allpairs.allpairs_accel (which see); zero-mass
    padding contributes exactly 0.
    """
    if src_pos is None:
        src_pos = pos
    if src_mass is None:
        src_mass = mass
    n_out = pos.shape[0]
    # Pad both axes to tile multiples with inert particles: zero-mass
    # sources contribute exactly 0 to φ (the mask), and padded targets are
    # sliced off the output — so any N works (the engine pads states to a
    # 256 multiple only, which the 2048 source tile would otherwise
    # reject, crashing --energy-every mid-run).
    def pad2(a, m, fill=0.0):
        n = a.shape[0]
        t = -(-n // m) * m
        if t == n:
            return a
        z = jnp.full((t - n,) + a.shape[1:], jnp.float32(fill))
        return jnp.concatenate([a, z], axis=0)

    tile_i = min(tile_i, pos.shape[0])
    tile_j = min(tile_j, src_pos.shape[0])
    pos = pad2(pos, tile_i)
    src_pos = pad2(src_pos, tile_j)
    src_mass = pad2(src_mass, tile_j)
    ni, nj = pos.shape[0], src_pos.shape[0]
    if interpret or jax.default_backend() == "cpu":
        interpret = True

    grid = (ni // tile_i, nj // tile_j)
    kernel = functools.partial(_potential_kernel, softening2=softening2)
    col = pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, tile_j), lambda i, j: (0, j),
                       memory_space=pltpu.VMEM)
    (phi,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[col, col, row, row, row],
        out_specs=[col],
        out_shape=[jax.ShapeDtypeStruct((ni, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=POT_FLOPS_PER_PAIR * ni * nj,
            bytes_accessed=3 * nj * 4 * (ni // tile_i) + 2 * ni * 4,
            transcendentals=ni * nj),
        interpret=interpret,
    )(pos[:, 0:1], pos[:, 1:2], src_pos[:, 0].reshape(1, nj),
      src_pos[:, 1].reshape(1, nj), src_mass.reshape(1, nj))
    return phi[:n_out, 0]


def potential_energy(pos: jax.Array, mass: jax.Array,
                     softening2: float = 1e-3) -> jax.Array:
    """Total pair potential U = ½·Σ_i m_i·φ_i (each pair counted once)."""
    phi = allpairs_potential(pos, mass, softening2=softening2)
    return jnp.float32(0.5) * jnp.sum(mass * phi)


def kinetic_energy(vel: jax.Array, mass: jax.Array) -> jax.Array:
    return jnp.sum(jnp.float32(0.5) * mass * jnp.sum(vel * vel, axis=-1))


def total_energy(state, softening2: float = 1e-3) -> jax.Array:
    """E = KE + U of a (single-chip) ParticleState; padding is inert."""
    return (kinetic_energy(state.vel, state.mass)
            + potential_energy(state.pos, state.mass, softening2=softening2))


def bh_total_energy(state, config) -> jax.Array:
    """Approximate E = KE + U from the BH-planned source columns.

    O(N·C) instead of the exact sweep's O(N²/2): the same sort + build +
    plan the force path runs (ops/traversal.py), with the planned columns
    fed to the counterpart potential instead of the force kernel — the
    scalable cadence-energy evaluation for large N. The approximation is
    θ-consistent with the forces, so its drift tracks the integrator the
    same way the exact evaluation does (tests/test_energy.py: exact-class
    match at θ=0 with caps ≥ level widths, <1e-3 at physics-quality θ).
    """
    from nbody_simulation_tpu.ops.traversal import bh_plan_sources
    from nbody_simulation_tpu.ops.tree import build_tree

    cfg = config
    tree, _ = build_tree(state.pos, state.mass, leaf_size=cfg.leaf_size,
                         world_size=cfg.world_size,
                         unweighted_leaf_com=cfg.unweighted_leaf_com,
                         morton_bits=cfg.resolved_morton_bits())
    f, l = cfg.resolved_caps()
    n_leaves, s, _ = tree.leaf_pos.shape
    pl_ = max(1, min(cfg.plan_leaves, n_leaves))
    while n_leaves % pl_:
        pl_ //= 2
    src_x, src_y, src_m = bh_plan_sources(
        tree, cfg.theta, f, l, plan_leaves=pl_, multipole=1)[:3]
    g = n_leaves // pl_
    tgt_pos = tree.leaf_pos.reshape(g, pl_ * s, 2)
    tgt_mass = tree.leaf_mass.reshape(g, pl_ * s)
    u = bh_potential_from_columns(tgt_mass, tgt_pos, src_x, src_y, src_m,
                                  softening2=cfg.softening2)
    return kinetic_energy(state.vel, state.mass) + u


def bh_potential_from_columns(tgt_mass: jax.Array, tgt_pos: jax.Array,
                              src_x, src_y, src_m,
                              softening2: float = 1e-3) -> jax.Array:
    """U from already-planned BH source columns (O(N·C) instead of O(N²)).

    ``tgt_pos`` (G, S, 2) leaf-group targets, ``src_*`` (G, C) planned
    columns (ops/traversal.plan_rows) — the same approximation the force
    sweep uses, applied to the counterpart potential. Each (target, source)
    pair appears once per direction in BH, so the ½ double-count factor
    still applies. XLA-only (the O(N·C) reduction is bandwidth-trivial next
    to the force sweep; no Pallas needed at diagnostic cadences).

    The (G, S, C) pair tile is evaluated in row chunks via ``lax.map`` so
    the live intermediate is bounded (~tens of MB) — at a 1M shard the
    unchunked tile is 4096×256×1344 f32 ≈ 5.6 GB, which must never be a
    materialization candidate on a 16 GB part. Chunk boundaries only
    change fp32 partial-sum order.
    """
    G, S, _ = tgt_pos.shape
    gb = min(256, G)
    while G % gb:
        gb //= 2

    def chunk_u(args):
        tp, tm, sx, sy, sm = args
        dx = sx[:, None, :] - tp[..., 0][:, :, None]     # (gb, S, C)
        dy = sy[:, None, :] - tp[..., 1][:, :, None]
        c = pot_tile(dx, dy, sm[:, None, :], softening2)
        return jnp.sum(tm * jnp.sum(c, axis=-1))

    def rs(a):
        return a.reshape((G // gb, gb) + a.shape[1:])

    parts = jax.lax.map(chunk_u, (rs(tgt_pos), rs(tgt_mass.reshape(G, S)),
                                  rs(src_x), rs(src_y), rs(src_m)))
    return jnp.float32(0.5) * jnp.sum(parts)

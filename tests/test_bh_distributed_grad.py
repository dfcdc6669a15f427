"""Differentiable distributed Barnes-Hut (parallel/bh_distributed_grad.py).

jax.grad through the FLAGSHIP force path — local subtree walk, neighbor
near stages, seam matchings, coarse forest — on the 8-device mesh, against
the single-chip custom-VJP walk (ops/traversal_grad.bh_accel_diff) and the
direct-sum autodiff ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models import uniform_disc
from nbody_simulation_tpu.ops.force import direct_accel
from nbody_simulation_tpu.ops.traversal_grad import bh_accel_diff
from nbody_simulation_tpu.parallel import (adjacency_stages,
                                           bh_distributed_accel,
                                           bh_distributed_accel_diff,
                                           distribute_state, make_1d_mesh)


def exact_cfg(theta, **kw):
    """Caps ≥ level widths at every ring distance + matched Morton keys +
    monopole: the distributed walk tests exactly the single-chip walk's
    node set (parallel/bh_distributed.py module contract), so values AND
    gradients must agree to fp32 summation order."""
    return SimConfig(force_path="bh", theta=theta, unweighted_leaf_com=False,
                     frontier_cap=128, leaf_cap=256, plan_leaves=1,
                     far_frontier_cap=128, far_leaf_cap=256, far_mode="ring",
                     morton_bits=15, multipole=1, **kw)


def dist_cloud(theta, n=4096, seed=3):
    mesh = make_1d_mesh(8)
    cfg = exact_cfg(theta)
    ds = distribute_state(uniform_disc(n, seed=seed), mesh, cfg)
    assert ds.pos.shape[0] == n  # no padding: leaf counts already pow2
    return mesh, cfg, ds


def test_theta0_matches_direct_forward_and_grad(rng):
    """θ=0 opens everything: the distributed staged walk IS direct
    summation — gradients must match autodiff of the direct path."""
    mesh, cfg, ds = dist_cloud(theta=0.0)
    n = ds.pos.shape[0]
    cot = jnp.asarray(rng.normal(0, 1, (n, 2)).astype(np.float32))

    a = np.asarray(bh_distributed_accel_diff(ds.pos, ds.mass, mesh,
                                             config=cfg))
    want = np.asarray(direct_accel(ds.pos, ds.mass, row_chunk=n))
    np.testing.assert_allclose(a, want, rtol=2e-4, atol=1e-7)

    gp_d, gm_d = jax.grad(
        lambda p, m: jnp.sum(bh_distributed_accel_diff(
            p, m, mesh, config=cfg) * cot), argnums=(0, 1))(ds.pos, ds.mass)
    gp_t, gm_t = jax.grad(
        lambda p, m: jnp.sum(direct_accel(p, m, row_chunk=n) * cot),
        argnums=(0, 1))(ds.pos, ds.mass)
    np.testing.assert_allclose(np.asarray(gp_d), np.asarray(gp_t),
                               rtol=2e-4, atol=1e-7)
    # Node masses are int32 sums (non-differentiable); at θ=0 every
    # interaction is an exact leaf pair, so mass grads are complete.
    np.testing.assert_allclose(np.asarray(gm_d), np.asarray(gm_t),
                               rtol=2e-4, atol=1e-9)


def _grad_parity_at(theta, rng):
    mesh, cfg, ds = dist_cloud(theta=theta)
    n = ds.pos.shape[0]
    cot = jnp.asarray(rng.normal(0, 1, (n, 2)).astype(np.float32))

    a = np.asarray(bh_distributed_accel_diff(ds.pos, ds.mass, mesh,
                                             config=cfg))
    b = np.asarray(bh_accel_diff(ds.pos, ds.mass, theta=theta,
                                 frontier_cap=128, leaf_cap=256,
                                 unweighted_leaf_com=False, plan_leaves=1))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)

    gp_d, gm_d = jax.grad(
        lambda p, m: jnp.sum(bh_distributed_accel_diff(
            p, m, mesh, config=cfg) * cot), argnums=(0, 1))(ds.pos, ds.mass)
    gp_s, gm_s = jax.grad(
        lambda p, m: jnp.sum(bh_accel_diff(
            p, m, theta=theta, frontier_cap=128, leaf_cap=256,
            unweighted_leaf_com=False, plan_leaves=1) * cot),
        argnums=(0, 1))(ds.pos, ds.mass)
    np.testing.assert_allclose(np.asarray(gp_d), np.asarray(gp_s),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gm_d), np.asarray(gm_s),
                               rtol=2e-4, atol=1e-8)


def test_grad_parity_vs_single_chip_theta_half(rng):
    """The round-4 verdict's 'done' bar: gradient parity vs single-chip
    bh_accel_diff on the 8-device mesh at θ=0.5."""
    _grad_parity_at(0.5, rng)


def test_grad_parity_vs_single_chip_theta50(rng):
    """... AND at the reference's θ=50 regime."""
    _grad_parity_at(50.0, rng)


def test_forest_seam_path_grad_finite_and_forward_parity(rng):
    """The FLAGSHIP staging (forest far-mode + adjacency seam matchings +
    compute-to-data near stages) is differentiable end-to-end, and the
    diff entry's forward is bitwise the run-mode forward at multipole=1."""
    mesh = make_1d_mesh(8)
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False,
                    frontier_cap=128, leaf_cap=256, plan_leaves=1)
    st = uniform_disc(16_384, seed=8)
    ds = distribute_state(st, mesh, cfg)
    extra = adjacency_stages(ds, mesh, cfg)
    assert cfg.resolved_far_mode() == "forest" and extra

    a = np.asarray(bh_distributed_accel_diff(ds.pos, ds.mass, mesh,
                                             config=cfg, extra_pairs=extra))
    run = np.asarray(bh_distributed_accel(
        ds.pos, ds.mass, mesh, config=cfg.replace(multipole=1),
        extra_pairs=extra))
    np.testing.assert_array_equal(a, run)

    n = ds.pos.shape[0]
    cot = jnp.asarray(np.where(np.asarray(ds.mass)[:, None] > 0,
                               rng.normal(0, 1, (n, 2)), 0.0)
                      .astype(np.float32))
    gp = np.asarray(jax.grad(lambda p: jnp.sum(bh_distributed_accel_diff(
        p, ds.mass, mesh, config=cfg, extra_pairs=extra) * cot))(ds.pos))
    assert np.isfinite(gp).all()
    assert np.abs(gp).max() > 0


def test_grad_through_distributed_step(rng):
    """End-to-end: gradient of a scalar of the NEXT state w.r.t. the
    CURRENT sharded state through one Euler step over the differentiable
    distributed-BH force matches the single-chip counterpart."""
    mesh, cfg, ds = dist_cloud(theta=0.5, n=4096, seed=11)
    dt = jnp.float32(cfg.dt)
    vel = ds.vel

    def final_spread(p, dist):
        if dist:
            acc = bh_distributed_accel_diff(p, ds.mass, mesh, config=cfg)
        else:
            acc = bh_accel_diff(p, ds.mass, theta=0.5, frontier_cap=128,
                                leaf_cap=256, unweighted_leaf_com=False,
                                plan_leaves=1)
        v2 = vel + acc * dt
        p2 = p + v2 * dt
        return jnp.sum((p2 - jnp.mean(p2, 0)) ** 2)

    g_d = np.asarray(jax.grad(lambda p: final_spread(p, True))(ds.pos))
    g_s = np.asarray(jax.grad(lambda p: final_spread(p, False))(ds.pos))
    assert np.isfinite(g_d).all()
    np.testing.assert_allclose(g_d, g_s, rtol=2e-4, atol=1e-5)

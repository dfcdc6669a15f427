"""Barnes-Hut traversal: criterion parity, exactness at θ=0, error bounds."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.ops.force import direct_accel
from nbody_simulation_tpu.ops.traversal import (accept_node_scalar, bh_accel)
from nbody_simulation_tpu.models.scenarios import uniform_disc, galaxy


def rel_err(got, want):
    num = np.linalg.norm(got - want, axis=1)
    den = np.maximum(np.linalg.norm(want, axis=1), 1e-12)
    return num / den


def cloud(n, seed=0, heavy=True):
    st = uniform_disc(n, seed=seed)
    mass = np.asarray(st.mass).copy()
    if heavy:
        mass[0] = 750_000.0
    return jnp.asarray(st.pos), jnp.asarray(mass)


# --- the reference acceptance criterion (src/main.rs:370-373) --------------

def test_accept_criterion_outside_far():
    # Node 10x10 at origin, COM at center; particle far away, θ=1.
    ok = accept_node_scalar(jnp.asarray([100.0, 100.0]),
                            jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 10.0]),
                            jnp.asarray([5.0, 5.0]), 1.0)
    assert bool(ok)  # 100 < d2·1


def test_accept_criterion_inside_node_never():
    ok = accept_node_scalar(jnp.asarray([5.0, 5.0]),
                            jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 10.0]),
                            jnp.asarray([9.0, 9.0]), 1e9)
    assert not bool(ok)  # contains → always opened


def test_accept_criterion_boundary_is_outside():
    # contains() is strict (src/bvh_tree.rs:15-20): on the edge = outside.
    ok = accept_node_scalar(jnp.asarray([0.0, 5.0]),
                            jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 10.0]),
                            jnp.asarray([8.0, 5.0]), 10.0)
    # s2 = 100, d2 = 64, θ²=100 → 100 < 6400 → accept
    assert bool(ok)


def test_accept_criterion_theta_threshold():
    # max(w,h)² = 100; d2 = 25; θ=2 → 100 < 100 is false → open.
    ok = accept_node_scalar(jnp.asarray([15.0, 5.0]),
                            jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 10.0]),
                            jnp.asarray([10.0, 5.0]), 2.0)
    assert not bool(ok)
    # θ slightly larger → accept.
    ok = accept_node_scalar(jnp.asarray([15.0, 5.0]),
                            jnp.asarray([0.0, 0.0]), jnp.asarray([10.0, 10.0]),
                            jnp.asarray([10.0, 5.0]), 2.01)
    assert bool(ok)


# --- traversal vs direct ----------------------------------------------------

def test_theta0_is_exact():
    # θ=0 never accepts → pure leaf-exact work == direct summation.
    pos, mass = cloud(1024)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(bh_accel(pos, mass, theta=0.0,
                              frontier_cap=64, leaf_cap=32, group_chunk=16))
    assert rel_err(got, want).max() < 1e-4


def test_theta_half_close_to_direct():
    # Physics-quality config: mass-weighted leaf COMs.
    pos, mass = cloud(2048)
    want = np.asarray(direct_accel(pos, mass))
    # Caps sized to the scenario (32 leaves): no overflow fallback in play.
    got = np.asarray(bh_accel(pos, mass, theta=0.5, frontier_cap=64,
                              leaf_cap=32, unweighted_leaf_com=False))
    e = rel_err(got, want)
    assert np.percentile(e, 99) < 2e-3, np.percentile(e, 99)
    assert np.median(e) < 1e-4, np.median(e)


def test_unweighted_leaf_com_quirk_behaves_like_reference():
    # With the reference quirk (src/bvh_tree.rs:98-116) a heavy particle's
    # leaf COM is mispositioned, so far-field forces from that node are
    # noticeably off — that IS the reference behavior. The quirk must only
    # matter when masses are non-uniform.
    pos, mass = cloud(2048, heavy=False)
    want = np.asarray(bh_accel(pos, mass, theta=0.5,
                               unweighted_leaf_com=False))
    got = np.asarray(bh_accel(pos, mass, theta=0.5,
                              unweighted_leaf_com=True))
    np.testing.assert_array_equal(got, want)  # uniform masses: identical


def test_theta50_bounded_error():
    # θ=50 is the reference's aggressive default: still sane, not garbage.
    pos, mass = cloud(2048)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(bh_accel(pos, mass, theta=50.0, group_chunk=32))
    e = rel_err(got, want)
    assert np.isfinite(np.asarray(got)).all()
    assert np.median(e) < 0.5, np.median(e)


def test_overflow_degrades_gracefully():
    # Absurdly small caps must still give finite, BH-quality output.
    pos, mass = cloud(2048)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(bh_accel(pos, mass, theta=0.5, frontier_cap=4,
                              leaf_cap=2, group_chunk=32))
    assert np.isfinite(got).all()
    assert np.median(rel_err(got, want)) < 0.5


def test_arbitrary_n_and_order_restored():
    pos, mass = cloud(777, heavy=False)
    got = np.asarray(bh_accel(pos, mass, theta=0.0, frontier_cap=64,
                              leaf_cap=16, group_chunk=16))
    want = np.asarray(direct_accel(jnp.asarray(pos), jnp.asarray(mass),
                                   row_chunk=777))
    assert got.shape == (777, 2)
    assert rel_err(got, want).max() < 1e-4


def test_auto_caps_by_theta():
    from nbody_simulation_tpu.config import SimConfig
    assert SimConfig(theta=50.0, plan_leaves=1).resolved_caps() == (16, 8)
    assert SimConfig(theta=50.0, plan_leaves=8).resolved_caps() == (16, 32)
    assert SimConfig(theta=0.5, plan_leaves=1).resolved_caps() == (128, 256)
    assert SimConfig(theta=0.5, frontier_cap=32).resolved_caps()[0] == 32


def test_plan_leaves_preserves_exactness():
    pos, mass = cloud(2048, heavy=False)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(bh_accel(pos, mass, theta=0.0, frontier_cap=64,
                              leaf_cap=32, plan_leaves=4))
    assert rel_err(got, want).max() < 1e-4


def test_plan_leaves_quality_at_theta_half():
    pos, mass = cloud(2048)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(bh_accel(pos, mass, theta=0.5, frontier_cap=64,
                              leaf_cap=32, plan_leaves=4,
                              unweighted_leaf_com=False))
    e = rel_err(got, want)
    assert np.percentile(e, 99) < 2e-3, np.percentile(e, 99)


def test_leaf_size_variants_exact_at_theta0():
    pos, mass = cloud(512, heavy=False)
    want = np.asarray(direct_accel(pos, mass, row_chunk=512))
    for leaf in (32, 128):
        got = np.asarray(bh_accel(pos, mass, theta=0.0, leaf_size=leaf,
                                  frontier_cap=64, leaf_cap=32))
        e = rel_err(got, want)
        assert e.max() < 1e-4, (leaf, e.max())

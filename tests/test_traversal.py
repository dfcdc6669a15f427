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
    assert SimConfig(theta=0.5, plan_leaves=1).resolved_caps() == (256, 256)
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


def test_source_mass_conservation():
    """Every particle's mass must appear exactly once in every group's
    source list — as an accepted node, an overflow-COM fallback, or a leaf
    tile. Catches any dropped-force planner bug at any caps/θ/multipole."""
    from nbody_simulation_tpu.ops.tree import build_tree
    from nbody_simulation_tpu.ops.traversal import bh_plan_sources
    pos, mass = cloud(4096)
    total = float(np.asarray(mass).sum())
    tree, _ = build_tree(pos, mass, unweighted_leaf_com=False)
    for theta, F, L, mp in [(0.5, 128, 256, 2), (0.5, 16, 8, 1),
                            (50.0, 16, 8, 1), (0.0, 64, 64, 2)]:
        planned = bh_plan_sources(tree, theta, F, L, plan_leaves=1,
                                  multipole=mp)
        tm = np.asarray(planned[2], np.float64).sum(axis=1)
        np.testing.assert_allclose(tm, total, rtol=1e-6,
                                   err_msg=f"theta={theta} F={F} L={L}")


def test_source_mass_conservation_deep_tree():
    """Mass conservation across the BUCKETED interior scan (≤4 levels per
    lax.scan, each bucket padded to its own deepest width). The small-N
    test above never enters the scan path (it needs depth−1−k0 ≥ 2, i.e.
    N ≥ 8,192 at F=16): N=32,768 runs one full 4-level bucket and
    N=65,536 runs two buckets (4+1) — a dropped or double-counted frontier
    at the bucket boundary shows up as a per-row mass defect here."""
    from nbody_simulation_tpu.ops.tree import build_tree
    from nbody_simulation_tpu.ops.traversal import bh_plan_sources
    for n in (32_768, 65_536):
        pos, mass = cloud(n)
        total = float(np.asarray(mass).sum())
        tree, _ = build_tree(pos, mass, unweighted_leaf_com=False)
        for theta, F, L, mp in [(50.0, 16, 32, 1), (0.5, 16, 8, 1)]:
            planned = bh_plan_sources(tree, theta, F, L, plan_leaves=8,
                                      multipole=mp)
            tm = np.asarray(planned[2], np.float64).sum(axis=1)
            np.testing.assert_allclose(tm, total, rtol=1e-6,
                                       err_msg=f"n={n} theta={theta}")


# --- quadrupole path --------------------------------------------------------

def test_quad_kernel_hessian_matches_autodiff():
    """The closed-form Hessian of f(d)=d/(‖d‖₁·‖d‖₂²) used by _quad_kernel
    must equal jax.hessian away from the |dx|/|dy| kinks."""
    import jax

    def f(d):
        l = jnp.abs(d[0]) + jnp.abs(d[1])
        s = d[0] ** 2 + d[1] ** 2
        return d / (l * s)

    def closed(dx, dy):
        sx, sy = np.sign(dx), np.sign(dy)
        l = abs(dx) + abs(dy)
        s = dx * dx + dy * dy
        a, b = 1 / l, 1 / s
        gx = -(sx * a * a * b + 2 * dx * a * b * b)
        gy = -(sy * a * a * b + 2 * dy * a * b * b)
        gxx = 2 * a**3 * b + 4 * abs(dx) * a * a * b * b - 2 * a * b * b \
            + 8 * dx * dx * a * b**3
        gyy = 2 * a**3 * b + 4 * abs(dy) * a * a * b * b - 2 * a * b * b \
            + 8 * dy * dy * a * b**3
        gxy = 2 * sx * sy * a**3 * b + 2 * (sx * dy + sy * dx) * a * a * b * b \
            + 8 * dx * dy * a * b**3
        Hx = np.array([[2 * gx + dx * gxx, gy + dx * gxy],
                       [gy + dx * gxy, dx * gyy]])
        Hy = np.array([[dy * gxx, gx + dy * gxy],
                       [gx + dy * gxy, 2 * gy + dy * gyy]])
        return Hx, Hy

    rng = np.random.default_rng(0)
    for _ in range(10):
        d = rng.uniform(1.0, 10.0, 2) * rng.choice([-1.0, 1.0], 2)
        H = jax.hessian(f)(jnp.asarray(d, jnp.float32))
        Hx, Hy = closed(float(d[0]), float(d[1]))
        np.testing.assert_allclose(np.asarray(H[0]), Hx, rtol=2e-4, atol=1e-9)
        np.testing.assert_allclose(np.asarray(H[1]), Hy, rtol=2e-4, atol=1e-9)


def test_tree_quadrupole_moments():
    """Root-level second moments must equal the direct mass-weighted moment
    sum about the root COM (parallel-axis combination)."""
    from nbody_simulation_tpu.ops.tree import build_tree
    pos, mass = cloud(1000, heavy=False)
    tree, _ = build_tree(pos, mass, unweighted_leaf_com=False)
    root = tree.levels[0]
    p, m = np.asarray(pos, np.float64), np.asarray(mass, np.float64)
    com = (p * m[:, None]).sum(0) / m.sum()
    d = p - com
    want = np.array([(m * d[:, 0] * d[:, 0]).sum(),
                     (m * d[:, 0] * d[:, 1]).sum(),
                     (m * d[:, 1] * d[:, 1]).sum()])
    got = np.asarray(root.quad[0], np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_quadrupole_beats_monopole_at_theta_half():
    """The <1e-3 force-error north star (BASELINE.md): multipole=2 must be
    well under it and strictly better than monopole on a clustered cloud."""
    from nbody_simulation_tpu.models.scenarios import plummer
    st = plummer(4096, seed=0)
    pos, mass = jnp.asarray(st.pos), jnp.asarray(st.mass)
    want = np.asarray(direct_accel(pos, mass))
    errs = {}
    for mp in (1, 2):
        got = np.asarray(bh_accel(pos, mass, theta=0.5, frontier_cap=128,
                                  leaf_cap=128, unweighted_leaf_com=False,
                                  multipole=mp))
        errs[mp] = rel_err(got, want)
    assert np.median(errs[2]) < 1e-3, np.median(errs[2])
    assert np.median(errs[2]) < 0.5 * np.median(errs[1])


def test_quadrupole_exact_at_theta0():
    # θ=0 never accepts a node, so the quad path must reduce to direct sum.
    pos, mass = cloud(1024)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(bh_accel(pos, mass, theta=0.0, frontier_cap=64,
                              leaf_cap=32, multipole=2))
    assert rel_err(got, want).max() < 1e-4


def test_deep_morton_keys_order_and_tree():
    """24-bit (two-word) keys must produce a valid Z-order: same multiset of
    particles, padding last, and a tree that still sums mass exactly."""
    from nbody_simulation_tpu.ops.morton import morton_order, morton_keys
    pos, mass = cloud(1500, heavy=False)
    order = np.asarray(morton_order(pos, mass, 100_000.0, bits=24))
    assert sorted(order.tolist()) == list(range(1500))
    hi, lo = morton_keys(pos, mass, 100_000.0, 24)
    k = (np.asarray(hi, np.int64)[order] << 24) | np.asarray(lo, np.int64)[order]
    assert (np.diff(k) >= 0).all()  # sorted by the combined 48-bit key


def test_leaf_size_variants_exact_at_theta0():
    pos, mass = cloud(512, heavy=False)
    want = np.asarray(direct_accel(pos, mass, row_chunk=512))
    for leaf in (32, 128):
        got = np.asarray(bh_accel(pos, mass, theta=0.0, leaf_size=leaf,
                                  frontier_cap=64, leaf_cap=32))
        e = rel_err(got, want)
        assert e.max() < 1e-4, (leaf, e.max())


def test_compact_ranked_matches_sorted_compact():
    # The dense rank compaction must be bit-identical to "stable argsort by
    # (distance, index), then prefix-compact" — including tie handling and
    # the overflow set (as a multiset; its order legitimately differs).
    import jax.numpy as jnp
    from nbody_simulation_tpu.ops.traversal import _compact, _compact_ranked

    rng = np.random.default_rng(7)
    G, K, cap = 23, 32, 12
    flags = jnp.asarray(rng.random((G, K)) < 0.6)
    vals = jnp.asarray(rng.integers(0, 999, (G, K)), jnp.int32)
    d2 = jnp.asarray(rng.integers(0, 5, (G, K)), jnp.float32)  # force ties

    perm = jnp.argsort(jnp.where(flags, d2, 3e38), axis=1, stable=True)
    take = lambda a: jnp.take_along_axis(a, perm, axis=1)
    l0, v0, o0 = _compact(take(flags), take(vals), cap)
    l1, v1, o1 = _compact_ranked(flags, vals, d2, cap)
    assert (np.asarray(l0) == np.asarray(l1)).all()
    assert (np.asarray(v0) == np.asarray(v1)).all()
    ov0 = np.sort(np.asarray(take(vals))[np.asarray(o0)])
    ov1 = np.sort(np.asarray(vals)[np.asarray(o1)])
    assert (ov0 == ov1).all()


def test_unknown_rcp_fails_loudly():
    # An unknown rcp mode must raise on BOTH backends — before this check
    # (_grouped_force) a typo silently ran as "approx" on TPU (mono_tile's
    # partition falls through) and as "exact" under interpret mode.
    import pytest
    from nbody_simulation_tpu.ops.traversal import bh_accel

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1e5, (256, 2)).astype(np.float32))
    mass = jnp.asarray(rng.integers(1, 100, 256).astype(np.float32))
    with pytest.raises(ValueError, match="rcp"):
        bh_accel(pos, mass, theta=50.0, rcp="bogus")

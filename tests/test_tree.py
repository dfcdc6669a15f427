"""Flat BVH build invariants (SURVEY.md §4: tree build invariants)."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.ops.morton import morton_encode, morton_order
from nbody_simulation_tpu.ops.tree import build_tree
from nbody_simulation_tpu.models.scenarios import uniform_disc


def make(n=1000, seed=0, heavy=True):
    st = uniform_disc(n, seed=seed)
    mass = np.asarray(st.mass).copy()
    if heavy:
        mass[0] = 75_000_000.0
    return jnp.asarray(st.pos), jnp.asarray(mass)


def test_morton_sort_padding_last():
    pos, mass = make(100)
    pos = jnp.concatenate([pos, jnp.full((28, 2), -1e6, jnp.float32)])
    mass = jnp.concatenate([mass, jnp.zeros(28, jnp.float32)])
    order = morton_order(pos, mass, 100_000.0)
    sorted_mass = np.asarray(mass)[np.asarray(order)]
    assert (sorted_mass[100:] == 0).all()
    codes = np.asarray(morton_encode(pos, mass, 100_000.0))[np.asarray(order)]
    assert (np.diff(codes) >= 0).all()


def test_mass_conservation_and_counts():
    pos, mass = make(1000)
    tree, order = build_tree(pos, mass)
    root = tree.levels[0]
    assert int(root.mass_i[0]) == int(np.asarray(mass, np.float64).astype(np.int64).sum())
    assert int(root.count[0]) == 1000
    # Leaf counts sum to N — every particle in exactly one leaf.
    leaves = tree.levels[-1]
    assert int(np.asarray(leaves.count).sum()) == 1000
    # Level-wise conservation.
    for lv in tree.levels:
        assert int(np.asarray(lv.mass_i).sum()) == int(np.asarray(mass, np.float64).astype(np.int64).sum())


def test_aabb_containment():
    pos, mass = make(500)
    tree, order = build_tree(pos, mass)
    spos = np.asarray(pos)[np.asarray(order)]
    leaves = tree.levels[-1]
    lmin = np.asarray(leaves.aabb_min)
    lmax = np.asarray(leaves.aabb_max)
    lp = np.asarray(tree.leaf_pos)
    lm = np.asarray(tree.leaf_mass)
    for leaf in range(lp.shape[0]):
        real = lm[leaf] > 0
        if real.any():
            assert (lp[leaf][real] >= lmin[leaf] - 1e-4).all()
            assert (lp[leaf][real] <= lmax[leaf] + 1e-4).all()
    # Parent AABBs contain child AABBs.
    for lvl in range(len(tree.levels) - 1):
        p, c = tree.levels[lvl], tree.levels[lvl + 1]
        pc = np.asarray(p.count)
        cmin = np.asarray(c.aabb_min).reshape(-1, 2, 2)
        cmax = np.asarray(c.aabb_max).reshape(-1, 2, 2)
        ccount = np.asarray(c.count).reshape(-1, 2)
        for k in range(pc.shape[0]):
            if pc[k] == 0:
                continue
            for j in range(2):
                if ccount[k, j] > 0:
                    assert (np.asarray(p.aabb_min)[k] <= cmin[k, j] + 1e-4).all()
                    assert (np.asarray(p.aabb_max)[k] >= cmax[k, j] - 1e-4).all()


def test_leaf_com_quirk():
    # Reference: leaf COM is the UNWEIGHTED mean (src/bvh_tree.rs:98-116).
    pos = jnp.asarray([[10.0, 10.0], [20.0, 20.0]], jnp.float32)
    mass = jnp.asarray([100.0, 1.0], jnp.float32)
    t_quirk, _ = build_tree(pos, mass, leaf_size=64, unweighted_leaf_com=True)
    np.testing.assert_allclose(np.asarray(t_quirk.levels[-1].com[0]),
                               [15.0, 15.0], rtol=1e-6)
    t_fix, _ = build_tree(pos, mass, leaf_size=64, unweighted_leaf_com=False)
    want = (np.array([10.0, 10.0]) * 100 + np.array([20.0, 20.0])) / 101.0
    np.testing.assert_allclose(np.asarray(t_fix.levels[-1].com[0]), want,
                               rtol=1e-6)


def test_internal_com_mass_weighted():
    # Two leaves -> root COM must be mass-weighted (src/bvh_tree.rs:148-155).
    n = 128  # leaf_size=64 → 2 leaves
    rng = np.random.default_rng(0)
    pos = np.zeros((n, 2), np.float32)
    pos[:64] = rng.uniform(0, 100, (64, 2))        # cluster A (morton-low)
    pos[64:] = rng.uniform(90_000, 99_000, (64, 2))  # cluster B
    mass = np.ones(n, np.float32)
    mass[0] = 1000.0
    tree, order = build_tree(jnp.asarray(pos), jnp.asarray(mass))
    lv = tree.levels
    leaves = lv[-1]
    m = np.asarray(leaves.mass_i, np.float64)
    com = np.asarray(leaves.com, np.float64)
    want = (com * m[:, None]).sum(0) / m.sum()
    np.testing.assert_allclose(np.asarray(lv[0].com[0]), want, rtol=1e-5)


def test_leaf_size_respected():
    pos, mass = make(300)
    tree, _ = build_tree(pos, mass, leaf_size=32)
    assert tree.leaf_pos.shape[1] == 32
    assert (np.asarray(tree.levels[-1].count) <= 32).all()


def test_morton_sort_state_matches_order_gather():
    # The multi-payload sort fast path must produce exactly the permutation
    # morton_order defines (stable, padding last) for both key depths.
    from nbody_simulation_tpu.ops.morton import morton_sort_state

    rng = np.random.default_rng(3)
    n = 4096
    pos = jnp.asarray(rng.uniform(0, 1e5, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    mass = jnp.asarray(np.where(rng.random(n) < 0.15, 0.0,
                                rng.integers(1, 50, n)), jnp.float32)
    for bits in (15, 24):
        order = morton_order(pos, mass, 1e5, bits=bits)
        sp, sv, sm = morton_sort_state(pos, vel, mass, 1e5, bits=bits)
        assert (np.asarray(pos[order]) == np.asarray(sp)).all(), bits
        assert (np.asarray(vel[order]) == np.asarray(sv)).all(), bits
        assert (np.asarray(mass[order]) == np.asarray(sm)).all(), bits

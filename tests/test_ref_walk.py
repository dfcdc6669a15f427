"""Reference-walk parity: the TPU walk vs the ACTUAL reference algorithm.

``oracle.bvh_build_oracle`` + ``oracle.bvh_walk_oracle`` port the reference's
mean-split BVH (reference src/bvh_tree.rs:57-96) and per-particle recursive
walk (src/main.rs:348-386) op-for-op. These tests measure both against the
order-independent direct-sum truth on a galaxy slice, at the reference's own
θ=50 and at physics-quality θ=0.5 — making the README's "quality ≥ reference
at equal θ" claim a measured assertion instead of an argument.

Measured margins behind the thresholds (N=4096 galaxy slice, 128 probes —
at N≲2048 both walks are near-exact and the comparison is noise):

- uniform masses (quirk-neutral): θ=50 ref median ≈ 0.38 vs ours ≈ 0.062;
  θ=0.5 ref ≈ 1.6e-4 vs ours (auto: quadrupole) ≈ 4.3e-6, mono ≈ 1.5e-4.
- with the two heavy bodies, error is dominated by the reference's
  unweighted-leaf-COM quirk for BOTH walks; at θ=0.5 ours ≈ 1.3e-3 vs
  ref ≈ 1.2e-2 median, and at θ=50 the medians land within ~1.5× of each
  other (0.21 vs 0.16) with ours ~1.8× better at p90.
"""

import numpy as np
import pytest

from nbody_simulation_tpu.models.scenarios import galaxy
from nbody_simulation_tpu.oracle import (bvh_build_oracle, bvh_walk_oracle,
                                         direct_accel_oracle)
from nbody_simulation_tpu.ops.traversal import bh_accel

N = 4096
PROBES = 128


def _slice(heavy: bool):
    st = galaxy(seed=0)
    rng = np.random.default_rng(0)
    body = rng.choice(np.arange(2, st.n_real), N - 2 * heavy, replace=False)
    sel = np.concatenate([[0, 1], body]) if heavy else body
    return np.asarray(st.pos)[sel], np.asarray(st.mass)[sel], rng


@pytest.fixture(scope="module")
def uniform_case():
    pos, mass, rng = _slice(heavy=False)
    tree = bvh_build_oracle(pos, mass)
    targets = rng.choice(len(pos), PROBES, replace=False)
    truth = direct_accel_oracle(pos, mass)[targets]
    return pos, mass, tree, targets, truth


@pytest.fixture(scope="module")
def heavy_case():
    pos, mass, rng = _slice(heavy=True)
    tree = bvh_build_oracle(pos, mass)
    targets = rng.choice(len(pos), PROBES, replace=False)
    truth = direct_accel_oracle(pos, mass)[targets]
    return pos, mass, tree, targets, truth


def _rel(a, truth):
    return (np.linalg.norm(a - truth, axis=1)
            / np.maximum(np.linalg.norm(truth, axis=1), 1e-12))


def _ref_errs(tree, pos, mass, targets, truth, theta):
    ref = np.stack([bvh_walk_oracle(tree, pos, mass, pos[t], theta)
                    for t in targets])
    return _rel(ref, truth)


def test_walk_beats_reference_theta50_uniform(uniform_case):
    pos, mass, tree, targets, truth = uniform_case
    er = _ref_errs(tree, pos, mass, targets, truth, 50.0)
    ours = np.asarray(bh_accel(pos, mass, theta=50.0, frontier_cap=64,
                               leaf_cap=64))[targets]
    eo = _rel(ours, truth)
    assert np.median(eo) <= np.median(er), (np.median(eo), np.median(er))
    assert np.percentile(eo, 90) <= np.percentile(er, 90)


def test_walk_beats_reference_theta_half_uniform(uniform_case):
    pos, mass, tree, targets, truth = uniform_case
    er = _ref_errs(tree, pos, mass, targets, truth, 0.5)
    # Default quality path (auto: quadrupole + deep keys).
    ours = np.asarray(bh_accel(pos, mass, theta=0.5, frontier_cap=256,
                               leaf_cap=256))[targets]
    eo = _rel(ours, truth)
    assert np.median(eo) <= np.median(er), (np.median(eo), np.median(er))
    assert np.percentile(eo, 90) <= np.percentile(er, 90)
    # Strict-parity monopole walk: same approximation order as the
    # reference — stays within 1.5× of its median (different tree shapes:
    # Morton split vs mean split; conservatism buys the p90).
    mono = np.asarray(bh_accel(pos, mass, theta=0.5, frontier_cap=256,
                               leaf_cap=256, multipole=1,
                               morton_bits=15))[targets]
    em = _rel(mono, truth)
    assert np.median(em) <= 1.25 * np.median(er)


def test_walk_beats_reference_theta_half_heavy(heavy_case):
    # With the 75M/750k-mass bodies both walks are dominated by the
    # reference's unweighted-leaf-COM quirk; ours must still be no worse.
    pos, mass, tree, targets, truth = heavy_case
    er = _ref_errs(tree, pos, mass, targets, truth, 0.5)
    ours = np.asarray(bh_accel(pos, mass, theta=0.5, frontier_cap=256,
                               leaf_cap=256, multipole=1,
                               morton_bits=15))[targets]
    eo = _rel(ours, truth)
    assert np.median(eo) <= np.median(er), (np.median(eo), np.median(er))
    assert np.percentile(eo, 90) <= np.percentile(er, 90)


def test_walk_comparable_reference_theta50_heavy(heavy_case):
    pos, mass, tree, targets, truth = heavy_case
    er = _ref_errs(tree, pos, mass, targets, truth, 50.0)
    ours = np.asarray(bh_accel(pos, mass, theta=50.0, frontier_cap=64,
                               leaf_cap=64))[targets]
    eo = _rel(ours, truth)
    # Quirk-dominated regime: tree shapes randomize the realized error —
    # assert parity at median and strictly better tails.
    assert np.median(eo) <= 1.5 * np.median(er)
    assert np.percentile(eo, 90) <= np.percentile(er, 90)


def test_walk_beats_reference_at_resolved_defaults(heavy_case):
    """The DEFAULT θ=50 configuration (SimConfig-resolved caps and
    plan_leaves) must beat the reference walk — this gates any retuning of
    the performance defaults against the fidelity claim."""
    from nbody_simulation_tpu.config import SimConfig
    cfg = SimConfig(force_path="bh")
    pos, mass, tree, targets, truth = heavy_case
    er = _ref_errs(tree, pos, mass, targets, truth, 50.0)
    f, l = cfg.resolved_caps()
    ours = np.asarray(bh_accel(pos, mass, theta=50.0, frontier_cap=f,
                               leaf_cap=l,
                               plan_leaves=cfg.plan_leaves))[targets]
    eo = _rel(ours, truth)
    assert np.median(eo) <= np.median(er), (np.median(eo), np.median(er))
    assert np.percentile(eo, 90) <= np.percentile(er, 90)

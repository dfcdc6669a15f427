"""Force-kernel parity vs the NumPy oracle (reference src/main.rs:234-253)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nbody_simulation_tpu.ops.force import pair_accel, direct_accel, FLT_MIN_NORMAL
from nbody_simulation_tpu.oracle import pair_accel_oracle, direct_accel_oracle


def rand_cloud(rng, n, world=100_000.0):
    pos = rng.uniform(0, world, size=(n, 2)).astype(np.float32)
    mass = rng.integers(1, 100, size=n).astype(np.float32)
    return pos, mass


def test_single_pair_bitwise(rng):
    # On CPU, XLA f32 ops are IEEE — demand bitwise equality per pair.
    for _ in range(200):
        p1 = rng.uniform(0, 1e5, 2).astype(np.float32)
        p2 = rng.uniform(0, 1e5, 2).astype(np.float32)
        m = np.float32(rng.integers(1, 10**8))
        want = pair_accel_oracle(p1, p2, m)
        ax, ay = pair_accel(jnp.float32(p2[0] - p1[0]), jnp.float32(p2[1] - p1[1]), m)
        got = np.array([ax, ay], np.float32)
        np.testing.assert_array_equal(got, want)


def test_self_pair_is_skipped():
    ax, ay = pair_accel(jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1e8))
    assert ax == 0.0 and ay == 0.0


def test_subnormal_l1_is_skipped():
    # |dx|+|dy| below FLT_MIN_NORMAL → is_normal() false → masked.
    tiny = jnp.float32(FLT_MIN_NORMAL / 4)
    ax, ay = pair_accel(tiny, jnp.float32(0.0), jnp.float32(1e8))
    assert ax == 0.0 and ay == 0.0


def test_nan_inf_guard():
    for bad in (np.float32(np.nan), np.float32(np.inf)):
        ax, ay = pair_accel(jnp.float32(bad), jnp.float32(1.0), jnp.float32(5.0))
        assert np.isfinite(ax) and np.isfinite(ay)
        assert ax == 0.0


def test_softening_clamp():
    # Two particles 0.01 apart: d2 = 1e-4 < 1e-3 → clamped to 1e-3.
    want = pair_accel_oracle([0.0, 0.0], [0.01, 0.0], 7.0)
    ax, ay = pair_accel(jnp.float32(0.01), jnp.float32(0.0), jnp.float32(7.0))
    np.testing.assert_array_equal(np.array([ax, ay], np.float32), want)
    # Hand value: dx*m/(s*max(d2,1e-3)) = 0.01*7/(0.01*1e-3) = 7000.
    assert abs(float(ax) - 7000.0) < 1e-2


def test_l1_times_l2sq_denominator():
    # Distinguishes the reference law from classical d^3: at (3,4) offset
    # L1=7, d2=25 → a = m*diff/(7*25), whereas d^3 would give m*diff/125.
    got = pair_accel(jnp.float32(3.0), jnp.float32(4.0), jnp.float32(175.0))
    np.testing.assert_allclose(np.array(got), [3.0, 4.0], rtol=1e-6)


def test_direct_accel_vs_oracle(rng):
    n = 256
    pos, mass = rand_cloud(rng, n)
    want = direct_accel_oracle(pos, mass)
    got = np.asarray(direct_accel(jnp.asarray(pos), jnp.asarray(mass)))
    denom = np.maximum(np.abs(want), 1e-12)
    rel = np.abs(got - want) / denom
    assert rel.max() < 1e-3, rel.max()


def test_direct_accel_chunking_invariance(rng):
    n = 512
    pos, mass = rand_cloud(rng, n)
    a1 = np.asarray(direct_accel(jnp.asarray(pos), jnp.asarray(mass), row_chunk=512))
    a2 = np.asarray(direct_accel(jnp.asarray(pos), jnp.asarray(mass), row_chunk=128))
    np.testing.assert_array_equal(a1, a2)


def test_direct_accel_at_matches_rows(rng):
    """Sampled-target direct accel: passing rows of pos as targets must
    reproduce direct_accel for those rows bitwise (same pair order, same
    is_normal self-skip), at any chunking and for non-multiple M."""
    from nbody_simulation_tpu.ops.force import direct_accel_at
    n = 384
    pos, mass = rand_cloud(rng, n)
    full = np.asarray(direct_accel(jnp.asarray(pos), jnp.asarray(mass)))
    idx = rng.choice(n, 100, replace=False)
    got = np.asarray(direct_accel_at(
        jnp.asarray(pos[idx]), jnp.asarray(pos), jnp.asarray(mass),
        row_chunk=64))
    np.testing.assert_array_equal(got, full[idx])


def test_zero_mass_padding_exerts_nothing(rng):
    n = 128
    pos, mass = rand_cloud(rng, n)
    pad_pos = np.full((64, 2), -1e6, np.float32) + np.arange(64, dtype=np.float32)[:, None]
    pos2 = np.concatenate([pos, pad_pos])
    mass2 = np.concatenate([mass, np.zeros(64, np.float32)])
    a1 = np.asarray(direct_accel(jnp.asarray(pos), jnp.asarray(mass), row_chunk=64))
    a2 = np.asarray(direct_accel(jnp.asarray(pos2), jnp.asarray(mass2), row_chunk=64))
    np.testing.assert_array_equal(a2[:n], a1)


def test_close_pair_matches_oracle_bitwise(rng):
    # Pairs inside the softening radius, incl. huge masses (overflow order).
    for _ in range(50):
        p1 = rng.uniform(0, 1.0, 2).astype(np.float32)
        p2 = (p1 + rng.normal(0, 0.005, 2)).astype(np.float32)
        m = np.float32(75_000_000.0)
        want = pair_accel_oracle(p1, p2, m)
        ax, ay = pair_accel(jnp.float32(p2[0] - p1[0]), jnp.float32(p2[1] - p1[1]), m)
        np.testing.assert_array_equal(np.array([ax, ay], np.float32), want)


def test_direct_accel_is_differentiable(rng):
    # The functional force path is jax.grad-compatible — a capability the
    # reference cannot offer. Gradient of total |accel|^2 wrt positions.
    import jax
    pos, mass = rand_cloud(rng, 64)
    pos_j, mass_j = jnp.asarray(pos), jnp.asarray(mass)

    def loss(p):
        a = direct_accel(p, mass_j, row_chunk=64)
        return (a ** 2).sum()

    g = jax.grad(loss)(pos_j)
    assert g.shape == pos_j.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

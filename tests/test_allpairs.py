"""Pallas all-pairs kernel vs the pure-JAX direct path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.ops.allpairs import allpairs_accel
from nbody_simulation_tpu.ops.force import direct_accel
from nbody_simulation_tpu.state import ParticleState


def cloud(rng, n):
    pos = rng.uniform(0, 100_000, size=(n, 2)).astype(np.float32)
    mass = rng.integers(1, 100, size=n).astype(np.float32)
    mass[0] = 75_000_000.0
    return jnp.asarray(pos), jnp.asarray(mass)


def test_matches_direct(rng):
    pos, mass = cloud(rng, 512)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(allpairs_accel(pos, mass, tile_i=128, tile_j=256,
                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_tile_shape_invariance(rng):
    pos, mass = cloud(rng, 256)
    a1 = np.asarray(allpairs_accel(pos, mass, tile_i=64, tile_j=256, interpret=True))
    a2 = np.asarray(allpairs_accel(pos, mass, tile_i=256, tile_j=64, interpret=True))
    np.testing.assert_allclose(a1, a2, rtol=2e-5, atol=1e-7)


def test_padding_inert(rng):
    pos, mass = cloud(rng, 200)
    st = ParticleState.create(pos, jnp.zeros_like(pos), mass).pad_to(128)
    full = np.asarray(allpairs_accel(st.pos, st.mass, tile_i=64, tile_j=128,
                                     interpret=True))
    small = np.asarray(direct_accel(pos, mass))
    np.testing.assert_allclose(full[:200], small, rtol=2e-5, atol=1e-7)


def test_indivisible_n_raises(rng):
    pos, mass = cloud(rng, 200)
    try:
        allpairs_accel(pos, mass, tile_i=128, tile_j=128, interpret=True)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_clamp_rcp_modes_accepted(rng):
    # Plumbing: the "+clamp" guard modes flow through allpairs_accel (on
    # CPU the kernel runs interpreted with rcp forced to "exact", so this
    # checks acceptance + unchanged results, not the TPU fast path).
    pos, mass = cloud(rng, 256)
    want = np.asarray(allpairs_accel(pos, mass, tile_i=64, tile_j=256,
                                     interpret=True))
    got = np.asarray(allpairs_accel(pos, mass, tile_i=64, tile_j=256,
                                    interpret=True, rcp="approx+clamp"))
    np.testing.assert_array_equal(got, want)


def test_clamp_guard_identity():
    # The mask→clamp rewrite (ops/allpairs.mono_tile, "+clamp" modes) is
    # bitwise-identical whenever every pair separation is exactly 0 or has
    # L1 norm ≥ L1_CLAMP. Emulate both guards with exact division (the VPU
    # reciprocal is TPU-only) over the full reachable range, including the
    # reference's heavy mass and coincident pairs.
    from nbody_simulation_tpu.ops.allpairs import L1_CLAMP

    dx = np.float32([0.0, 0.0, 1e-12, 7.8e-3, -7.8e-3, 1.0, -4.2e4, 9.9e4])
    dy = np.float32([0.0, -0.0, 0.0, 0.0, 1e-9, -2.0, 3.3e3, -9.9e4])
    mj = np.float32([75e6, 1.0, 99.0, 75e6, 1.0, 50.0, 99.0, 75e6])
    soft = np.float32(1e-3)

    s = np.abs(dx) + np.abs(dy)
    d2 = np.maximum(dx * dx + dy * dy, soft)

    # mask guard (reference is_normal semantics)
    normal = np.isfinite(s) & (s >= 1.17549435e-38)
    r_mask = np.where(normal, np.float32(1.0) / np.where(normal, s * d2, 1), 0)
    cx_mask = dx * (mj * r_mask)

    # clamp guard
    r_clamp = np.float32(1.0) / (np.maximum(s, np.float32(L1_CLAMP)) * d2)
    cx_clamp = dx * (mj * r_clamp)

    assert np.isfinite(r_clamp).all()          # clamp never overflows
    np.testing.assert_array_equal(cx_clamp, cx_mask)
    # and the clamped weight stays f32-finite even at the largest mass
    assert np.isfinite(mj * r_clamp).all()


def test_sym_matches_direct(rng):
    # The symmetric (third-law) kernel must reproduce the ordered kernel /
    # direct path up to fp32 summation order, across tile-count parities:
    # nt=1 (diagonal only), even nt (masked duplicate round nt/2), odd nt.
    from nbody_simulation_tpu.ops.allpairs import allpairs_accel_sym
    pos, mass = cloud(rng, 768)
    want = np.asarray(direct_accel(pos, mass))
    for tile in (768, 384, 256, 128):   # nt = 1, 2, 3, 6
        got = np.asarray(allpairs_accel_sym(pos, mass, tile=tile,
                                            interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7,
                                   err_msg=f"tile={tile}")


def test_sym_padding_inert(rng):
    from nbody_simulation_tpu.ops.allpairs import allpairs_accel_sym
    pos, mass = cloud(rng, 200)
    st = ParticleState.create(pos, jnp.zeros_like(pos), mass).pad_to(128)
    full = np.asarray(allpairs_accel_sym(st.pos, st.mass, tile=64,
                                         interpret=True))
    small = np.asarray(direct_accel(pos, mass))
    np.testing.assert_allclose(full[:200], small, rtol=2e-5, atol=1e-7)
    # padding rows receive force from real particles but exert none; the
    # j-side accumulator must leave them zero-mass-consistent (finite)
    assert np.isfinite(full).all()

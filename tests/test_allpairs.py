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

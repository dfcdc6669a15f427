"""Symmetric ring (third law ACROSS shards) on the virtual CPU mesh.

parallel/ring.ring_allpairs_accel_symring forward-ports the cotangent
ring-circuit dataflow of ring_grad._bwd to the force pass: each unordered
cross-shard pair is evaluated once by ops/allpairs.allpairs_accel_sym_pair
and the j-side partial rides the rotating tile home (round-4 verdict
item 5). These tests pin the dataflow — pair coverage at even P (half
round), odd P, and the cross-shard kernel itself — against the ordered
ring and direct summation."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.ops.allpairs import (allpairs_accel,
                                               allpairs_accel_sym_pair)
from nbody_simulation_tpu.ops.force import direct_accel
from nbody_simulation_tpu.parallel import (make_1d_mesh, ring_allpairs_accel,
                                           ring_allpairs_accel_symring)


def _rel(got, want):
    return (np.linalg.norm(got - want, axis=1)
            / np.maximum(np.linalg.norm(want, axis=1), 1e-12))


def test_sym_pair_matches_ordered_cross(rng):
    """The cross-shard symmetric kernel: BOTH returned sides equal the
    ordered kernel's one-sided answers (i from all j, j from all i)."""
    pi = jnp.asarray(rng.uniform(0, 1e5, (512, 2)).astype(np.float32))
    pj = jnp.asarray(rng.uniform(0, 1e5, (512, 2)).astype(np.float32))
    mi = jnp.asarray(rng.integers(1, 100, 512).astype(np.float32))
    mj = jnp.asarray(rng.integers(1, 100, 512).astype(np.float32))
    ai, aj = allpairs_accel_sym_pair(pi, mi, pj, mj, tile=128)
    want_i = np.asarray(allpairs_accel(pi, mi, src_pos=pj, src_mass=mj,
                                       tile_i=128, tile_j=128))
    want_j = np.asarray(allpairs_accel(pj, mj, src_pos=pi, src_mass=mi,
                                       tile_i=128, tile_j=128))
    assert _rel(np.asarray(ai), want_i).max() < 1e-5
    assert _rel(np.asarray(aj), want_j).max() < 1e-5


def test_sym_pair_zero_mass_padding(rng):
    """Zero-mass rows exert nothing and receive finite zeros-from-nothing
    (the padding convention) on BOTH sides."""
    pi = jnp.asarray(rng.uniform(0, 1e5, (256, 2)).astype(np.float32))
    pj = jnp.asarray(rng.uniform(0, 1e5, (256, 2)).astype(np.float32))
    mi = np.asarray(rng.integers(1, 100, 256).astype(np.float32))
    mj = np.asarray(rng.integers(1, 100, 256).astype(np.float32))
    mi[200:] = 0.0
    ai, aj = allpairs_accel_sym_pair(pi, jnp.asarray(mi), pj,
                                     jnp.asarray(mj), tile=64)
    want_j = np.asarray(allpairs_accel(pj, jnp.asarray(mj), src_pos=pi,
                                       src_mass=jnp.asarray(mi),
                                       tile_i=64, tile_j=64))
    assert np.isfinite(np.asarray(ai)).all()
    assert _rel(np.asarray(aj), want_j).max() < 1e-5


def test_symring_matches_direct_even_p(rng):
    """P=8 (even — exercises the half-round gate at k=P/2)."""
    mesh = make_1d_mesh(8)
    st = uniform_disc(1024, seed=0)
    mass = np.asarray(st.mass).copy()
    mass[0] = 750_000.0
    pos, mass = jnp.asarray(st.pos), jnp.asarray(mass)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(ring_allpairs_accel_symring(pos, mass, mesh,
                                                 sym_tile=64))
    assert _rel(got, want).max() < 1e-4


def test_symring_matches_direct_odd_p():
    """P=5 (odd — every round is full, no gate)."""
    mesh = make_1d_mesh(5)
    st = uniform_disc(1280, seed=1)
    pos, mass = jnp.asarray(st.pos), jnp.asarray(st.mass)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(ring_allpairs_accel_symring(pos, mass, mesh,
                                                 sym_tile=64))
    assert _rel(got, want).max() < 1e-4


def test_symring_matches_ordered_ring_small_p():
    """P=2 and P=4: the symmetric circuit computes the same physics as the
    ordered ring (fp32 summation order only)."""
    st = uniform_disc(512, seed=2)
    pos, mass = jnp.asarray(st.pos), jnp.asarray(st.mass)
    for nd in (2, 4):
        mesh = make_1d_mesh(nd)
        a = np.asarray(ring_allpairs_accel(pos, mass, mesh,
                                           tile_i=64, tile_j=64))
        b = np.asarray(ring_allpairs_accel_symring(pos, mass, mesh,
                                                   sym_tile=64))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7)

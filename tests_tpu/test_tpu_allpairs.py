"""TPU-hardware regression for the symmetric (third-law) all-pairs kernel.

The riskiest construct in the repo — input_output_aliases read-modify-write
accumulators revisited across grid steps (ops/allpairs._allpairs_sym_kernel)
— is unreachable from the CPU suite (interpret mode deliberately runs one
pallas_call per round). This test pins it on hardware at every tile-count
regime: nt=1,2,3 (per-round routing — the depth-2 prefetch/writeback overlap
makes the flattened grid unsafe below nt=4), nt=4,5 (smallest grid-path
counts, odd and even), and an even mid-size nt (the masked duplicate round).

Reference law anchor: /root/reference/src/main.rs:234-253.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_simulation_tpu.ops.allpairs import allpairs_accel, allpairs_accel_sym

from conftest import requires_tpu

pytestmark = requires_tpu


def cloud(rng, n):
    pos = rng.uniform(0, 100_000, size=(n, 2)).astype(np.float32)
    mass = rng.integers(1, 100, size=n).astype(np.float32)
    mass[0] = 75_000_000.0
    return jnp.asarray(pos), jnp.asarray(mass)


@pytest.mark.parametrize("nt", [1, 2, 3, 4, 5, 8])
def test_sym_matches_ordered_on_tpu(rng, nt):
    tile = 256  # small tiles: bound compile cost per parametrization
    n = tile * nt
    pos, mass = cloud(rng, n)
    a_ord = np.asarray(allpairs_accel(pos, mass, tile_i=256, tile_j=256))
    a_sym = np.asarray(allpairs_accel_sym(pos, mass, tile=tile, strips=4))
    scale = np.abs(a_ord).max()
    err = np.abs(a_sym - a_ord).max() / scale
    # fp32 summation-order deviation only; a stale aliased read drops a
    # whole tile's forces and lands far outside this bound.
    assert err < 1e-4, (nt, err)
    assert np.isfinite(a_sym).all()


def test_sym_rcp_modes_on_tpu(rng):
    pos, mass = cloud(rng, 1024)
    a_ref = np.asarray(allpairs_accel(pos, mass, tile_i=256, tile_j=512))
    for rcp in ("newton", "approx+clamp"):
        a_sym = np.asarray(allpairs_accel_sym(pos, mass, tile=256, rcp=rcp))
        scale = np.abs(a_ref).max()
        assert np.abs(a_sym - a_ref).max() / scale < 1e-3, rcp

"""Occupancy-bucketed force sweep (ops/traversal._grouped_force_bucketed).

Plan-time work elision: 128-group blocks sorted by max last-nonzero source
column, sparse tail blocks swept with a static narrow tile. Two invariants:

- when the static budgets hold the data, the bucketed result is BITWISE the
  full sweep (zero-mass columns contribute exact 0, the un-permutation is
  exact);
- when any low-bucket block exceeds its budget, the lax.cond guard falls
  back to the full sweep — quality is never data-dependent.
"""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.ops.traversal import (_grouped_force,
                                                _grouped_force_bucketed)


def _scene(rng, g=512, s=64, c=512, sparse_frac=0.5, dense_blocks=(0, 2)):
    """Per-group sources where only ``dense_blocks`` (of g/128) carry mass
    past sparse_frac·c — interleaved so the occupancy sort matters."""
    tgt = rng.uniform(0, 1e5, (g, s, 2)).astype(np.float32)
    sx = rng.uniform(0, 1e5, (g, c)).astype(np.float32)
    sy = rng.uniform(0, 1e5, (g, c)).astype(np.float32)
    sm = rng.integers(1, 100, (g, c)).astype(np.float32)
    cut = int(c * sparse_frac)
    for b in range(g // 128):
        if b not in dense_blocks:
            sm[b * 128:(b + 1) * 128, cut:] = 0.0
    return (jnp.asarray(tgt), jnp.asarray(sx), jnp.asarray(sy),
            jnp.asarray(sm))


def test_bucketed_bitwise_equals_full_when_budgets_hold(rng):
    tgt, sx, sy, sm = _scene(rng)
    want = np.asarray(_grouped_force(tgt, sx, sy, sm, softening2=1e-3,
                                     rcp="exact", interpret=True))
    got = np.asarray(_grouped_force_bucketed(
        tgt, sx, sy, sm, softening2=1e-3, rcp="exact", interpret=True,
        block_frac=0.5, col_frac=0.5))
    np.testing.assert_array_equal(got, want)


def test_bucketed_guard_falls_back_when_dense(rng):
    """Uniform occupancy: every block's last nonzero is the last column —
    the guard must reject the narrow budget and produce the full answer."""
    tgt, sx, sy, sm = _scene(rng, dense_blocks=(0, 1, 2, 3))
    want = np.asarray(_grouped_force(tgt, sx, sy, sm, softening2=1e-3,
                                     rcp="exact", interpret=True))
    got = np.asarray(_grouped_force_bucketed(
        tgt, sx, sy, sm, softening2=1e-3, rcp="exact", interpret=True,
        block_frac=0.5, col_frac=0.5))
    np.testing.assert_array_equal(got, want)


def test_bucketed_through_bh_accel_galaxy_slice():
    """End-to-end: bh_accel(sweep_buckets=…) equals the default sweep on a
    galaxy slice (the occupancy-skewed scene this path exists for)."""
    from nbody_simulation_tpu.models.scenarios import galaxy
    from nbody_simulation_tpu.ops.traversal import bh_accel

    st = galaxy(seed=0, n_random=30_000)
    kw = dict(theta=50.0, plan_leaves=4, frontier_cap=16, leaf_cap=16,
              rcp="exact")
    want = np.asarray(bh_accel(st.pos, st.mass, **kw))
    got = np.asarray(bh_accel(st.pos, st.mass, sweep_buckets=(0.5, 0.5),
                              **kw))
    np.testing.assert_array_equal(got, want)

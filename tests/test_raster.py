"""On-device raster vs the exact sequential oracle (src/main.rs:41-72)."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.ops.raster import render_frame
from nbody_simulation_tpu.oracle import draw_oracle
from nbody_simulation_tpu.models.scenarios import uniform_disc


def check(pos, vel, mass, **kw):
    want = draw_oracle(pos, vel, mass, **kw)
    got = np.asarray(render_frame(jnp.asarray(pos), jnp.asarray(vel),
                                  jnp.asarray(mass), **kw))
    np.testing.assert_array_equal(got, want)


def test_random_cloud_pixel_exact(rng):
    n = 5000
    pos = rng.uniform(-1000, 101_000, (n, 2)).astype(np.float32)  # some OOB
    vel = rng.normal(0, 20, (n, 2)).astype(np.float32)
    mass = rng.integers(1, 30, n).astype(np.float32)  # mix heavy/light
    check(pos, vel, mass)


def test_heavy_wins_regardless_of_order(rng):
    # Same pixel: light before heavy and heavy before light.
    pos = np.array([[100.0, 100.0], [101.0, 101.0],
                    [50_000.0, 50_000.0]], np.float32)
    vel = np.zeros((3, 2), np.float32)
    for masses in ([1.0, 100.0, 1.0], [100.0, 1.0, 1.0]):
        check(pos, vel, np.array(masses, np.float32))


def test_alpha_saturation(rng):
    # 40 light particles on one pixel: α = min(400, 250) = 250.
    n = 40
    pos = np.full((n, 2), 500.0, np.float32)
    vel = rng.normal(0, 5, (n, 2)).astype(np.float32)
    mass = np.ones(n, np.float32)
    frame = np.asarray(render_frame(jnp.asarray(pos), jnp.asarray(vel),
                                    jnp.asarray(mass)))
    cy, cx = 500 // 80, 500 // 80
    assert frame[cy, cx, 3] == 250
    check(pos, vel, mass)


def test_velocity_tint_saturates(rng):
    pos = np.array([[100.0, 100.0], [300.0, 300.0]], np.float32)
    vel = np.array([[1e6, 1e6], [0.5, 0.5]], np.float32)  # sat / small
    mass = np.ones(2, np.float32)
    check(pos, vel, mass)


def test_nan_positions_skipped():
    pos = np.array([[np.nan, 100.0], [200.0, 200.0]], np.float32)
    vel = np.zeros((2, 2), np.float32)
    mass = np.ones(2, np.float32)
    check(pos, vel, mass)


def test_sparse_frame_matches_dense(rng):
    from nbody_simulation_tpu.ops.raster import (render_frame_sparse,
                                                 sparse_to_frame)
    n = 3000
    pos = rng.uniform(-100, 100_500, (n, 2)).astype(np.float32)
    vel = rng.normal(0, 10, (n, 2)).astype(np.float32)
    mass = rng.integers(1, 30, n).astype(np.float32)
    dense = np.asarray(render_frame(jnp.asarray(pos), jnp.asarray(vel),
                                    jnp.asarray(mass)))
    idx, vals = render_frame_sparse(jnp.asarray(pos), jnp.asarray(vel),
                                    jnp.asarray(mass), cap=3072)
    got = sparse_to_frame(idx, vals)
    np.testing.assert_array_equal(got, dense)


def test_galaxy_slice_pixel_exact():
    st = uniform_disc(20_000, seed=5)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel) * 30.0
    mass = np.asarray(st.mass).copy()
    mass[:5] = 75_000_000.0
    check(pos, vel.astype(np.float32), mass)


def test_sparse_cap_covers_all_lit_pixels(rng):
    # cap >= particle count is exact: one particle lights at most one pixel.
    from nbody_simulation_tpu.ops.raster import (render_frame_sparse,
                                                 sparse_to_frame)
    n = 513  # not a multiple of anything
    pos = rng.uniform(0, 100_000, (n, 2)).astype(np.float32)
    vel = rng.normal(0, 5, (n, 2)).astype(np.float32)
    mass = np.ones(n, np.float32)
    dense = np.asarray(render_frame(jnp.asarray(pos), jnp.asarray(vel),
                                    jnp.asarray(mass)))
    idx, vals = render_frame_sparse(jnp.asarray(pos), jnp.asarray(vel),
                                    jnp.asarray(mass), cap=640)
    np.testing.assert_array_equal(sparse_to_frame(idx, vals), dense)


def test_pack_tint_branches_identical(rng):
    """The packed-key path (idx·256+vterm in one scatter-max) and the
    big-N gather path (idx key + npix tint gather) are alternative
    encodings of the SAME reductions — all four per-pixel outputs must be
    identical, including heavy/light shadowing pixels."""
    from nbody_simulation_tpu.ops.raster import accumulate_pixels

    n = 4096
    pos = rng.uniform(0, 100_000, (n, 2)).astype(np.float32)
    pos[1] = pos[0]  # force a shadowing pixel: heavy + light co-located
    vel = rng.normal(0, 20, (n, 2)).astype(np.float32)
    mass = rng.integers(1, 30, n).astype(np.float32)
    mass[0] = 100.0
    args = (jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(mass),
            100_000.0, 1250, 10.0)
    a = accumulate_pixels(*args, pack_tint=True)
    b = accumulate_pixels(*args, pack_tint=False)
    for x, y, name in zip(a, b, ("green", "count", "last", "vlast")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=name)

"""Scenario generation parity (reference src/main.rs:255-346)."""

import numpy as np

from nbody_simulation_tpu.models.scenarios import galaxy, uniform_disc, plummer


def test_galaxy_structure():
    st = galaxy(seed=0)
    pos = np.asarray(st.pos)
    vel = np.asarray(st.vel)
    mass = np.asarray(st.mass)

    # Heavy bodies exactly as src/main.rs:282-291.
    np.testing.assert_array_equal(pos[0], [35_000.0, 35_000.0])
    np.testing.assert_array_equal(vel[0], [200.0, 250.0])
    assert mass[0] == 75_000_000.0
    np.testing.assert_array_equal(pos[1], [60_000.0, 60_000.0])
    np.testing.assert_array_equal(vel[1], [0.0, 0.0])
    assert mass[1] == 750_000.0

    # Expected total ≈ 151,382 (SURVEY.md §2.8); annulus count is random.
    n = st.n_real
    n_annulus = n - 2 - 100_000
    assert 49_000 < n_annulus < 54_000, n_annulus

    # All annulus members inside the ring radii and on the 14-unit lattice.
    ring = pos[2:2 + n_annulus]
    d2 = ((ring - [60_000.0, 60_000.0]) ** 2).sum(axis=1)
    assert (d2 > 500_000.0).all() and (d2 < 15_000_000.0).all()
    assert np.allclose(ring % 14.0, 0.0)

    # Tangential orbital velocity: v = rotate_right(r)·sqrt(sqrt(750000)/d2)
    # (src/main.rs:323-324) → v ⟂ r and |v| = sqrt(sqrt(750000)/d2)·|r|.
    r = ring - [60_000.0, 60_000.0]
    rvel = vel[2:2 + n_annulus]
    dot = (r * rvel).sum(axis=1)
    assert np.abs(dot / (np.linalg.norm(r, axis=1) * np.linalg.norm(rvel, axis=1))).max() < 1e-5
    want_speed = np.linalg.norm(r, axis=1) * np.sqrt(np.sqrt(750_000.0) / d2)
    np.testing.assert_allclose(np.linalg.norm(rvel, axis=1), want_speed, rtol=1e-4)

    # Random disc: 100k unit masses within 25000 of (50000,50000).
    disc = pos[2 + n_annulus:]
    assert disc.shape[0] == 100_000
    dd = np.linalg.norm(disc - [50_000.0, 50_000.0], axis=1)
    assert dd.max() <= 25_000.0 * (1 + 1e-6)
    assert (mass[2:] == 1.0).all()
    # Velocities inside the unit disc (rand_disc, src/main.rs:255-258).
    dvel = vel[2 + n_annulus:]
    assert np.linalg.norm(dvel, axis=1).max() <= 1.0 + 1e-6


def test_galaxy_deterministic():
    a = galaxy(seed=3)
    b = galaxy(seed=3)
    assert a.n == b.n
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_uniform_disc_and_plummer():
    st = uniform_disc(4096, seed=1)
    assert st.n == 4096
    d = np.linalg.norm(np.asarray(st.pos) - [50_000.0, 50_000.0], axis=1)
    assert d.max() <= 25_000.0 * (1 + 1e-6)

    pl = plummer(1024, seed=1)
    assert pl.n == 1024
    assert np.isfinite(np.asarray(pl.pos)).all()
    # Plummer should be strongly centrally concentrated.
    d = np.linalg.norm(np.asarray(pl.pos) - [50_000.0, 50_000.0], axis=1)
    assert np.median(d) < 10_000.0


def test_collision_scenario():
    from nbody_simulation_tpu.models.scenarios import collision
    st = collision(seed=0, n_per_galaxy=1000)
    assert st.n == 2002
    mass = np.asarray(st.mass)
    assert (mass == 5_000_000.0).sum() == 2
    assert np.isfinite(np.asarray(st.vel)).all()

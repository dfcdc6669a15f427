"""Long-horizon integration checks (BASELINE.json config 2 coverage):
BH trajectories vs direct-sum trajectories, divergence guard, profiling."""

import numpy as np
import pytest

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import plummer
from nbody_simulation_tpu.models.world import World
from nbody_simulation_tpu.utils.telemetry import Counting


def run_world(force_path, n_steps=30, **cfg_kw):
    cfg = SimConfig(force_path=force_path, tile_i=64, tile_j=64, **cfg_kw)
    w = World(plummer(1024, seed=7), cfg)
    w.run(n_steps)
    pos = np.asarray(w.state.pos[:w.state.n_real])
    # The BH path keeps particles in Morton order (like the reference's
    # in-place partition) — canonicalize ordering before comparing runs.
    return pos[np.lexsort((pos[:, 1], pos[:, 0]))], w


def test_bh_trajectory_tracks_direct():
    # θ=0.5, physics-quality COMs: BH positions stay close to direct sum
    # over 30 steps (the energy-drift configuration's fidelity proxy).
    want, _ = run_world("direct")
    got, _ = run_world("bh", theta=0.5, unweighted_leaf_com=False,
                       frontier_cap=64, leaf_cap=32, resort_every=1)
    rel = np.linalg.norm(got - want, axis=1) / np.maximum(
        np.linalg.norm(want - want.mean(0), axis=1), 1.0)
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.percentile(rel, 99) < 3e-2, np.percentile(rel, 99)


def test_resort_interval_does_not_change_physics_much():
    a, _ = run_world("bh", theta=0.5, unweighted_leaf_com=False,
                     frontier_cap=64, leaf_cap=32, resort_every=1)
    b, _ = run_world("bh", theta=0.5, unweighted_leaf_com=False,
                     frontier_cap=64, leaf_cap=32, resort_every=8)
    # Same physics: only AABB tightness differs; tiny numerical wiggle
    # from opening slightly different node sets.
    rel = np.linalg.norm(a - b, axis=1) / np.maximum(
        np.linalg.norm(a - a.mean(0), axis=1), 1.0)
    assert np.median(rel) < 1e-3, np.median(rel)


def test_kinetic_energy_bounded():
    # The collapsing cluster shouldn't blow up over a short horizon.
    pos, w = run_world("direct", n_steps=50)
    vel = np.asarray(w.state.vel[:w.state.n_real])
    mass = np.asarray(w.state.mass[:w.state.n_real])
    ke = float((0.5 * mass * (vel ** 2).sum(-1)).sum())
    assert np.isfinite(ke) and ke < 1e12, ke


def test_assert_finite_raises_on_divergence():
    cfg = SimConfig(force_path="direct")
    w = World(plummer(256, seed=1), cfg)
    w.assert_finite()  # healthy
    import jax.numpy as jnp
    w.state = w.state.replace(pos=w.state.pos.at[0, 0].set(jnp.nan))
    with pytest.raises(FloatingPointError, match="diverged"):
        w.assert_finite()


def test_step_timed_bh_phases():
    cfg = SimConfig(force_path="bh")
    w = World(plummer(512, seed=2), cfg)
    c = Counting()
    w.step_timed(c)
    assert c.build_bvh > 0
    assert c.sum_gravity > 0
    assert c.post_calculations > 0

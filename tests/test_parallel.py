"""Sharded ring force path on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.ops.force import direct_accel
from nbody_simulation_tpu.parallel import (
    make_1d_mesh, shard_state, ring_allpairs_accel, make_sharded_step,
    sharded_diagnostics)


def test_ring_matches_direct():
    mesh = make_1d_mesh(8)
    st = uniform_disc(1024, seed=0)
    mass = np.asarray(st.mass).copy()
    mass[0] = 750_000.0
    pos = jnp.asarray(st.pos)
    mass = jnp.asarray(mass)
    want = np.asarray(direct_accel(pos, mass))
    got = np.asarray(ring_allpairs_accel(pos, mass, mesh,
                                         tile_i=64, tile_j=128))
    rel = np.linalg.norm(got - want, axis=1) / np.maximum(
        np.linalg.norm(want, axis=1), 1e-12)
    assert rel.max() < 1e-4, rel.max()


def test_ring_device_count_invariance():
    # Same physics on 2, 4, 8 devices.
    st = uniform_disc(512, seed=1)
    pos, mass = jnp.asarray(st.pos), jnp.asarray(st.mass)
    outs = []
    for nd in (2, 4, 8):
        mesh = make_1d_mesh(nd)
        outs.append(np.asarray(ring_allpairs_accel(pos, mass, mesh,
                                                   tile_i=64, tile_j=64)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5, atol=1e-9)


def test_sharded_step_runs_and_matches_single_device():
    mesh = make_1d_mesh(8)
    cfg = SimConfig(force_path="direct")
    st = uniform_disc(512, seed=2)
    sh = shard_state(st, mesh)
    step = make_sharded_step(mesh, cfg, tile_i=64, tile_j=64)

    # Single-device oracle of the same step.
    pos, vel, mass = (jnp.asarray(st.pos), jnp.asarray(st.vel),
                      jnp.asarray(st.mass))
    for _ in range(3):
        sh = step(sh)
        acc = direct_accel(pos, mass)
        vel = vel + acc * jnp.float32(cfg.dt)
        pos = pos + vel * jnp.float32(cfg.dt)
    got = np.asarray(sh.pos)[:512]
    rel = np.abs(got - np.asarray(pos)) / np.maximum(np.abs(np.asarray(pos)),
                                                     1e-6)
    assert rel.max() < 1e-5, rel.max()


def test_sharded_step_arbitrary_n():
    """shard_state must pad ANY N to a tile-compatible per-device shard
    (default tiles 512/2048) — N=10000 on 8 devices used to raise."""
    mesh = make_1d_mesh(8)
    sh = shard_state(uniform_disc(10_000, seed=0), mesh)
    step = make_sharded_step(mesh, SimConfig())
    sh = step(sh)
    assert np.isfinite(np.asarray(sh.pos)).all()


def test_sharded_diagnostics():
    mesh = make_1d_mesh(4)
    st = uniform_disc(256, seed=3)
    sh = shard_state(st, mesh)
    d = sharded_diagnostics(sh, mesh)
    mass = np.asarray(st.mass)
    vel = np.asarray(st.vel)
    np.testing.assert_allclose(float(d["total_mass"]), mass.sum(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d["momentum"]),
                               (vel * mass[:, None]).sum(0), rtol=1e-4,
                               atol=1e-3)
    assert float(d["kinetic_energy"]) > 0


def test_bh_sharded_matches_single_device():
    from nbody_simulation_tpu.parallel import bh_sharded_accel
    from nbody_simulation_tpu.ops.traversal import bh_accel
    from nbody_simulation_tpu.config import SimConfig

    mesh = make_1d_mesh(8)
    st = uniform_disc(2048, seed=4)
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False,
                    frontier_cap=64, leaf_cap=32)
    want = np.asarray(bh_accel(st.pos, st.mass, theta=0.5,
                               unweighted_leaf_com=False,
                               frontier_cap=64, leaf_cap=32))
    got = np.asarray(bh_sharded_accel(st.pos, st.mass, mesh, config=cfg))
    rel = np.linalg.norm(got - want, axis=1) / np.maximum(
        np.linalg.norm(want, axis=1), 1e-12)
    assert rel.max() < 1e-5, rel.max()


def test_bh_sharded_step_runs():
    from nbody_simulation_tpu.parallel import make_sharded_bh_step
    from nbody_simulation_tpu.config import SimConfig

    mesh = make_1d_mesh(4)
    st = shard_state(uniform_disc(1024, seed=5), mesh)
    step = make_sharded_bh_step(mesh, SimConfig(force_path="bh"))
    for _ in range(3):
        st = step(st)
    assert np.isfinite(np.asarray(st.pos)).all()

"""Fully distributed Barnes-Hut (parallel/bh_distributed.py) on the
virtual 8-device CPU mesh: single-chip equivalence, device-count
invariance, step sanity, and the O(N/P) memory contract (structurally:
nothing in the step materializes an (N, ...) array per device — the only
full-N arrays are the sharded state itself)."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import plummer, uniform_disc
from nbody_simulation_tpu.ops.traversal import bh_accel
from nbody_simulation_tpu.parallel import (
    bh_distributed_accel, distribute_state, make_1d_mesh,
    make_distributed_bh_step, sharded_diagnostics)


def quality_cfg(**kw):
    return SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False,
                     frontier_cap=128, leaf_cap=256, plan_leaves=1, **kw)


def exact_cfg(**kw):
    """Full caps at EVERY ring distance — the single-chip-parity mode."""
    return quality_cfg(far_frontier_cap=128, far_leaf_cap=256, **kw)


def test_distributed_matches_single_chip():
    """With caps ≥ level widths and frontier ≥ n_leaves/2, the ring-subtree
    walk tests exactly the single-chip node set — outputs match to fp32
    summation order."""
    mesh = make_1d_mesh(8)
    st = uniform_disc(8192, seed=4)
    cfg = exact_cfg()
    ds = distribute_state(st, mesh, cfg)
    pos_all, mass_all = np.asarray(ds.pos), np.asarray(ds.mass)
    want = np.asarray(bh_accel(jnp.asarray(pos_all), jnp.asarray(mass_all),
                               theta=0.5, unweighted_leaf_com=False,
                               frontier_cap=128, leaf_cap=256,
                               multipole=2, morton_bits=24))
    got = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh, config=cfg))
    real = mass_all > 0
    rel = (np.linalg.norm(got[real] - want[real], axis=1)
           / np.maximum(np.linalg.norm(want[real], axis=1), 1e-12))
    assert np.median(rel) < 1e-6, np.median(rel)
    assert np.percentile(rel, 99) < 1e-5, np.percentile(rel, 99)


def test_distributed_device_count_invariance():
    st = plummer(2048, seed=1)
    outs = []
    for nd in (2, 4, 8):
        mesh = make_1d_mesh(nd)
        cfg = exact_cfg()
        ds = distribute_state(st, mesh, cfg)
        acc = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh,
                                              config=cfg))
        # Compare in a device-count-independent frame: the global Morton
        # order of real particles (padding layout differs per mesh size).
        mass = np.asarray(ds.mass)
        outs.append(acc[mass > 0])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-4, atol=1e-8)


def test_distributed_step_runs_and_conserves():
    mesh = make_1d_mesh(8)
    cfg = quality_cfg()
    st = uniform_disc(4096, seed=5)
    total_mass = float(np.asarray(st.mass).sum())
    ds = distribute_state(st, mesh, cfg)
    step = make_distributed_bh_step(mesh, cfg)
    for _ in range(3):
        ds = step(ds)
    assert np.isfinite(np.asarray(ds.pos)).all()
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total_mass, rtol=1e-6)


def test_distributed_far_caps_degrade_gracefully():
    """Small far-stage caps must stay finite and BH-quality (overflow →
    COM fallback, never dropped force)."""
    mesh = make_1d_mesh(8)
    cfg = quality_cfg(far_frontier_cap=8, far_leaf_cap=4)
    st = plummer(4096, seed=2)
    ds = distribute_state(st, mesh, cfg)
    got = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh, config=cfg))
    full = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh,
                                           config=exact_cfg()))
    real = np.asarray(ds.mass) > 0
    rel = (np.linalg.norm(got[real] - full[real], axis=1)
           / np.maximum(np.linalg.norm(full[real], axis=1), 1e-12))
    assert np.isfinite(got).all()
    assert np.median(rel) < 0.02, np.median(rel)


def test_distribute_state_layout():
    """Each device's chunk is a contiguous Z-order run, real-first, padded
    to a power-of-two leaf count."""
    mesh = make_1d_mesh(4)
    st = uniform_disc(1000, seed=0)
    cfg = quality_cfg()
    ds = distribute_state(st, mesh, cfg)
    assert ds.n % 4 == 0
    local = ds.n // 4
    assert (local // cfg.leaf_size) & (local // cfg.leaf_size - 1) == 0
    mass = np.asarray(ds.mass)
    assert int((mass > 0).sum()) == 1000
    for d in range(4):
        m = mass[d * local:(d + 1) * local]
        nreal = int((m > 0).sum())
        assert (m[:nreal] > 0).all() and (m[nreal:] == 0).all()

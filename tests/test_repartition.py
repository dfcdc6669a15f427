"""Collective on-device repartition (parallel/repartition.py): bitwise
equality with the host-NumPy rebalance, layout invariants, and use inside
the distributed simulate loop — all on the virtual 8-device CPU mesh."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import plummer, uniform_disc
from nbody_simulation_tpu.parallel import (
    collective_rebalance, distribute_state, make_1d_mesh,
    make_collective_rebalance, make_distributed_bh_step, rebalance_state,
    sharded_diagnostics)


def cfg(**kw):
    return SimConfig(force_path="bh", theta=50.0, **kw)


def _drift(mesh, c, st, steps=3):
    ds = distribute_state(st, mesh, c)
    step = make_distributed_bh_step(mesh, c)
    for _ in range(steps):
        ds = step(ds)
    return ds


def test_collective_matches_host_bitwise():
    """Same mesh + same live count → the host path picks the same local
    size, so the collective result must be BITWISE equal (the repartition
    only moves rows; no arithmetic touches them)."""
    mesh = make_1d_mesh(8)
    c = cfg()
    ds = _drift(mesh, c, uniform_disc(8 * 512, seed=21))
    want = rebalance_state(ds, mesh, c)
    got = collective_rebalance(ds, mesh, c)
    assert got.pos.shape == want.pos.shape
    np.testing.assert_array_equal(np.asarray(got.pos), np.asarray(want.pos))
    np.testing.assert_array_equal(np.asarray(got.vel), np.asarray(want.vel))
    np.testing.assert_array_equal(np.asarray(got.mass), np.asarray(want.mass))
    assert got.distributed


def test_collective_various_device_counts_and_tie_keys():
    """Non-power-of-two device counts and heavy Morton-key collisions (a
    clustered Plummer core at coarse 15-bit keys forces ties, exercising
    the gid tie-break) still match the host path bitwise."""
    for nd, n in ((2, 700), (4, 2048), (6, 1500)):
        mesh = make_1d_mesh(nd)
        c = cfg(morton_bits=15)
        ds = _drift(mesh, c, plummer(n, seed=nd), steps=2)
        want = rebalance_state(ds, mesh, c)
        got = collective_rebalance(ds, mesh, c)
        np.testing.assert_array_equal(np.asarray(got.pos),
                                      np.asarray(want.pos), err_msg=f"nd={nd}")
        np.testing.assert_array_equal(np.asarray(got.mass),
                                      np.asarray(want.mass))


def test_collective_layout_invariants():
    """Output is real-first per device with per = ceil(n/P) live rows on
    every device but the last, globally Morton-nondecreasing on live rows."""
    from nbody_simulation_tpu.ops.morton import morton_keys

    mesh = make_1d_mesh(8)
    c = cfg()
    n = 8 * 300  # not a multiple of the padded local size
    ds = _drift(mesh, c, uniform_disc(n, seed=22))
    out = collective_rebalance(ds, mesh, c)
    mass = np.asarray(out.mass)
    assert int((mass > 0).sum()) == n
    L = out.n // 8
    per = -(-n // 8)
    for d in range(8):
        m = mass[d * L:(d + 1) * L]
        k = int((m > 0).sum())
        assert k == min(per, max(0, n - d * per)), (d, k)
        assert (m[:k] > 0).all() and (m[k:] == 0).all()
    live = mass > 0
    hi, lo = morton_keys(jnp.asarray(np.asarray(out.pos)[live]),
                         jnp.asarray(mass[live]), c.world_size,
                         bits=c.resolved_morton_bits())
    key = np.asarray(hi).astype(np.int64) << 31 | np.asarray(lo)
    assert (np.diff(key) >= 0).all()


def test_collective_reuses_compiled_program():
    """make_collective_rebalance returns a closure whose shapes are stable
    across calls — repeated rebalances hit the jit cache (same output as
    fresh host rebalances each time)."""
    mesh = make_1d_mesh(4)
    c = cfg()
    ds = _drift(mesh, c, uniform_disc(4 * 256, seed=23))
    reb = make_collective_rebalance(mesh, c)
    step = make_distributed_bh_step(mesh, c)
    total = float(np.asarray(ds.mass).sum())
    for _ in range(3):
        ds = reb(ds)
        assert ds.pos.shape[0] == 4 * (ds.n // 4)
        ds = step(ds)
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)
    assert np.isfinite(np.asarray(ds.pos)).all()


def test_simulate_distributed_uses_collective_rebalance():
    """The distributed loop's rebalance cadence runs on-device (no host
    round-trip): same end-to-end sanity as before, and the state keeps its
    padded shapes across the rebalance."""
    from nbody_simulation_tpu.parallel import simulate_distributed

    mesh = make_1d_mesh(4)
    c = cfg(render_size=128)
    st = uniform_disc(4 * 512, seed=24)
    total = float(np.asarray(st.mass).sum())
    ds = distribute_state(st, mesh, c)
    shape0 = ds.pos.shape
    ds = simulate_distributed(ds, mesh, c, steps=6, rebalance_every=2)
    assert ds.pos.shape == shape0
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)
    assert np.isfinite(np.asarray(ds.pos)).all()

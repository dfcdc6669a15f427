"""Total-energy diagnostics (ops/energy.py, parallel.sharded_total_energy):
oracle parity, pair-count correctness, distributed equality, and the
drift-tracking property the suite's config-2 check relies on."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import plummer, uniform_disc
from nbody_simulation_tpu.ops.energy import (allpairs_potential,
                                             potential_energy, total_energy)


def numpy_potential(pos, mass, eps=1e-3):
    """O(N²) oracle: U = Σ_{i<j} −m_i m_j / sqrt(max(r², ε)), pairs with
    zero L1 displacement skipped (the force law's is_normal guard)."""
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    d = pos[:, None, :] - pos[None, :, :]
    l1 = np.abs(d).sum(-1)
    r2 = (d ** 2).sum(-1)
    phi = -mass[None, :] / np.sqrt(np.maximum(r2, eps))
    phi[l1 == 0.0] = 0.0
    return 0.5 * float((mass[:, None] * phi).sum())


def test_potential_matches_oracle():
    st = uniform_disc(512, seed=1)
    got = float(potential_energy(st.pos, st.mass))
    want = numpy_potential(st.pos, st.mass)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_potential_masks_padding_and_self():
    """Zero-mass padding adds nothing; coincident particles are skipped by
    the is_normal guard rather than contributing the clamped floor."""
    st = uniform_disc(100, seed=2).pad_to(128)
    u_pad = float(potential_energy(st.pos, st.mass))
    u_raw = float(potential_energy(st.pos[:100], st.mass[:100]))
    np.testing.assert_allclose(u_pad, u_raw, rtol=1e-6)

    pos = jnp.asarray([[10.0, 10.0], [10.0, 10.0], [13.0, 14.0]], jnp.float32)
    mass = jnp.ones(3, jnp.float32)
    # Only the two distinct pairs (0,2) and (1,2) contribute.
    want = 2 * (-1.0 / 5.0)
    np.testing.assert_allclose(float(potential_energy(pos, mass)), want,
                               rtol=1e-6)


def test_per_target_potential_shape_and_sources():
    st = uniform_disc(256, seed=3)
    other = uniform_disc(512, seed=4)
    phi = allpairs_potential(st.pos, st.mass, src_pos=other.pos,
                             src_mass=other.mass)
    assert phi.shape == (256,)
    assert np.isfinite(np.asarray(phi)).all()
    assert (np.asarray(phi) < 0).all()


def test_sharded_total_energy_matches_single_chip():
    from nbody_simulation_tpu.parallel import (distribute_state, make_1d_mesh,
                                               sharded_total_energy)

    cfg = SimConfig(force_path="bh", theta=50.0)
    mesh = make_1d_mesh(8)
    st = plummer(4096, seed=5)
    ds = distribute_state(st, mesh, cfg)
    d = sharded_total_energy(ds, mesh)
    # Single-chip reference over the same (padded, sorted) arrays.
    want_u = float(potential_energy(jnp.asarray(np.asarray(ds.pos)),
                                    jnp.asarray(np.asarray(ds.mass))))
    np.testing.assert_allclose(float(d["potential_energy"]), want_u,
                               rtol=1e-4)
    want_e = want_u + float(
        jnp.sum(0.5 * jnp.asarray(np.asarray(ds.mass))
                * jnp.sum(jnp.asarray(np.asarray(ds.vel)) ** 2, -1)))
    np.testing.assert_allclose(float(d["total_energy"]), want_e, rtol=1e-4)


def test_bh_energy_drift_tracks_direct():
    """The config-2 fidelity property at test scale: over 20 steps, the BH
    trajectory's total-energy drift stays close to the direct trajectory's
    drift (both drift — Euler + a non-conservative force law — but
    together)."""
    from nbody_simulation_tpu.models import World

    n = 2048
    e = {}
    for path in ("direct", "bh"):
        st = uniform_disc(n, seed=6)  # fresh: World donates its buffers
        cfg = SimConfig(force_path=path, theta=0.5, dt=0.01,
                        unweighted_leaf_com=False)
        w = World(st, cfg)
        e0 = float(total_energy(w.state))
        for _ in range(20):
            w.step()
        e[path] = (float(total_energy(w.state)) - e0) / abs(e0)
    # Drifts must agree to well under their own magnitude scale.
    assert abs(e["bh"] - e["direct"]) < max(1e-3, 0.5 * abs(e["direct"])), e

def test_potential_pads_nondivisible_n():
    """N not divisible by the source tile (engine states are padded to a
    256 multiple only) must work and equal a divisible evaluation — the
    --energy-every crash class (internal zero-mass padding is inert)."""
    st = uniform_disc(600, seed=7).pad_to(256)   # 768: not a 512-multiple
    assert st.n % 512 != 0
    u = float(potential_energy(st.pos, st.mass))
    want = numpy_potential(st.pos, st.mass)
    np.testing.assert_allclose(u, want, rtol=1e-5)
    phi = allpairs_potential(st.pos, st.mass)
    assert phi.shape == (st.n,)


def test_bh_total_energy_exact_and_quality():
    """bh_total_energy: exact-class at θ=0 with caps ≥ level widths (every
    source is a real leaf particle), <1e-3 at physics-quality θ=0.5."""
    from nbody_simulation_tpu.ops.energy import bh_total_energy

    st = uniform_disc(2048, seed=8)
    want = float(total_energy(st))
    exact_cfg = SimConfig(force_path="bh", theta=0.0, frontier_cap=64,
                          leaf_cap=64, plan_leaves=1,
                          unweighted_leaf_com=False)
    got = float(bh_total_energy(st, exact_cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    q_cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False)
    got_q = float(bh_total_energy(st, q_cfg))
    assert abs(got_q - want) / abs(want) < 1e-3, (got_q, want)


def test_bh_distributed_total_energy_exact_and_quality():
    """The distributed staged BH potential (parallel.bh_distributed_total_
    energy): exact-class at θ=0 with caps ≥ level widths (seam stages
    cover every non-neighbor pair, the forest is fully emptied, every
    source is a real leaf particle), θ-consistent class at θ=0.5 with the
    run's own adjacency seam stages — mirrors
    test_bh_total_energy_exact_and_quality on the 8-device mesh."""
    from nbody_simulation_tpu.parallel import (adjacency_stages,
                                               bh_distributed_total_energy,
                                               distribute_state, make_1d_mesh)

    mesh = make_1d_mesh(8)
    st = uniform_disc(4096, seed=9)
    want = float(total_energy(st))

    exact_cfg = SimConfig(force_path="bh", theta=0.0, frontier_cap=64,
                          leaf_cap=64, plan_leaves=1,
                          unweighted_leaf_com=False)
    ds = distribute_state(st, mesh, exact_cfg)
    extra = adjacency_stages(ds, mesh, exact_cfg)
    assert extra, "θ=0 must schedule seam stages for every far pair"
    d = bh_distributed_total_energy(ds, mesh, exact_cfg, extra_pairs=extra)
    np.testing.assert_allclose(float(d["total_energy"]), want, rtol=1e-5)

    q_cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False)
    dq = distribute_state(st, mesh, q_cfg)
    extra_q = adjacency_stages(dq, mesh, q_cfg)
    dqe = bh_distributed_total_energy(dq, mesh, q_cfg, extra_pairs=extra_q)
    got_q = float(dqe["total_energy"])
    assert abs(got_q - want) / abs(want) < 2e-3, (got_q, want)
    # KE is exact regardless of staging.
    ke = float(jnp.sum(0.5 * jnp.asarray(np.asarray(dq.mass))
                       * jnp.sum(jnp.asarray(np.asarray(dq.vel)) ** 2, -1)))
    np.testing.assert_allclose(float(dqe["kinetic_energy"]), ke, rtol=1e-5)


def test_bh_distributed_energy_ring_fallback_theta50():
    """θ=50 with no seam stages: the staged potential uses the forest path;
    its value must land in the same class as the exact sharded sweep (the
    θ=50 acceptance error largely cancels in the double-count sum)."""
    from nbody_simulation_tpu.parallel import (bh_distributed_total_energy,
                                               distribute_state, make_1d_mesh,
                                               sharded_total_energy)

    cfg = SimConfig(force_path="bh", theta=50.0)
    mesh = make_1d_mesh(8)
    st = plummer(4096, seed=5)
    ds = distribute_state(st, mesh, cfg)
    want = float(sharded_total_energy(ds, mesh)["total_energy"])
    got = float(bh_distributed_total_energy(ds, mesh, cfg)["total_energy"])
    # θ=50 COM-approximation class, not exact — the drift METRIC only needs
    # step-to-step consistency, but the level must be right.
    assert abs(got - want) / abs(want) < 0.05, (got, want)


def test_bh_distributed_energy_fn_cached_across_seam_changes():
    """bh_distributed_total_energy memoizes its jitted evaluator on
    (mesh, config, axis, extra_pairs) — the _step_fns pattern — so a
    cadence of EnergyMeter evaluations compiles once per seam set, and a
    rebalance flipping between already-seen matchings swaps back with no
    retrace (a fresh shard_map closure would recompile for minutes over the
    serial TPU tunnel at flagship scale)."""
    from nbody_simulation_tpu.parallel import (bh_distributed_total_energy,
                                               distribute_state, make_1d_mesh)
    from nbody_simulation_tpu.parallel.bh_distributed import _energy_fn
    from nbody_simulation_tpu.parallel.mesh import AXIS

    mesh = make_1d_mesh(8)
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False)
    ds = distribute_state(uniform_disc(8 * 256, seed=11), mesh, cfg)
    e1 = ()
    e2 = (((0, 2), (2, 0), (5, 7), (7, 5)),)

    _energy_fn.cache_clear()
    a = bh_distributed_total_energy(ds, mesh, cfg, extra_pairs=e1)
    b = bh_distributed_total_energy(ds, mesh, cfg, extra_pairs=e2)
    # Flip back to e1: must be an lru hit AND a jit-cache hit.
    f1 = _energy_fn(mesh, cfg, AXIS, e1)
    # _cache_size is a JAX-private jit attribute (no stability guarantee);
    # the lru hit-count below is the load-bearing retrace-freedom check, the
    # jit-cache size is a bonus assertion when the API exists.
    size_before = f1._cache_size() if hasattr(f1, "_cache_size") else None
    c = bh_distributed_total_energy(ds, mesh, cfg, extra_pairs=e1)
    info = _energy_fn.cache_info()
    assert info.misses == 2 and info.hits >= 2, info
    if size_before is not None:
        assert f1._cache_size() == size_before
    # Same state + same seam set → identical value; the extra seam stage
    # moves pairs between stages, not physics class.
    np.testing.assert_allclose(float(c["total_energy"]),
                               float(a["total_energy"]), rtol=0)
    # The extra seam stage moves pairs between the forest and a per-pair
    # near stage — same θ class, so the value must agree loosely, not just
    # be finite (a grossly wrong seam-stage potential must not pass).
    assert np.isfinite(float(b["total_energy"]))
    np.testing.assert_allclose(float(b["total_energy"]),
                               float(a["total_energy"]), rtol=1e-2)

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
    kw.setdefault("far_mode", "ring")  # these tests probe the ring path
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


def flagship_cfg(**kw):
    """The θ=50 flagship regime: forest far-mode resolves on by default."""
    return SimConfig(force_path="bh", theta=50.0, **kw)


def test_forest_mode_quality_and_conservation():
    """far_mode='forest' (θ≥2 default): all ring-far subtrees covered by one
    bounded walk over the gathered coarse forest. Per-particle force error
    vs the exact ring sweep must stay well inside the θ=50 walk's own
    approximation error (~5e-2 median vs direct at this 16k scale; the
    θ=50 walk's error GROWS with N — 0.30 median at 524k, see
    tests/test_scale_distributed.py)."""
    mesh = make_1d_mesh(8)
    cfg = flagship_cfg()
    assert cfg.resolved_far_mode() == "forest"
    st = uniform_disc(16_384, seed=7)
    ds = distribute_state(st, mesh, cfg)
    got = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh, config=cfg))
    ring = np.asarray(bh_distributed_accel(
        ds.pos, ds.mass, mesh, config=flagship_cfg(far_mode="ring")))
    real = np.asarray(ds.mass) > 0
    assert np.isfinite(got).all()
    rel = (np.linalg.norm(got[real] - ring[real], axis=1)
           / np.maximum(np.linalg.norm(ring[real], axis=1), 1e-12))
    assert np.median(rel) < 0.02, np.median(rel)
    # Mass flows through the forest exactly once: a full step conserves mass
    # and stays finite.
    step = make_distributed_bh_step(mesh, cfg)
    total = float(np.asarray(st.mass).sum())
    for _ in range(2):
        ds = step(ds)
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)
    assert np.isfinite(np.asarray(ds.pos)).all()


def test_forest_matches_ring_source_mass():
    """Every row's emitted source mass (local + 2 neighbors + forest) equals
    total mass exactly — nothing dropped, nothing double-counted."""
    import jax
    from jax.sharding import PartitionSpec
    from nbody_simulation_tpu.ops.tree import summarize_sorted
    from nbody_simulation_tpu.ops.traversal import plan_rows
    from nbody_simulation_tpu.parallel.bh_distributed import _gather_forest

    mesh = make_1d_mesh(8)
    cfg = flagship_cfg()
    st = uniform_disc(8192, seed=3)
    ds = distribute_state(st, mesh, cfg)
    total = float(np.asarray(st.mass).astype(np.int64).sum())

    def local(pos_l, mass_l):
        tree = summarize_sorted(pos_l, mass_l, leaf_size=cfg.leaf_size,
                                unweighted_leaf_com=cfg.unweighted_leaf_com)
        own = tree.levels[tree.depth]
        fcap, lcap = cfg.resolved_caps()
        perm = [(i, (i + 1) % 8) for i in range(8)]
        back = [(i, (i - 1) % 8) for i in range(8)]
        msum = 0.0
        for visiting in (tree,
                         jax.tree.map(lambda x: jax.lax.ppermute(
                             x, "shard", perm), tree),
                         jax.tree.map(lambda x: jax.lax.ppermute(
                             x, "shard", back), tree)):
            sm = plan_rows(visiting, own, cfg.theta, fcap, lcap, 2)[2]
            msum = msum + jnp.sum(sm, axis=1)
        ftree = _gather_forest(tree, "shard", 8, cfg.forest_levels)
        ff = 16
        k0 = min(ff.bit_length() - 1, ftree.depth - 1)
        sm = plan_rows(ftree, own, cfg.theta, ff, 0, 2,
                       max_levels=ftree.depth - k0)[2]
        return (msum + jnp.sum(sm, axis=1))[:, None]

    import jax.numpy as jnp
    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(PartitionSpec("shard", None),
                                PartitionSpec("shard")),
                      out_specs=PartitionSpec("shard", None), check_vma=False)
    msums = np.asarray(f(ds.pos, ds.mass)).ravel()
    np.testing.assert_allclose(msums, total, rtol=1e-6)


def test_forest_mode_non_pow2_devices():
    """Forest gathering pads the subtree roots to a power of two — a
    6-device ring must still run, conserve mass, and stay finite."""
    mesh = make_1d_mesh(6)
    cfg = flagship_cfg()
    st = uniform_disc(6 * 1024, seed=9)
    total = float(np.asarray(st.mass).sum())
    ds = distribute_state(st, mesh, cfg)
    step = make_distributed_bh_step(mesh, cfg)
    for _ in range(2):
        ds = step(ds)
    assert np.isfinite(np.asarray(ds.pos)).all()
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)


def test_distributed_leapfrog_integrator():
    """config.integrator='leapfrog' is honored (two distributed force
    evaluations per step), runs, conserves mass, stays finite."""
    mesh = make_1d_mesh(4)
    cfg = SimConfig(force_path="bh", theta=50.0, integrator="leapfrog")
    st = uniform_disc(4 * 512, seed=11)
    total = float(np.asarray(st.mass).sum())
    ds = distribute_state(st, mesh, cfg)
    step = make_distributed_bh_step(mesh, cfg)
    for _ in range(2):
        ds = step(ds)
    assert np.isfinite(np.asarray(ds.pos)).all()
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)


def test_rebalance_state_after_drift():
    """Host-side rebalance: re-partitions a drifted distributed state,
    preserves the real-particle count exactly, and the step keeps running
    on the fresh ownership."""
    mesh = make_1d_mesh(4)
    cfg = flagship_cfg()
    st = uniform_disc(4 * 512, seed=12)
    total = float(np.asarray(st.mass).sum())
    ds = distribute_state(st, mesh, cfg)
    step = make_distributed_bh_step(mesh, cfg)
    for _ in range(3):
        ds = step(ds)
    from nbody_simulation_tpu.parallel import rebalance_state
    ds2 = rebalance_state(ds, mesh, cfg)
    assert int((np.asarray(ds2.mass) > 0).sum()) == 4 * 512
    # repeated rebalance does not accumulate padding
    ds3 = rebalance_state(ds2, mesh, cfg)
    assert ds3.n == ds2.n
    step2 = make_distributed_bh_step(mesh, cfg)
    ds3 = step2(ds3)
    assert np.isfinite(np.asarray(ds3.pos)).all()
    d = sharded_diagnostics(ds3, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)


def test_sharded_render_pixel_exact():
    """Distributed render (per-shard partial rasters + pmax/psum merge)
    matches the single-chip render of the concatenated arrays PIXEL-EXACT,
    including the last-light-wins color rule across shard boundaries."""
    from nbody_simulation_tpu.ops.raster import render_frame
    from nbody_simulation_tpu.parallel import sharded_render_frame

    mesh = make_1d_mesh(8)
    cfg = flagship_cfg(render_size=128)
    rng = np.random.default_rng(3)
    n = 8 * 512
    st = uniform_disc(n, seed=3)
    # Heavy particles + many pixel collisions to exercise every merge rule.
    mass = np.asarray(st.mass).copy()
    mass[rng.choice(n, 5, replace=False)] = 1e6
    st = st.replace(mass=jnp.asarray(mass))
    ds = distribute_state(st, mesh, cfg)

    got = np.asarray(sharded_render_frame(
        ds.pos, ds.vel, ds.mass, mesh, render_size=cfg.render_size))
    want = np.asarray(render_frame(
        ds.pos, ds.vel, ds.mass, render_size=cfg.render_size))
    np.testing.assert_array_equal(got, want)
    assert int((got[..., 3] > 0).sum()) > 100  # the frame is actually lit


def test_simulate_distributed_loop():
    """The distributed engine-style loop: steps, periodic sharded renders
    via callback, periodic rebalance — finite, frames lit, mass conserved."""
    from nbody_simulation_tpu.parallel import simulate_distributed

    mesh = make_1d_mesh(4)
    cfg = flagship_cfg(render_size=128)
    st = uniform_disc(4 * 512, seed=13)
    total = float(np.asarray(st.mass).sum())
    ds = distribute_state(st, mesh, cfg)
    frames = []
    ds = simulate_distributed(ds, mesh, cfg, steps=6, snapshot_every=3,
                              on_frame=lambda i, f: frames.append((i, f)),
                              rebalance_every=4)
    assert [i for i, _ in frames] == [3, 6]
    assert all(int((f[..., 3] > 0).sum()) > 50 for _, f in frames)
    assert np.isfinite(np.asarray(ds.pos)).all()
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)


def test_forest_physics_quality_with_seam_stages():
    """θ=0.5 forest mode (the new default everywhere): adjacency-scheduled
    seam near stages + quadrupole coarse forest must match the EXACT ring
    sweep to the single-chip walk's own quality class — median AND p99
    under 1e-3 (VERDICT r2 item 5). Also: stage accounting covers every
    (target, source-shard) pair exactly once — total mass conserved."""
    from nbody_simulation_tpu.parallel import (adjacency_stages,
                                               resolved_seam_stages)

    mesh = make_1d_mesh(8)
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False,
                    frontier_cap=128, leaf_cap=256, plan_leaves=1)
    assert cfg.resolved_far_mode() == "forest"
    assert resolved_seam_stages(cfg)
    st = uniform_disc(16_384, seed=8)
    ds = distribute_state(st, mesh, cfg)
    extra = adjacency_stages(ds, mesh, cfg)
    got = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh, config=cfg,
                                          extra_pairs=extra))
    ring = np.asarray(bh_distributed_accel(
        ds.pos, ds.mass, mesh,
        config=cfg.replace(far_mode="ring", far_frontier_cap=128,
                           far_leaf_cap=256)))
    real = np.asarray(ds.mass) > 0
    assert np.isfinite(got).all()
    rel = (np.linalg.norm(got[real] - ring[real], axis=1)
           / np.maximum(np.linalg.norm(ring[real], axis=1), 1e-12))
    assert np.median(rel) < 1e-3, np.median(rel)
    assert np.percentile(rel, 99) < 1e-3, np.percentile(rel, 99)

    # A full quality step over the seam-staged path conserves mass.
    step = make_distributed_bh_step(mesh, cfg, extra_pairs=extra)
    total = float(np.asarray(st.mass).sum())
    for _ in range(2):
        ds = step(ds)
    d = sharded_diagnostics(ds, mesh)
    np.testing.assert_allclose(float(d["total_mass"]), total, rtol=1e-6)
    assert np.isfinite(np.asarray(ds.pos)).all()


def test_adjacency_stages_structure():
    """Matchings are disjoint per round, exclude ring±1/self, and include
    both directions of every edge; θ≥2 resolves seam stages off."""
    from nbody_simulation_tpu.parallel import (adjacency_stages,
                                               resolved_seam_stages)

    mesh = make_1d_mesh(8)
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False)
    ds = distribute_state(uniform_disc(8192, seed=10), mesh, cfg)
    stages = adjacency_stages(ds, mesh, cfg)
    for matching in stages:
        seen = set()
        pairs = set(matching)
        for s, d in matching:
            assert s != d and d not in ((s + 1) % 8, (s - 1) % 8)
            assert s not in seen and d not in seen or (d, s) in pairs
            assert (d, s) in pairs  # both directions present
        devs = [x for p in matching for x in p]
        # each device appears at most twice (once as src, once as dst)
        for dev in set(devs):
            assert devs.count(dev) == 2
    assert not resolved_seam_stages(SimConfig(force_path="bh", theta=50.0))

def test_quality_forest_without_seam_stages_falls_back_to_ring():
    """A direct θ<2 call that did NOT thread adjacency seam stages through
    ``extra_pairs`` must NOT get the coarse forest (flush error at the cut
    breaks the <1e-3 budget) — it falls back to the exact ring sweep."""
    mesh = make_1d_mesh(8)
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False,
                    frontier_cap=128, leaf_cap=256, plan_leaves=1)
    assert cfg.resolved_far_mode() == "forest"
    st = uniform_disc(8192, seed=9)
    ds = distribute_state(st, mesh, cfg)
    got = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh, config=cfg))
    ring = np.asarray(bh_distributed_accel(
        ds.pos, ds.mass, mesh, config=cfg.replace(far_mode="ring")))
    np.testing.assert_array_equal(got, ring)


def test_remote_near_stage_bitwise_vs_same_device():
    """The compute-to-data near protocol (near_remote=True, default): ship
    only the visiting subtree's levels 0..cut, run the seam rows'
    full-depth continuation on the subtree's OWNER, ship the row
    accelerations back. Identical arrays feed an identical seeded walk, so
    the result must be BITWISE equal to the same-device protocol
    (near_remote=False: whole subtree blocks ship, _near_stage runs both
    pieces locally) — in the θ=50 flagship regime over ring neighbors, and
    at physics-quality θ with adjacency seam stages."""
    from nbody_simulation_tpu.parallel import adjacency_stages
    from nbody_simulation_tpu.parallel.bh_distributed import (
        NEAR_ROW_LEAVES, _near_geometry)

    mesh = make_1d_mesh(8)

    # θ=50: 4096 particles/device = 64 leaves -> subtree depth 6; with the
    # resolved (16, 32) near caps that is cut=5 > k0=4, so the remote
    # protocol is ACTIVE (guard the test against retunes re-shadowing it).
    cfg = flagship_cfg()
    fcap, lcap = cfg.resolved_caps()
    ncaps = (fcap, max(lcap, 4 * NEAR_ROW_LEAVES))
    k0, cut, refine = _near_geometry(cfg, ncaps, 6)
    assert refine, (k0, cut)
    ds = distribute_state(uniform_disc(8 * 4096, seed=20), mesh, cfg)
    got = np.asarray(bh_distributed_accel(ds.pos, ds.mass, mesh, config=cfg))
    want = np.asarray(bh_distributed_accel(
        ds.pos, ds.mass, mesh, config=cfg.replace(near_remote=False)))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, want)

    # θ=0.5 + seam stages (non-ring ppermute matchings) with an explicit
    # refine depth and a small frontier so the remote path activates at
    # this scale; the matchings' no-op devices (zero-level receives) must
    # also round-trip to bitwise equality.
    qcfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False,
                     frontier_cap=16, leaf_cap=64, near_refine_levels=1)
    k0q, cutq, refineq = _near_geometry(
        qcfg, (16, max(64, 4 * qcfg.plan_leaves)), 6)
    assert refineq, (k0q, cutq)
    dq = distribute_state(uniform_disc(8 * 4096, seed=21), mesh, qcfg)
    extra = adjacency_stages(dq, mesh, qcfg)
    gq = np.asarray(bh_distributed_accel(dq.pos, dq.mass, mesh, config=qcfg,
                                         extra_pairs=extra))
    wq = np.asarray(bh_distributed_accel(
        dq.pos, dq.mass, mesh, config=qcfg.replace(near_remote=False),
        extra_pairs=extra))
    assert np.isfinite(gq).all()
    np.testing.assert_array_equal(gq, wq)

"""TPU-hardware regression tier for the Barnes-Hut path (round-4 verdict
item 3): the planner + grouped Pallas sweep (ops/traversal.py, 742 lines of
Mosaic-sensitive constructs) previously ran on hardware only via manual
suite/probe invocations — a Mosaic or XLA regression would pass CPU CI and
surface as a wrong BENCH number. These tests pin it on the chip:

- θ=0 ≡ direct summation, end-to-end (planner decisions + sweep);
- the Mosaic sweep kernel vs the SAME math compiled by plain XLA
  (mono_tile/_quad_tile at rcp="exact" are ordinary jnp functions outside
  a pallas_call) on identical planned columns — an independent compilation
  path over identical arithmetic, θ=50 mono and θ=0.5 quadrupole;
- bh_sharded_accel at the 524k θ=0.5 tier vs sampled direct truth (the
  single-chip-class quality gate of tests/test_scale_distributed.py, on
  hardware where a step costs milliseconds);
- a 25-step θ=0.5 energy-drift soak at 524k — the TPU-tier replacement for
  the 6-step interpret soak (a 25-step interpret variant measured >3 h on
  the 1-core host; here the whole soak is seconds).

θ-walk semantics anchor: /root/reference/src/main.rs:348-386.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import requires_tpu

pytestmark = requires_tpu


def cloud(rng, n):
    pos = rng.uniform(0, 100_000, size=(n, 2)).astype(np.float32)
    mass = rng.integers(1, 100, size=n).astype(np.float32)
    mass[0] = 75_000_000.0
    return jnp.asarray(pos), jnp.asarray(mass)


def test_bh_theta0_equals_direct_on_tpu(rng):
    """θ=0 opens every node: the full plan+sweep pipeline must reproduce
    direct summation on hardware (fp32 summation order only)."""
    from nbody_simulation_tpu.ops.force import direct_accel
    from nbody_simulation_tpu.ops.traversal import bh_accel

    n = 16_384
    pos, mass = cloud(rng, n)
    got = np.asarray(bh_accel(pos, mass, theta=0.0, frontier_cap=256,
                              leaf_cap=512, unweighted_leaf_com=False,
                              rcp="exact"))
    want = np.asarray(direct_accel(pos, mass, row_chunk=4096))
    rel = (np.linalg.norm(got - want, axis=1)
           / np.maximum(np.linalg.norm(want, axis=1), 1e-12))
    assert np.median(rel) < 1e-6, np.median(rel)
    assert np.percentile(rel, 99) < 1e-4, np.percentile(rel, 99)


@pytest.mark.parametrize("theta,mp", [(50.0, 1), (0.5, 2)])
def test_mosaic_sweep_vs_xla_oracle_on_tpu(rng, theta, mp):
    """The grouped Mosaic sweep vs plain-XLA evaluation of the SAME planned
    source columns with the SAME tile math (rcp='exact' mono_tile/_quad_tile
    are jnp functions) — catches silent Mosaic miscompiles of the sweep
    kernel at both walk regimes (monopole θ=50, quadrupole θ=0.5)."""
    from nbody_simulation_tpu.ops.allpairs import mono_tile
    from nbody_simulation_tpu.ops.traversal import (_grouped_force,
                                                    _quad_tile,
                                                    bh_plan_sources)
    from nbody_simulation_tpu.ops.tree import build_tree

    n = 65_536
    pos, mass = cloud(rng, n)
    kw = dict(theta=theta, fc=16, lc=8) if theta >= 2 else \
        dict(theta=theta, fc=256, lc=256)
    tree, _ = build_tree(pos, mass, unweighted_leaf_com=False,
                         morton_bits=15 if theta >= 2 else 24)
    n_leaves, S, _ = tree.leaf_pos.shape
    planned = bh_plan_sources(tree, kw["theta"], kw["fc"], kw["lc"],
                              plan_leaves=4, multipole=mp)
    tgt = tree.leaf_pos.reshape(n_leaves // 4, 4 * S, 2)
    got = np.asarray(_grouped_force(
        tgt, *planned[:3], softening2=1e-3, rcp="exact", interpret=False,
        src_q=planned[3:] if mp == 2 else None))

    # XLA oracle over a row subset (full broadcast would be GBs).
    rows = np.asarray(rng.choice(tgt.shape[0], size=8, replace=False))

    @jax.jit
    def oracle(tgt_r, cols):
        dx = cols[0][:, None, :] - tgt_r[..., 0][..., None]   # (r,S,C)
        dy = cols[1][:, None, :] - tgt_r[..., 1][..., None]
        mj = jnp.broadcast_to(cols[2][:, None, :], dx.shape)
        if mp == 2:
            cx, cy = _quad_tile(dx, dy, mj,
                                jnp.broadcast_to(cols[3][:, None, :], dx.shape),
                                jnp.broadcast_to(cols[4][:, None, :], dx.shape),
                                jnp.broadcast_to(cols[5][:, None, :], dx.shape),
                                1e-3, "exact")
        else:
            cx, cy = mono_tile(dx, dy, mj, 1e-3, "exact")
        return jnp.stack([cx.sum(-1), cy.sum(-1)], axis=-1)

    want = np.asarray(oracle(tgt[rows], tuple(c[rows] for c in planned)))
    scale = np.maximum(np.linalg.norm(want, axis=-1), 1e-12)
    rel = np.linalg.norm(got[rows] - want, axis=-1) / scale
    # Same arithmetic, two compilers: fp32 fusion/reassociation only.
    assert np.median(rel) < 1e-6, (theta, np.median(rel))
    assert rel.max() < 1e-3, (theta, rel.max())


def test_bh_sharded_524k_quality_on_tpu(rng):
    """bh_sharded_accel at the 524k θ=0.5 tier (the single-chip-class
    reference at this scale — CLAUDE.md: the interpret path host-OOMs
    here) vs SAMPLED direct truth: the physics-quality error class."""
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import uniform_disc
    from nbody_simulation_tpu.ops.force import direct_accel_at
    from nbody_simulation_tpu.parallel import bh_sharded_accel, make_1d_mesh

    n = 524_288
    st = uniform_disc(n, seed=4)
    mesh = make_1d_mesh(1)
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False)
    acc = np.asarray(bh_sharded_accel(jnp.asarray(st.pos),
                                      jnp.asarray(st.mass), mesh,
                                      config=cfg))
    assert np.isfinite(acc).all()
    m = 1024
    tidx = np.sort(np.asarray(rng.choice(n, size=m, replace=False)))
    want = np.asarray(direct_accel_at(jnp.asarray(st.pos[tidx]),
                                      jnp.asarray(st.pos),
                                      jnp.asarray(st.mass)))
    rel = (np.linalg.norm(acc[tidx] - want, axis=1)
           / np.maximum(np.linalg.norm(want, axis=1), 1e-12))
    assert np.median(rel) < 1e-3, np.median(rel)


def test_bh_energy_soak_25_steps_524k_on_tpu():
    """25-step θ=0.5 soak at N=524k on the chip: finite state, bit-exact
    mass, and distributed-BH-energy drift in the integrator's class (the
    interpret-mode 6-step soak could never grow this far on the host)."""
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import World, uniform_disc
    from nbody_simulation_tpu.ops.energy import total_energy

    n = 524_288
    cfg = SimConfig(force_path="bh", theta=0.5, unweighted_leaf_com=False)
    w = World(uniform_disc(n, seed=4), cfg)
    mass0 = float(jnp.sum(w.state.mass))
    e0 = float(total_energy(w.state))
    w.run(25)
    pos = np.asarray(w.state.pos[: w.state.n_real])
    assert np.isfinite(pos).all()
    assert float(jnp.sum(w.state.mass)) == mass0
    e1 = float(total_energy(w.state))
    drift = abs(e1 - e0) / abs(e0)
    # Semi-implicit Euler at dt=0.1 drifts; the BH approximation must not
    # add to the integrator's own class (config-2 measures ~1e-4..1e-3
    # per 50 steps at 65k; an order of magnitude of headroom on top).
    assert drift < 0.05, drift

"""Seeded property fuzz: invariants that must hold for ANY config.

Each draw samples a config corner (θ, caps, plan granularity, multipole,
leaf size, padding fraction, heavy/coincident/world-edge particles) and
asserts the properties the rest of the suite proves only at fixed
configs:

1. finiteness — no config may emit NaN/inf accelerations for finite
   world-scale states (the reference's per-pair guard, src/main.rs:240-243);
2. θ=0 ≡ direct — with acceptance disabled every walk ends in exact leaf
   interactions, so BH must equal the direct sum up to fp32 order;
3. padding invariance — zero-mass rows are padding by convention
   (CLAUDE.md): they exert no force, and the real rows' accelerations
   must not depend on HOW MUCH padding follows them;
4. step consistency — one World step equals force-then-integrate done by
   hand (euler semantics, src/main.rs:419-423).

Draws are seeded (not time-varying) so failures reproduce; N stays small
to keep the CPU-interpret Pallas sweep affordable.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.world import World, make_accel_fn
from nbody_simulation_tpu.ops.force import direct_accel
from nbody_simulation_tpu.state import ParticleState

WORLD = 100_000.0


def draw_state(rng, n, pad_to=None):
    """A hostile little state: heavy bodies, a coincident pair, rows on
    the world edge, integer masses like the reference's u32 weights."""
    pos = rng.uniform(0, WORLD, (n, 2)).astype(np.float32)
    pos[0] = [0.0, 0.0]
    pos[1] = [WORLD - 1e-2, WORLD - 1e-2]
    if n >= 4:
        pos[3] = pos[2]                      # exact coincident pair
    mass = rng.integers(1, 100, n).astype(np.float32)
    mass[0] = 75_000_000.0                   # the galaxy's heavy body
    vel = rng.normal(0, 1, (n, 2)).astype(np.float32)
    st = ParticleState.create(pos, vel, mass)
    if pad_to:
        st = st.pad_to(pad_to)
    return st


CONFIGS = [
    # (theta, leaf_size, plan_leaves, multipole, rcp)
    (50.0, 64, 4, None, None),
    (50.0, 16, 1, None, "approx"),
    (2.0, 64, 8, None, None),
    (0.7, 64, 4, None, None),
    (0.5, 32, 2, 2, "newton"),
    (0.3, 64, 1, 1, None),
]


@pytest.mark.parametrize("theta,leaf,pl,mp,rcp", CONFIGS)
def test_fuzz_finite_all_configs(theta, leaf, pl, mp, rcp):
    rng = np.random.default_rng(int(theta * 10) + leaf)
    n = int(rng.integers(65, 1500))
    st = draw_state(rng, n, pad_to=1 << int(np.ceil(np.log2(n))))
    cfg = SimConfig(force_path="bh", theta=theta, leaf_size=leaf,
                    plan_leaves=pl, multipole=mp,
                    **({"rcp": rcp} if rcp else {}))
    acc = np.asarray(make_accel_fn(cfg)(st.pos, st.mass))
    assert np.isfinite(acc).all(), (theta, leaf, pl, mp, rcp, n)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_theta0_equals_direct(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(80, 700))
    st = draw_state(rng, n)
    cfg = SimConfig(force_path="bh", theta=0.0,
                    leaf_size=int(rng.choice([16, 64])),
                    plan_leaves=int(rng.choice([1, 4])))
    got = np.asarray(make_accel_fn(cfg)(st.pos, st.mass))[: st.n_real]
    want = np.asarray(direct_accel(st.pos, st.mass))[: st.n_real]
    num = np.linalg.norm(got - want, axis=1)
    den = np.maximum(np.linalg.norm(want, axis=1), 1e-12)
    # fp32 summation-order difference only. The ratio is ill-conditioned
    # where net forces nearly cancel (CLAUDE.md), so gate the bulk on the
    # relative error and the tail on an absolute bound scaled to the
    # row's largest single contribution.
    assert np.median(num / den) < 1e-5, np.median(num / den)
    assert (num <= 1e-3 * np.abs(want).max(axis=1) + 1e-6).all()


@pytest.mark.parametrize("seed", [4, 5])
def test_fuzz_padding_invariance(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(65, 900))
    st = draw_state(rng, n)
    theta = float(rng.choice([0.5, 50.0]))
    cfg = SimConfig(force_path="bh", theta=theta)
    fn = make_accel_fn(cfg)
    outs = []
    for pad in (0, 37, 1000):
        stp = st.pad_to(n + pad) if pad else st
        outs.append(np.asarray(fn(stp.pos, stp.mass))[:n])
    # Padding rows are massless: they contribute 0 to every sum, but they
    # DO change leaf boundaries/summation order → fp32-tolerance equality.
    for other in outs[1:]:
        np.testing.assert_allclose(other, outs[0], rtol=5e-4, atol=1e-7)


def test_fuzz_step_is_force_then_integrate():
    rng = np.random.default_rng(9)
    n = 257
    st = draw_state(rng, n, pad_to=512)
    cfg = SimConfig(force_path="direct", dt=0.1)
    w = World(st, cfg)
    acc = np.asarray(direct_accel(w.state.pos, w.state.mass))
    vel = np.asarray(w.state.vel) + acc * np.float32(0.1)
    pos = np.asarray(w.state.pos) + vel * np.float32(0.1)
    w.step()
    np.testing.assert_allclose(np.asarray(w.state.vel), vel, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w.state.pos), pos, rtol=1e-6)

"""World step loop: fused vs per-phase vs oracle (reference src/main.rs:388-425)."""

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.world import World
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.oracle import direct_accel_oracle, euler_oracle
from nbody_simulation_tpu.state import ParticleState
from nbody_simulation_tpu.utils.telemetry import Counting


def small_world(force_path, n=192):
    cfg = SimConfig(force_path=force_path, tile_i=64, tile_j=64)
    st = uniform_disc(n, seed=2)
    return World(st, cfg)


def test_direct_step_matches_oracle():
    w = small_world("direct")
    n = w.state.n_real
    pos = np.asarray(w.state.pos)
    vel = np.asarray(w.state.vel)
    mass = np.asarray(w.state.mass)
    for _ in range(5):
        acc = direct_accel_oracle(pos, mass).astype(np.float32)
        pos, vel = euler_oracle(pos, vel, acc, 0.1)
        w.step()
    got_pos = np.asarray(w.state.pos)
    rel = np.abs(got_pos[:n] - pos[:n]) / np.maximum(np.abs(pos[:n]), 1e-6)
    assert rel.max() < 1e-5, rel.max()
    assert w.updates == 5


def test_run_equals_repeated_step():
    w1 = small_world("direct")
    w2 = small_world("direct")
    for _ in range(4):
        w1.step()
    w2.run(4)
    np.testing.assert_allclose(np.asarray(w1.state.pos),
                               np.asarray(w2.state.pos), rtol=1e-6)


def test_pallas_world_runs():
    w = small_world("pallas", n=128)
    w.run(3)
    assert np.isfinite(np.asarray(w.state.pos)).all()


def test_bh_world_runs():
    w = small_world("bh", n=256)
    w.run(3)
    assert np.isfinite(np.asarray(w.state.pos)).all()
    assert w.updates == 3


def test_step_timed_populates_counting():
    w = small_world("direct")
    c = Counting()
    w.step_timed(c)
    assert c.sum_gravity > 0.0
    assert c.post_calculations > 0.0
    assert w.updates == 1


def test_padding_preserved():
    cfg = SimConfig(force_path="direct")
    st = uniform_disc(200, seed=0)
    w = World(st, cfg)
    assert w.state.n % 256 == 0
    assert w.state.n_real == 200
    w.step()
    # Padding stays inert: zero mass, out-of-world position.
    mass = np.asarray(w.state.mass)
    assert (mass[200:] == 0.0).all()


def test_leapfrog_integrator():
    cfg = SimConfig(force_path="direct", integrator="leapfrog")
    w = World(uniform_disc(192, seed=2), cfg)
    w.run(5)
    assert np.isfinite(np.asarray(w.state.pos)).all()
    # Different scheme → different velocities than Euler (positions move
    # too little in 5 steps for a position-level allclose to separate).
    we = small_world("direct")
    we.run(5)
    assert not np.array_equal(np.asarray(w.state.vel), np.asarray(we.state.vel))


def test_leapfrog_bh_runs():
    cfg = SimConfig(force_path="bh", integrator="leapfrog")
    w = World(uniform_disc(256, seed=2), cfg)
    w.run(3)
    assert np.isfinite(np.asarray(w.state.pos)).all()


def test_step_timed_matches_fused_bh():
    """Profile-mode steps must run the SAME walk configuration (arity,
    plan_leaves, integrator) as the fused step: interleaving step_timed
    into a fused run must not change the trajectory beyond fp noise."""
    for integrator in ("euler", "leapfrog"):
        cfg = SimConfig(force_path="bh", integrator=integrator,
                        tree_arity=4, plan_leaves=2, resort_every=1)
        w1 = World(uniform_disc(512, seed=3), cfg)
        w2 = World(uniform_disc(512, seed=3), cfg)
        c = Counting()
        for i in range(4):
            w1.step()
            if i == 2:
                w2.step_timed(c)
            else:
                w2.step()
        assert c.sum_gravity > 0.0 and c.build_bvh > 0.0
        np.testing.assert_allclose(np.asarray(w1.state.pos),
                                   np.asarray(w2.state.pos),
                                   rtol=2e-5, atol=1e-3,
                                   err_msg=integrator)


def test_direct_arbitrary_n():
    """direct_accel pads internally: any N (incl. padded sizes not divisible
    by row_chunk) must work end to end."""
    w = World(uniform_disc(1100, seed=0), SimConfig(force_path="direct"))
    w.run(2)
    assert np.isfinite(np.asarray(w.state.pos)).all()

def test_world_diagnostics_parity_keys_and_conservation():
    """World.diagnostics() mirrors parallel.sharded_diagnostics' keys;
    mass is exactly conserved across steps and padding is inert."""
    import numpy as np

    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models.scenarios import uniform_disc
    from nbody_simulation_tpu.models.world import World

    w = World(uniform_disc(300, seed=2).pad_to(256),
              SimConfig(force_path="direct", dt=0.01))
    d0 = w.diagnostics()
    assert set(d0) == {"momentum", "kinetic_energy", "total_mass",
                       "center_of_mass", "n_live"}
    assert int(np.asarray(d0["n_live"])) == 300
    w.run(5)
    d1 = w.diagnostics()
    np.testing.assert_allclose(float(d1["total_mass"]),
                               float(d0["total_mass"]), rtol=0)
    assert np.isfinite(np.asarray(d1["momentum"])).all()

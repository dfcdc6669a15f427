"""Full multi-chip simulation step: ring force exchange + integration.

One jitted, donated computation over the mesh: particle-sharded force
summation (ring ppermute of source tiles), semi-implicit Euler, and
collective diagnostics via psum. This is the 'training step' of the engine
in ML terms — the thing the driver's dryrun compiles over an N-device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.parallel.ring import ring_allpairs_accel
from nbody_simulation_tpu.state import ParticleState


def make_sharded_step(mesh: Mesh, config: SimConfig, axis: str = AXIS,
                      tile_i: int | None = None, tile_j: int | None = None):
    """Returns a jitted ``state -> state`` step sharded over ``mesh``."""
    dt = jnp.float32(config.dt)
    ti = tile_i or config.tile_i
    tj = tile_j or config.tile_j

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: ParticleState) -> ParticleState:
        acc = ring_allpairs_accel(state.pos, state.mass, mesh, axis=axis,
                                  softening2=config.softening2,
                                  tile_i=ti, tile_j=tj, rcp=config.resolved_rcp())
        vel = state.vel + acc * dt
        pos = state.pos + vel * dt
        return state.replace(pos=pos, vel=vel)

    return step


def sharded_diagnostics(state: ParticleState, mesh: Mesh, axis: str = AXIS):
    """Collective (psum) system diagnostics: total mass, momentum, KE.

    The reference has no conserved-quantity telemetry; these support the
    energy-drift benchmark config (BASELINE.json config 2) at scale.
    """

    def local(pos_l, vel_l, mass_l):
        m = mass_l[:, None]
        mom = jax.lax.psum(jnp.sum(vel_l * m, axis=0), axis)
        ke = jax.lax.psum(jnp.sum(0.5 * mass_l * jnp.sum(vel_l ** 2, -1)), axis)
        mtot = jax.lax.psum(jnp.sum(mass_l), axis)
        com = jax.lax.psum(jnp.sum(pos_l * m, axis=0), axis) / mtot
        nlive = jax.lax.psum(jnp.sum((mass_l > 0).astype(jnp.int32)), axis)
        return mom, ke, mtot, com, nlive

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis, None), P(axis)),
                      out_specs=(P(), P(), P(), P(), P()))
    mom, ke, mtot, com, nlive = f(state.pos, state.vel, state.mass)
    return {"momentum": mom, "kinetic_energy": ke,
            "total_mass": mtot, "center_of_mass": com, "n_live": nlive}


def sharded_total_energy(state: ParticleState, mesh: Mesh, axis: str = AXIS,
                         softening2: float = 1e-3,
                         tile_i: int = 512, tile_j: int = 2048):
    """Exact total energy E = KE + U of a sharded state (psum'd scalar).

    U is the conservative-counterpart pair potential (ops/energy.py — the
    reference's own law is non-conservative, see that module's docstring),
    evaluated exactly with a ring ppermute of source tiles: O(N²/P) work
    per device, so this is a *cadence* diagnostic (BASELINE config 2's
    energy-drift check), not a per-step one.
    """
    from nbody_simulation_tpu.ops.energy import allpairs_potential

    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local(pos_l, vel_l, mass_l):
        phi = jnp.zeros((pos_l.shape[0],), jnp.float32)
        vis_pos, vis_mass = pos_l, mass_l
        for k in range(n_dev):
            if k > 0:
                vis_pos = jax.lax.ppermute(vis_pos, axis, perm)
                vis_mass = jax.lax.ppermute(vis_mass, axis, perm)
            phi = phi + allpairs_potential(
                pos_l, mass_l, src_pos=vis_pos, src_mass=vis_mass,
                softening2=softening2, tile_i=tile_i, tile_j=tile_j)
        pe = jax.lax.psum(jnp.sum(jnp.float32(0.5) * mass_l * phi), axis)
        ke = jax.lax.psum(
            jnp.sum(jnp.float32(0.5) * mass_l * jnp.sum(vel_l ** 2, -1)),
            axis)
        return pe, ke

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis, None), P(axis)),
                      out_specs=(P(), P()), check_vma=False)
    pe, ke = f(state.pos, state.vel, state.mass)
    return {"potential_energy": pe, "kinetic_energy": ke,
            "total_energy": pe + ke}

"""Semi-implicit (symplectic) Euler integration.

Mirrors the reference's sequential integrate loop (reference
src/main.rs:419-423):

    velocity += acceleration * dt
    position += velocity * dt        # uses the UPDATED velocity

with dt = STEP_SIZE = 0.1 by default (src/main.rs:34). Unlike the reference,
accelerations here are indexed consistently with the particle order they were
computed for — the reference's clone-before-permute index-mismatch bug
(src/main.rs:398-423, documented in SURVEY.md §3.2) is NOT reproduced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nbody_simulation_tpu.state import ParticleState


def euler_step(state: ParticleState, accel: jax.Array, dt: float) -> ParticleState:
    """One semi-implicit Euler update. ``accel`` is f32[N, 2]."""
    dt = jnp.float32(dt)
    vel = state.vel + accel * dt
    pos = state.pos + vel * dt
    return state.replace(pos=pos, vel=vel)


def leapfrog_step(state: ParticleState, accel_fn, dt: float) -> ParticleState:
    """Kick-drift-kick leapfrog (velocity Verlet) — an optional
    higher-order integrator the reference lacks (its only scheme is the
    semi-implicit Euler above). ``accel_fn`` is (pos, mass) -> accel and is
    evaluated twice per step; time-reversible and lower energy drift for
    smooth force fields.
    """
    dt = jnp.float32(dt)
    half = jnp.float32(0.5) * dt
    v_half = state.vel + accel_fn(state.pos, state.mass) * half
    pos = state.pos + v_half * dt
    vel = v_half + accel_fn(pos, state.mass) * half
    return state.replace(pos=pos, vel=vel)

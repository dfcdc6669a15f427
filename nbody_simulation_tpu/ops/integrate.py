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

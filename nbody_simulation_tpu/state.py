"""Structure-of-arrays particle state.

The reference stores an AoS ``Vec<Particle {position: Vec2, velocity: Vec2,
weight: u32}>`` (reference src/main.rs:193-198). On TPU the idiomatic layout is
SoA so each field is a dense, tileable array:

    pos  : f32[N, 2]   world-space position
    vel  : f32[N, 2]   velocity
    mass : f32[N]      the reference's u32 ``weight``, cast to f32 exactly as
                       the traversal does (``point.weight as f32``,
                       src/main.rs:360, :378)

Padding: TPU kernels want N to be a multiple of the tile size. ``pad_to``
appends sentinel particles with mass 0 placed outside the world bounds —
mass 0 means they exert zero force (the force numerator is ``diff * mass``,
src/main.rs:252), and out-of-bounds means the renderer skips them
(src/main.rs:47-49). ``n_real`` tracks the live count.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

# Sentinel position for padding particles: outside [0, world)² so the raster
# bounds check (src/main.rs:223-226 semantics) drops them.
PAD_POS = -1.0e6


@jax.tree_util.register_pytree_node_class
class ParticleState:
    """Immutable SoA particle state pytree."""

    __slots__ = ("pos", "vel", "mass", "n_real", "distributed")

    def __init__(self, pos: jax.Array, vel: jax.Array, mass: jax.Array,
                 n_real: int | None = None, distributed: bool = False):
        self.pos = pos
        self.vel = vel
        self.mass = mass
        self.n_real = int(n_real) if n_real is not None else int(pos.shape[0])
        # Distributed layouts interleave per-shard padding (shard d+1's real
        # rows sit after shard d's padding), so "first n_real rows are live"
        # does not hold — zero mass is the only live marker. real_slice()
        # refuses such states instead of silently returning padding.
        self.distributed = bool(distributed)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.pos, self.vel, self.mass), (self.n_real, self.distributed)

    @classmethod
    def tree_unflatten(cls, aux, children):
        pos, vel, mass = children
        n_real, distributed = aux if isinstance(aux, tuple) else (aux, False)
        obj = object.__new__(cls)
        object.__setattr__(obj, "pos", pos)
        object.__setattr__(obj, "vel", vel)
        object.__setattr__(obj, "mass", mass)
        object.__setattr__(obj, "n_real", n_real)
        object.__setattr__(obj, "distributed", distributed)
        return obj

    # -- construction -------------------------------------------------------
    @classmethod
    def create(cls, pos, vel, mass, n_real: int | None = None) -> "ParticleState":
        pos = jnp.asarray(pos, jnp.float32)
        vel = jnp.asarray(vel, jnp.float32)
        mass = jnp.asarray(mass, jnp.float32)
        assert pos.ndim == 2 and pos.shape[1] == 2, pos.shape
        assert vel.shape == pos.shape, (vel.shape, pos.shape)
        assert mass.shape == (pos.shape[0],), mass.shape
        return cls(pos, vel, mass, n_real)

    @property
    def n(self) -> int:
        """Total (padded) particle count."""
        return self.pos.shape[0]

    def pad_to(self, multiple: int) -> "ParticleState":
        """Pad to the next multiple of ``multiple`` with inert particles."""
        n = self.n
        target = -(-n // multiple) * multiple
        if target == n:
            return self
        extra = target - n
        pad_pos = jnp.full((extra, 2), PAD_POS, jnp.float32)
        # Spread sentinels slightly so no two coincide (coincident pairs are
        # masked by the force guard anyway, but distinct is cleaner).
        pad_pos = pad_pos + jnp.arange(extra, dtype=jnp.float32)[:, None]
        return ParticleState(
            jnp.concatenate([self.pos, pad_pos]),
            jnp.concatenate([self.vel, jnp.zeros((extra, 2), jnp.float32)]),
            jnp.concatenate([self.mass, jnp.zeros((extra,), jnp.float32)]),
            n_real=self.n_real,
        )

    def real_slice(self) -> "ParticleState":
        """Drop padding (host-side convenience; not for use under jit).

        Refuses distributed (interleaved-padding) layouts — use
        ``compact()`` for those.
        """
        if self.distributed:
            raise ValueError(
                "real_slice() on a distributed state would return interleaved"
                " padding as live rows; use ParticleState.compact() instead")
        k = self.n_real
        return ParticleState(self.pos[:k], self.vel[:k], self.mass[:k], k)

    def compact(self) -> "ParticleState":
        """Gather the live (mass > 0) rows of any layout into a compact
        single-host state (host-side; pulls full N to the host)."""
        import numpy as np
        mass = np.asarray(self.mass)
        live = mass > 0
        return ParticleState.create(np.asarray(self.pos)[live],
                                    np.asarray(self.vel)[live], mass[live])

    def replace(self, **kw: Any) -> "ParticleState":
        return ParticleState(
            kw.get("pos", self.pos),
            kw.get("vel", self.vel),
            kw.get("mass", self.mass),
            n_real=kw.get("n_real", self.n_real),
            distributed=kw.get("distributed", self.distributed),
        )

    def __repr__(self) -> str:
        return (f"ParticleState(n={self.n}, n_real={self.n_real}"
                + (", distributed" if self.distributed else "") + ")")

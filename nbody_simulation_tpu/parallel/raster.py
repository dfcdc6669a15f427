"""Distributed on-device rendering: per-shard partial rasters, one merge.

The single-chip raster (ops/raster.py) reduces the sequential splat loop
(reference src/main.rs:41-72) to three commutative per-pixel quantities —
heavy-any, light-count, last-light-index (+ its velocity tint). Those merge
across devices with plain collectives:

- ``green``: any heavy hit on any shard → ``pmax``;
- ``count``: light hits add across shards → ``psum``;
- last light hit: per-shard LOCAL indices are offset by ``shard · L`` into
  the device-major global order (exactly the order of the concatenated
  global array), ``pmax`` picks the global winner, and a masked ``psum``
  fetches the winner's tint (global indices are unique, so exactly one
  shard contributes).

The result is pixel-exact vs the single-chip render of the concatenated
arrays (asserted in tests/test_distributed.py), so a 16.7M-particle
distributed run renders without any device ever holding full N — per-device
cost is one local scatter pass plus three npix-sized collectives
(3 × 6.25 MB at the reference's 1250² frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_simulation_tpu.ops.raster import (accumulate_pixels,
                                             colorize_pixels)
from nbody_simulation_tpu.parallel.mesh import AXIS


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "world_size",
                                    "render_size", "heavy_weight"))
def sharded_render_frame(pos: jax.Array, vel: jax.Array, mass: jax.Array,
                         mesh: Mesh, axis: str = AXIS,
                         world_size: float = 100_000.0,
                         render_size: int = 1250,
                         heavy_weight: float = 10.0) -> jax.Array:
    """RGBA u8 frame of a device-sharded state; replicated on every device.

    ``pos``/``vel`` sharded ``P(axis, None)``, ``mass`` ``P(axis)`` (the
    ``distribute_state``/``shard_state`` layouts). Zero-mass padding rows
    sit at PAD_POS outside the world bounds, so they render nowhere —
    matching the single-chip render of the same concatenated arrays
    pixel-exactly.
    """
    n_dev = mesh.shape[axis]

    def local(pos_l, vel_l, mass_l):
        L = pos_l.shape[0]
        green_l, count_l, last_l, vlast_l = accumulate_pixels(
            pos_l, vel_l, mass_l, world_size, render_size, heavy_weight)
        my = jax.lax.axis_index(axis)
        glast_l = jnp.where(last_l >= 0, last_l + my * L, -1)
        green = jax.lax.pmax(green_l, axis)
        count = jax.lax.psum(count_l, axis)
        glast = jax.lax.pmax(glast_l, axis)
        mine = (glast >= 0) & (glast_l == glast)
        vlast = jax.lax.psum(jnp.where(mine, vlast_l, 0), axis)
        return colorize_pixels(green, count, vlast, render_size)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis, None), P(axis)),
                      out_specs=P(), check_vma=False)
    return f(pos, vel, mass)


def simulate_distributed(state, mesh: Mesh, config, steps: int,
                         snapshot_every: int = 0, on_frame=None,
                         rebalance_every: int = 0, axis: str = AXIS):
    """Engine-style loop for distributed runs: step → render → callback.

    A thin convenience wrapper over ``runtime.distributed.DistributedWorld``
    (which owns the step closure, the ON-DEVICE collective rebalance
    cadence — parallel/repartition.py, no host round-trip — and the
    adjacency seam-stage rescheduling): ``snapshot_every`` steps between
    on-device sharded renders (``on_frame(step, rgba_np)`` receives the
    merged frame). For the full runtime (snapshot queue, telemetry,
    viewer, checkpoints) use ``runtime.distributed.DistributedEngine``
    directly. Returns the final state.
    """
    import numpy as np

    from nbody_simulation_tpu.runtime.distributed import DistributedWorld

    world = DistributedWorld(state, mesh, config, axis=axis,
                             rebalance_every=rebalance_every)
    for i in range(1, steps + 1):
        world.step()
        if snapshot_every and on_frame and i % snapshot_every == 0:
            frame = sharded_render_frame(
                world.state.pos, world.state.vel, world.state.mass, mesh,
                axis=axis, world_size=config.world_size,
                render_size=config.render_size,
                heavy_weight=config.heavy_weight)
            on_frame(i, np.asarray(frame))
    return world.state

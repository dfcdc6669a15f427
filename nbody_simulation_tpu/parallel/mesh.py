"""Device mesh helpers.

The reference's only parallelism is a rayon thread pool plus a two-thread
pipeline (SURVEY.md §2, parallelism table); there is no distributed backend.
The TPU build scales by sharding the particle axis over a 1D mesh and moving
tiles over ICI with collectives — the N-body analogue of sequence/context
parallelism (a ring-attention-style systolic pass, see parallel/ring.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from nbody_simulation_tpu.state import ParticleState

AXIS = "shard"


def make_1d_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return jax.make_mesh((n,), (axis,), devices=devs[:n],
                         axis_types=(jax.sharding.AxisType.Auto,))


def shard_state(state: ParticleState, mesh: Mesh,
                axis: str = AXIS) -> ParticleState:
    """Pad so the per-device shard is tile-compatible, then shard particles.

    The local shard size is padded to a power of two (or a multiple of 2048
    once past it), which divides — or is smaller than — every power-of-two
    Pallas tile the step kernels use, for ANY input N.
    """
    n_dev = mesh.shape[axis]
    local = -(-state.n // n_dev)
    if local <= 2048:
        local = max(8, 1 << (local - 1).bit_length())
    else:
        local = -(-local // 2048) * 2048
    state = state.pad_to(n_dev * local)
    sh = NamedSharding(mesh, PartitionSpec(axis))
    return ParticleState(
        jax.device_put(state.pos, NamedSharding(mesh, PartitionSpec(axis, None))),
        jax.device_put(state.vel, NamedSharding(mesh, PartitionSpec(axis, None))),
        jax.device_put(state.mass, sh),
        n_real=state.n_real,
    )

"""Multi-host runtime: ``jax.distributed`` init + per-process state build.

A real v5e-16 is 4 hosts × 4 chips; the reference's only communication
channel is an in-process flume queue (/root/reference/src/main.rs:101-146),
so SURVEY.md §5 names ``jax.distributed`` over ICI/DCN as the TPU-native
equivalent. This module is the process-spanning entry path:

- ``init_distributed``: the ``jax.distributed.initialize`` call, driven by
  explicit args or the standard env vars; safe (and active) under a single
  process, idempotent under repeats. After it returns, ``jax.devices()``
  spans every host and a 1-D mesh over it is the same mesh the rest of
  ``parallel/`` already targets.
- ``multihost_state``: builds the canonical distributed ``ParticleState``
  WITHOUT any process materializing global N: each process generates only
  its scenario chunk (models/scenarios.scenario_chunk), places it on its
  own local devices (``jax.make_array_from_process_local_data``), and one
  collective on-device global Morton repartition (parallel/repartition.py)
  produces exactly the ``distribute_state`` layout — per-process memory is
  O(N/num_processes) end to end.

Cross-process collectives ride whatever backend the platform provides
(ICI/DCN on TPU pods; Gloo on CPU — which is how tests/test_multihost.py
exercises this path with REAL multi-process meshes on one machine).

Launch recipe (documented in docs/MULTIHOST.md): run the same program on
every host with only ``--process-id`` differing; see run_multihost.py.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.state import PAD_POS, ParticleState


def is_initialized() -> bool:
    """True once the jax.distributed client exists (incl. 1-process)."""
    from jax._src import distributed
    return distributed.global_state.client is not None


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """Initialize the JAX distributed system (idempotent).

    Explicit args win; otherwise the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, or a TPU-pod / Slurm / MPI auto-detect inside
    ``jax.distributed.initialize``) are used. With nothing set at all, the
    init call is STILL made — as a 1-process cluster on a loopback
    coordinator — so the single-process path runs through the identical
    code (the round-2 gap: no ``jax.distributed.initialize`` call path
    existed anywhere).
    """
    if is_initialized():
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator_address is None and num_processes is None:
        # Nothing configured: a 1-process cluster with the init call active.
        import socket
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coordinator_address = f"127.0.0.1:{port}"
        num_processes, process_id = 1, 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def local_layout(n_global: int, n_devices: int, config: SimConfig) -> int:
    """Per-device padded slot count L for ``n_global`` particles on
    ``n_devices`` — the same rounding ``distribute_state`` applies (power-
    of-two leaf count × leaf_size)."""
    per_dev = -(-n_global // n_devices)
    leaves = -(-per_dev // config.leaf_size)
    leaves = 1 << max(0, (leaves - 1).bit_length())
    return max(leaves * config.leaf_size, config.leaf_size)


def multihost_state(chunk: ParticleState, mesh, config: SimConfig,
                    axis: str = AXIS) -> ParticleState:
    """Assemble the canonical distributed state from per-process chunks.

    ``chunk`` is THIS process's particles (any order). Every process calls
    this with its own chunk; the union across processes is the global
    particle set. No process ever holds more than its chunk plus its local
    devices' shards. Single-process: equivalent (same layout, same global
    Morton order — bitwise, via the repartition's host-parity contract) to
    ``distribute_state`` of the concatenated chunks.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nbody_simulation_tpu.parallel.repartition import (
        make_collective_rebalance)

    n_dev = mesh.shape[axis]
    counts = process_allgather_counts(int(chunk.n))
    n_global = int(counts.sum())
    L = local_layout(n_global, n_dev, config)
    n_local_dev = len([d for d in mesh.devices.ravel()
                       if d.process_index == jax.process_index()])
    rows = n_local_dev * L
    if chunk.n > rows:
        raise ValueError(
            f"process chunk ({chunk.n}) exceeds local device capacity "
            f"({n_local_dev} devices × {L} slots); increase devices or "
            "rebalance chunk sizes")

    def padf(a, fill):
        out = np.full((rows,) + a.shape[1:], fill, np.float32)
        out[:chunk.n] = np.asarray(a)
        return out

    pos = padf(chunk.pos, PAD_POS)
    vel = padf(chunk.vel, 0.0)
    mass = padf(chunk.mass, 0.0)
    shp = NamedSharding(mesh, P(axis, None))
    shm = NamedSharding(mesh, P(axis))
    state = ParticleState(
        jax.make_array_from_process_local_data(shp, pos),
        jax.make_array_from_process_local_data(shp, vel),
        jax.make_array_from_process_local_data(shm, mass),
        n_real=n_dev * L, distributed=True)
    # One collective global Morton sort → the distribute_state layout.
    return make_collective_rebalance(mesh, config, axis=axis)(state)


def process_allgather_counts(n_local: int) -> np.ndarray:
    """All processes learn every process's chunk size (tiny host gather)."""
    if jax.process_count() == 1:
        return np.array([n_local], np.int64)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        np.array([n_local], np.int64))).ravel()


def chunk_bounds(n: int, pid: int, nproc: int) -> tuple[int, int]:
    """Row range [lo, hi) of process ``pid``'s equal chunk of ``n`` rows.

    THE multi-host row-split convention — scenario chunking
    (models/scenarios.scenario_chunk) and sharded-checkpoint reassembly
    (utils/checkpoint.load_sharded_checkpoint) must agree on it, so both
    import this single definition.
    """
    base, rem = divmod(n, nproc)
    lo = pid * base + min(pid, rem)
    return lo, lo + base + (1 if pid < rem else 0)


def local_block(arr) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """This process's rows of a sharded array, in device-major order.

    Returns ``(block, spans)`` where ``spans`` are the global [start, stop)
    row ranges of the concatenated addressable shards. THE convention for
    per-process readback — sharded recording (utils/recording.py) and
    sharded checkpoints (utils/checkpoint.py) both reassemble global rows
    from it.
    """
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    spans = [(int(s.index[0].start or 0),
              int(s.index[0].stop if s.index[0].stop is not None
                  else arr.shape[0])) for s in shards]
    return np.concatenate([np.asarray(s.data) for s in shards]), spans

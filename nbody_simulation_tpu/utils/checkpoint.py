"""Checkpoint / resume.

The reference has none (SURVEY.md §5 — only a commented-out recording
sketch, reference src/main.rs:119-134). The engine checkpoints the full
simulation state (pos, vel, mass, step) as a compressed .npz — small,
portable, and exact (fp32 bit patterns round-trip).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from nbody_simulation_tpu.state import ParticleState

FORMAT_VERSION = 1


def save_checkpoint(path: str | os.PathLike, state: ParticleState,
                    step: int) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f,
            version=np.int64(FORMAT_VERSION),
            step=np.int64(step),
            n_real=np.int64(state.n_real),
            pos=np.asarray(state.pos),
            vel=np.asarray(state.vel),
            mass=np.asarray(state.mass),
        )
    os.replace(tmp, path)  # atomic


def load_checkpoint(path: str | os.PathLike) -> tuple[ParticleState, int]:
    with np.load(path) as z:
        version = int(z["version"])
        if version != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        state = ParticleState.create(z["pos"], z["vel"], z["mass"],
                                     n_real=int(z["n_real"]))
        return state, int(z["step"])


# --- sharded checkpoints (no O(N)-on-one-host step) ------------------------
#
# Layout: a directory with manifest.json + shard_{pid:05d}.npz. Each file
# holds one writer process's COMPACT live rows; because the distributed
# layout is globally Morton-sorted with per-device real-first runs, the
# concatenation of files in pid order IS the canonical (compact, sorted)
# global state — so a reader with ANY process/device count just loads the
# files overlapping its equal slice of the global rank range and rebuilds
# the canonical layout with the same collective repartition the multi-host
# init uses (parallel/multihost.multihost_state). Per-process memory stays
# O(N/P_writers + N/P_readers) end to end.

import json

SHARDED_FORMAT_VERSION = 1


def save_sharded_checkpoint(path: str | os.PathLike, state: ParticleState,
                            step: int) -> None:
    """Every process calls this; each writes only its addressable rows.

    ``state`` must be in the canonical distributed layout
    (``distribute_state`` / ``multihost_state``: globally Morton-sorted,
    per-device real-first). Process 0 additionally writes the manifest
    (after a cross-process barrier so a complete manifest implies complete
    shards).
    """
    import jax

    from nbody_simulation_tpu.parallel.multihost import local_block

    path = Path(path)
    pid = jax.process_index()
    nproc = jax.process_count()
    path.mkdir(parents=True, exist_ok=True)
    pos, _ = local_block(state.pos)
    vel, _ = local_block(state.vel)
    mass, _ = local_block(state.mass)
    live = mass > 0
    n_live = int(live.sum())
    tmp = path / f"shard_{pid:05d}.npz.tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, version=np.int64(SHARDED_FORMAT_VERSION),
                            pos=pos[live], vel=vel[live], mass=mass[live])
    os.replace(tmp, path / f"shard_{pid:05d}.npz")

    from nbody_simulation_tpu.parallel.multihost import (
        process_allgather_counts)
    counts = process_allgather_counts(n_live)  # doubles as completion barrier
    if pid == 0:
        man = {"version": SHARDED_FORMAT_VERSION, "step": int(step),
               "n_processes": nproc,
               "counts": [int(c) for c in counts],
               "n_live": int(counts.sum())}
        tmpm = path / "manifest.json.tmp"
        tmpm.write_text(json.dumps(man))
        os.replace(tmpm, path / "manifest.json")


def load_sharded_checkpoint(path: str | os.PathLike, mesh, config,
                            axis: str = "shard"):
    """Rebuild the canonical distributed state from a sharded checkpoint.

    Works with ANY reader process count: each reader process loads only the
    shard files overlapping its equal slice of the global live-rank range
    (file contents are Morton-contiguous global ranks in pid order), then
    the multi-host assembly path repartitions collectively. Returns
    ``(state, step)``.
    """
    import jax

    from nbody_simulation_tpu.parallel.multihost import multihost_state

    path = Path(path)
    man = json.loads((path / "manifest.json").read_text())
    if man["version"] != SHARDED_FORMAT_VERSION:
        raise ValueError(f"unsupported sharded checkpoint version "
                         f"{man['version']}")
    from nbody_simulation_tpu.parallel.multihost import chunk_bounds

    counts = np.asarray(man["counts"], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n = int(offsets[-1])
    pid, nproc = jax.process_index(), jax.process_count()
    lo, hi = chunk_bounds(n, pid, nproc)
    pos, vel, mass = [], [], []
    for i in range(len(counts)):
        flo, fhi = int(offsets[i]), int(offsets[i + 1])
        if fhi <= lo or flo >= hi:
            continue
        with np.load(path / f"shard_{i:05d}.npz") as z:
            a, b = max(lo, flo) - flo, min(hi, fhi) - flo
            pos.append(z["pos"][a:b])
            vel.append(z["vel"][a:b])
            mass.append(z["mass"][a:b])
    if pos:
        chunk = ParticleState.create(np.concatenate(pos),
                                     np.concatenate(vel),
                                     np.concatenate(mass))
    else:
        chunk = ParticleState.create(np.zeros((0, 2), np.float32),
                                     np.zeros((0, 2), np.float32),
                                     np.zeros((0,), np.float32))
    return multihost_state(chunk, mesh, config, axis=axis), int(man["step"])

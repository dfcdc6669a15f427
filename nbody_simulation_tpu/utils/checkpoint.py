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

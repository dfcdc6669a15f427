"""Offline renderer: recording → PNG frames.

Completes the reference's vestigial recording story (the commented-out
zstd position-delta capture, reference src/main.rs:119-134, existed to
visualize runs after the fact): turn a recording made with
``run.py --record`` or ``run_multihost --record`` into framebuffer PNGs
using the exact splat rules (ops/raster.py, src/main.rs:41-72 semantics).

    python -m nbody_simulation_tpu.render_recording REC --out DIR
        [--render-size 1250] [--state ck.npz] [--every 1] [--platform cpu]

``REC`` is a single-chip ``.bin`` stream or a sharded recording directory
(``manifest.json`` + per-process streams). Recordings carry positions
only, so by default every particle renders with unit mass and zero
velocity (constant tint, no heavy-green) — pass ``--state`` (a checkpoint
from the same run) to restore the real masses and the heavy-particle
rule. Padding rows sit at the PAD_POS sentinel and render nowhere.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m nbody_simulation_tpu.render_recording",
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("recording", type=Path,
                   help=".bin stream or sharded recording directory")
    p.add_argument("--out", type=Path, required=True,
                   help="directory for frame_{step:08d}.png files")
    p.add_argument("--render-size", type=int, default=1250)
    p.add_argument("--world-size", type=float, default=100_000.0)
    p.add_argument("--state", type=Path, default=None,
                   help="checkpoint (.npz) from the same run: restores "
                        "masses (heavy-green rule) by ROW. Single-chip "
                        "recordings only (sharded rows are the padded "
                        "device layout; a checkpoint is compact — no row "
                        "mapping exists). Row mapping is exact for runs "
                        "that never Morton-resort (direct force path) or "
                        "for frames after the last resort; earlier BH "
                        "frames may green-tint the wrong particles.")
    p.add_argument("--every", type=int, default=1,
                   help="render every K-th recorded frame")
    p.add_argument("--platform", choices=("cpu", "tpu"), default="cpu",
                   help="cpu (default — offline tool) or the real chip")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.platform == "cpu":
        # env JAX_PLATFORMS does not override the axon plugin; this does.
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from nbody_simulation_tpu.ops.raster import render_frame
    from nbody_simulation_tpu.utils.pngio import save_png
    from nbody_simulation_tpu.utils.recording import (playback,
                                                      playback_sharded)

    emit = (lambda *a, **k: None) if args.quiet else print
    sharded = (args.recording / "manifest.json").exists()
    frames = (playback_sharded(args.recording) if sharded
              else playback(args.recording))

    mass = None
    if args.state is not None:
        if sharded:
            raise SystemExit(
                "--state cannot be row-mapped onto a sharded recording: "
                "its rows are the padded device-major layout, a "
                "checkpoint's are compact live rows. Render without "
                "--state (unit masses).")
        from nbody_simulation_tpu.utils.checkpoint import load_checkpoint
        st, _ = load_checkpoint(args.state)
        mass = np.asarray(st.mass)

    args.out.mkdir(parents=True, exist_ok=True)
    rendered = 0
    for k, (step, pos) in enumerate(frames):
        if k % max(1, args.every):
            continue
        n = pos.shape[0]
        if mass is not None and mass.shape[0] >= n:
            m = mass[:n]
        elif mass is not None:
            # Unit-fill (NOT zero-fill): rows beyond the checkpoint still
            # hold recorded particles — zero mass would silently erase
            # them from the frame.
            m = np.concatenate([mass, np.ones(n - mass.shape[0],
                                              np.float32)])
        else:
            m = np.ones(n, np.float32)
        frame = np.asarray(render_frame(
            pos, np.zeros_like(pos), m,
            world_size=args.world_size, render_size=args.render_size))
        out = args.out / f"frame_{step:08d}.png"
        save_png(out, frame)
        rendered += 1
        emit(f"rendered: {out}")
    emit(f"done: {rendered} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

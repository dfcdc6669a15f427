"""The application shell: ``python -m nbody_simulation_tpu.run``.

TPU-native equivalent of the reference's main() (reference
src/main.rs:81-184): where the reference opens a 1250x1250 winit window and
presents frames from the snapshot channel, this headless shell consumes the
engine's lossy snapshot queue, writes PNG frames, prints the once-per-second
fps/ups/step/Counting telemetry (src/main.rs:148-156 semantics), and adds
what the reference lacks: CLI config of the compile-time consts
(src/main.rs:31-35), checkpoint/resume, and delta recording.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from nbody_simulation_tpu.config import RCP_MODES  # jax-free


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nbody_simulation_tpu.run",
        description="TPU-native Barnes-Hut N-body simulator")
    p.add_argument("--scenario", default="galaxy",
                   choices=["galaxy", "uniform", "plummer", "collision"])
    p.add_argument("--n", type=int, default=100_000,
                   help="particle count for uniform/plummer scenarios")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--force-path", default="bh",
                   choices=["direct", "pallas", "bh"])
    p.add_argument("--theta", type=float, default=50.0,
                   help="reference convention: accept when s/d < theta")
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--integrator", default="euler",
                   choices=["euler", "leapfrog"])
    p.add_argument("--rcp", default=None, choices=list(RCP_MODES),
                   help="reciprocal/guard mode for the force kernels; "
                        "default resolves from theta "
                        "(SimConfig.resolved_rcp). '+clamp' trades the "
                        "reference's NaN-freeze guard for ~3.5%% BH / "
                        "8%% all-pairs speed — bitwise-identical forces "
                        "on finite states")
    p.add_argument("--sweep-buckets", default="auto",
                   help="occupancy-bucketed BH sweep budgets 'BF,CF' "
                        "(block_frac,col_frac), 'off', or 'auto' (default): "
                        "auto enables the measured (0.625,0.125) budgets on "
                        "the galaxy scenario (+15%% ups, bitwise-identical "
                        "forces — a lax.cond guard falls back to the full "
                        "sweep whenever the data exceeds the static "
                        "budgets) and disables elsewhere (the uniform disc "
                        "always falls back, paying ~3%% guard overhead)")
    p.add_argument("--leaf-size", type=int, default=64)
    p.add_argument("--world-size", type=float, default=100_000.0)
    p.add_argument("--render-size", type=int, default=1250)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", type=Path, default=Path("frames"),
                   help="directory for PNG frames (empty string disables)")
    p.add_argument("--frame-every", type=int, default=0,
                   help="save every k-th snapshot (0 = only the last)")
    p.add_argument("--checkpoint", type=Path, default=None,
                   help="save final state here")
    p.add_argument("--resume", type=Path, default=None,
                   help="resume from a checkpoint")
    p.add_argument("--record", type=Path, default=None,
                   help="zstd position-delta recording file (self-"
                        "contained; render offline with python -m "
                        "nbody_simulation_tpu.render_recording)")
    p.add_argument("--gif", type=Path, default=None,
                   help="assemble kept snapshots into an animated GIF "
                        "(composited over black like the reference window)")
    p.add_argument("--weighted-leaf-com", action="store_true",
                   help="fix the reference's unweighted-leaf-COM quirk")
    p.add_argument("--energy-every", type=int, default=0, metavar="K",
                   help="steps between live total-energy prints (0 = off): "
                        "E = KE + U under the conservative counterpart law "
                        "(ops/energy.py; the reference's own law is non-"
                        "conservative) plus |dE/E0| drift since start")
    p.add_argument("--energy-method", choices=("exact", "bh"),
                   default="exact",
                   help="exact: O(N²/2) pair sweep per sample; bh: O(N·C) "
                        "θ-consistent BH-planned approximation "
                        "(ops/energy.bh_total_energy) for large N")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--serve", type=int, default=0, metavar="PORT",
                   help="serve a live browser viewer on this port "
                        "(the headless stand-in for the reference's window)")
    p.add_argument("--snapshot-interval", type=float, default=0.0,
                   help="min seconds between rendered snapshots (0 = every "
                        "attempt with queue room, flume-style)")
    p.add_argument("--steps-per-snapshot", type=int, default=10,
                   help="physics steps between snapshot attempts; the frame "
                        "readback syncs host to device, pacing the pipeline "
                        "by sim progress rather than wall clock")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX backend (the axon TPU plugin ignores "
                        "JAX_PLATFORMS; this uses jax.config, which wins)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import World, galaxy, plummer, uniform_disc
    from nbody_simulation_tpu.runtime.engine import Engine
    from nbody_simulation_tpu.utils.checkpoint import (load_checkpoint,
                                                       save_checkpoint)
    from nbody_simulation_tpu.utils.pngio import save_png
    from nbody_simulation_tpu.utils.recording import Recorder
    from nbody_simulation_tpu.utils.telemetry import RateMeter

    if args.sweep_buckets == "auto":
        buckets = ((0.625, 0.125)
                   if args.scenario == "galaxy" and args.force_path == "bh"
                   else None)
    elif args.sweep_buckets == "off":
        buckets = None
    else:
        bf, cf = (float(v) for v in args.sweep_buckets.split(","))
        buckets = (bf, cf)

    cfg = SimConfig(force_path=args.force_path, theta=args.theta, dt=args.dt,
                    leaf_size=args.leaf_size, world_size=args.world_size,
                    render_size=args.render_size, integrator=args.integrator,
                    unweighted_leaf_com=not args.weighted_leaf_com,
                    rcp=args.rcp, sweep_buckets=buckets)

    start_step = 0
    if args.resume:
        state, start_step = load_checkpoint(args.resume)
    elif args.scenario == "galaxy":
        state = galaxy(seed=args.seed, world_size=args.world_size)
    elif args.scenario == "uniform":
        state = uniform_disc(args.n, seed=args.seed)
    elif args.scenario == "collision":
        from nbody_simulation_tpu.models import collision
        state = collision(seed=args.seed)
    else:
        state = plummer(args.n, seed=args.seed)

    emit = (lambda *_: None) if args.quiet else print
    emit(f"len: {state.n_real}")  # reference prints this (src/main.rs:343)

    world = World(state, cfg)
    world.updates = start_step
    on_batch = None
    if args.energy_every:
        from nbody_simulation_tpu.utils.telemetry import EnergyMeter
        on_batch = EnergyMeter(args.energy_every, emit=emit,
                               softening2=cfg.softening2,
                               method=args.energy_method)
    engine = Engine(world, include_particles=bool(args.record),
                    snapshot_interval=args.snapshot_interval,
                    steps_per_snapshot=args.steps_per_snapshot,
                    on_batch=on_batch)

    if args.serve:
        from nbody_simulation_tpu.viz import ViewerServer
        viewer = ViewerServer(engine, port=args.serve, energy_meter=on_batch)
        viewer.start()
        emit(f"viewer: http://127.0.0.1:{viewer.port}/")
        engine.start(max_steps=start_step + args.steps if args.steps else None)
        try:
            engine.join()
        except KeyboardInterrupt:
            pass
        engine.stop()
        viewer.stop()
        emit(f"done: {world.updates - start_step} steps")
        return 0
    recorder = Recorder(args.record) if args.record else None
    meter = RateMeter(emit=emit)

    if args.out:
        args.out.mkdir(parents=True, exist_ok=True)

    engine.start(max_steps=start_step + args.steps)
    last = None
    kept = 0
    # GIF frames are retained in host memory until assembly; cap the list by
    # doubling a keep-stride whenever it fills (long runs keep an evenly
    # subsampled ~GIF_MAX_FRAMES instead of growing without bound).
    GIF_MAX_FRAMES = 400
    gif_frames = []
    gif_stride, gif_seen = 1, 0
    while True:
        snap = engine.next_snapshot(timeout=None)
        if snap is None:
            break
        last = snap
        kept += 1
        meter.frame(snap.step, snap.counting)
        if args.out and args.frame_every and kept % args.frame_every == 0:
            save_png(args.out / f"frame_{snap.step:08d}.png", snap.frame)
        if recorder is not None and snap.pos is not None:
            recorder.maybe_record(snap.pos, snap.step)
        if args.gif is not None:
            from nbody_simulation_tpu.runtime.frame import composite_black
            if gif_seen % gif_stride == 0:
                gif_frames.append(composite_black(snap.frame))
                if len(gif_frames) > GIF_MAX_FRAMES:
                    gif_frames = gif_frames[::2]
                    gif_stride *= 2
            gif_seen += 1
    engine.join(timeout=600)
    engine.stop()

    if last is not None and args.out:
        save_png(args.out / f"frame_{last.step:08d}.png", last.frame)
        emit(f"final frame: {args.out / f'frame_{last.step:08d}.png'}")
    if recorder is not None:
        recorder.close()
        emit(f"recording: {recorder.frames} frames, raw {recorder.raw_bytes}"
             f" comp {recorder.comp_bytes}")
    if args.gif is not None and gif_frames:
        try:
            from PIL import Image
            imgs = [Image.fromarray(f) for f in gif_frames]
            imgs[0].save(args.gif, save_all=True, append_images=imgs[1:],
                         duration=80, loop=0)
            emit(f"gif: {args.gif} ({len(imgs)} frames)")
        except ImportError:
            emit("gif: PIL unavailable, skipped")
    if args.checkpoint:
        save_checkpoint(args.checkpoint, world.state.real_slice(),
                        world.updates)
        emit(f"checkpoint: {args.checkpoint} @ step {world.updates}")
    d = world.diagnostics()
    emit(f"done: {world.updates - start_step} steps, "
         f"{kept} snapshots kept, {engine.dropped} dropped, "
         f"mass {float(d['total_mass']):.1f}, "
         f"ke {float(d['kinetic_energy']):.6e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

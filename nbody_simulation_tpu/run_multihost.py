"""Multi-host launcher: ``python -m nbody_simulation_tpu.run_multihost``.

Run the SAME command on every host, varying only ``--process-id`` (on TPU
pods all three distributed flags can be omitted — jax auto-detects). Each
process generates its scenario chunk, joins the process-spanning mesh, and
drives the distributed simulate loop; process 0 writes frames/telemetry.

Example — two processes on one machine, virtual CPU devices (the pattern
tests/test_multihost.py automates; on a real pod drop --cpu-devices):

    python -m nbody_simulation_tpu.run_multihost \
        --coordinator 10.0.0.1:8476 --num-processes 2 --process-id $I \
        --scenario uniform --n 16384 --steps 100 --cpu-devices 4

The reference is single-process by construction (SURVEY.md §5, comm-backend
row; /root/reference/src/main.rs:101-146) — this launcher is the TPU-native
equivalent it never had.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from nbody_simulation_tpu.config import RCP_MODES  # jax-free


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nbody_simulation_tpu.run_multihost")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on TPU pods/Slurm)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--scenario", default="uniform",
                   choices=["galaxy", "uniform", "plummer", "collision"])
    p.add_argument("--n", type=int, default=65_536,
                   help="global particle count (uniform/plummer)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--theta", type=float, default=50.0)
    p.add_argument("--dt", type=float, default=0.1)
    p.add_argument("--render-size", type=int, default=1250,
                   help="framebuffer side (the snapshot render + its "
                        "3 npix merge collectives scale with its square)")
    p.add_argument("--rcp", default=None, choices=list(RCP_MODES),
                   help="reciprocal/guard mode; default resolves from "
                        "theta (SimConfig.resolved_rcp)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="steps between sharded renders (0 = none)")
    p.add_argument("--rebalance-every", type=int, default=1000,
                   help="steps between collective rebalances (0 = never)")
    p.add_argument("--out", default=None,
                   help="frame directory (process 0 only)")
    p.add_argument("--checkpoint", default=None,
                   help="save the final state here (canonicalized to the "
                        "single-chip file format; process 0 writes — see "
                        "docs/MULTIHOST.md)")
    p.add_argument("--resume", default=None,
                   help="resume from a checkpoint (single-chip or "
                        "distributed; re-distributed over this mesh)")
    p.add_argument("--checkpoint-sharded", default=None, metavar="DIR",
                   help="sharded checkpoint directory: every process "
                        "writes only its own rows (no O(N)-on-one-host "
                        "step); resumable with any process count")
    p.add_argument("--resume-sharded", default=None, metavar="DIR",
                   help="resume from a sharded checkpoint directory")
    p.add_argument("--record", default=None, metavar="DIR",
                   help="sharded zstd position-delta recording: every "
                        "process streams only its own rows "
                        "(utils.recording.playback_sharded reassembles)")
    p.add_argument("--record-every", type=int, default=10,
                   help="steps between recorded frames (checked at batch "
                        "boundaries with catch-up semantics)")
    p.add_argument("--energy-every", type=int, default=0, metavar="K",
                   help="steps between live total-energy prints (0 = off): "
                        "a cadence diagnostic (utils.telemetry.EnergyMeter)")
    p.add_argument("--energy-method", choices=("exact", "bh"),
                   default="exact",
                   help="exact: psum'd ring pair sweep, O(N²/P) per device "
                        "(tens of seconds/eval at flagship N); bh: psum'd "
                        "θ-consistent staged BH potential, O(N·C/P) — "
                        "milliseconds at any N "
                        "(parallel.bh_distributed_total_energy)")
    p.add_argument("--serve", type=int, default=0, metavar="PORT",
                   help="process 0: live browser viewer on this port")
    p.add_argument("--selfcheck", action="store_true",
                   help="before stepping, compare the distributed accel "
                        "(with this run's seam stages) against the "
                        "single-chip walk on the replicated state and "
                        "print the relative-error quantiles — the "
                        "launch-time quality gate for any mesh/process "
                        "topology (O(N) on process 0; use at modest N)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--exact-chunks", action="store_true",
                   help="exact-slice scenario chunking (O(N) host memory, "
                        "bitwise process-count-invariant particle set)")
    p.add_argument("--cpu-devices", type=int, default=0, metavar="K",
                   help="testing: force K virtual CPU devices per process")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cpu_devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
        xf = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{xf} --xla_force_host_platform_device_count="
            f"{args.cpu_devices}").strip()

    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    from nbody_simulation_tpu.parallel.multihost import (init_distributed,
                                                         multihost_state)
    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)

    import numpy as np

    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models.scenarios import scenario_chunk
    from nbody_simulation_tpu.parallel import (make_1d_mesh,
                                               sharded_diagnostics)

    from nbody_simulation_tpu.runtime.distributed import (DistributedEngine,
                                                          DistributedWorld)
    from nbody_simulation_tpu.utils.telemetry import RateMeter

    pid, nproc = jax.process_index(), jax.process_count()
    emit = print if (pid == 0 and not args.quiet) else (lambda *a, **k: None)
    emit(f"processes: {nproc}, devices: {len(jax.devices())} "
         f"({len(jax.local_devices())} local)")

    cfg = SimConfig(force_path="bh", theta=args.theta, dt=args.dt,
                    rcp=args.rcp, render_size=args.render_size)
    mesh = make_1d_mesh()

    start_step = 0
    if args.resume_sharded:
        from nbody_simulation_tpu.utils.checkpoint import (
            load_sharded_checkpoint)
        state, start_step = load_sharded_checkpoint(args.resume_sharded,
                                                    mesh, cfg)
    elif args.resume:
        from nbody_simulation_tpu.runtime.distributed import (
            load_distributed_checkpoint)
        state, start_step = load_distributed_checkpoint(args.resume, mesh,
                                                        cfg)
    else:
        kw = {"galaxy": {}, "collision": {}}.get(args.scenario,
                                                 {"n": args.n})
        chunk = scenario_chunk(args.scenario, pid, nproc, seed=args.seed,
                               exact=args.exact_chunks, **kw)
        state = multihost_state(chunk, mesh, cfg)
    emit(f"len: {int(np.asarray(sharded_diagnostics(state, mesh)['n_live']))}")

    world = DistributedWorld(state, mesh, cfg,
                             rebalance_every=args.rebalance_every)
    world.updates = start_step
    if args.selfcheck:
        # Every process joins the collectives; process 0 runs the
        # single-chip oracle walk and prints the quantiles.
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nbody_simulation_tpu.ops.traversal import bh_accel
        from nbody_simulation_tpu.parallel import bh_distributed_accel
        got = bh_distributed_accel(state.pos, state.mass, mesh,
                                   config=cfg, extra_pairs=world._extra)
        rep = jax.jit(lambda x: x + 0,
                      out_shardings=NamedSharding(mesh, P()))
        pos_all = np.asarray(rep(state.pos))
        mass_all = np.asarray(rep(state.mass))
        got_all = np.asarray(rep(got))
        if pid == 0:
            want = np.asarray(bh_accel(
                jnp.asarray(pos_all), jnp.asarray(mass_all),
                theta=cfg.theta, multipole=cfg.resolved_multipole(),
                morton_bits=cfg.resolved_morton_bits(),
                plan_leaves=cfg.plan_leaves))
            real = mass_all > 0
            rel = (np.linalg.norm(got_all[real] - want[real], axis=1)
                   / np.maximum(np.linalg.norm(want[real], axis=1), 1e-12))
            emit(f"selfcheck: median={np.median(rel):.3e} "
                 f"p99={np.percentile(rel, 99):.3e}")
    recorder = None
    if args.record:
        from nbody_simulation_tpu.utils.recording import ShardedRecorder
        recorder = ShardedRecorder(args.record, every=args.record_every)
    callbacks = []
    meter_cb = None
    if recorder is not None:
        callbacks.append(lambda w: recorder.maybe_record(w.state, w.updates))
    if args.energy_every:
        # Collective: every process joins the psum'd sweep; only process 0
        # prints (emit is a no-op elsewhere).
        from nbody_simulation_tpu.utils.telemetry import EnergyMeter
        meter_cb = EnergyMeter(args.energy_every, emit=emit,
                               softening2=cfg.softening2,
                               method=args.energy_method)
        callbacks.append(meter_cb)
    engine = DistributedEngine(
        world, snapshot_interval=0.0,
        steps_per_snapshot=max(1, args.snapshot_every or 10),
        on_batch=((lambda w: [cb(w) for cb in callbacks])
                  if callbacks else None))

    out = None
    if args.out and pid == 0:
        from pathlib import Path

        from nbody_simulation_tpu.utils.pngio import save_png
        out = Path(args.out)
        out.mkdir(parents=True, exist_ok=True)

    viewer = None
    bus = None
    # Multi-process runs get a FULLY interactive viewer on process 0:
    # /control submits intent to a ControlBus and EVERY process's producer
    # thread applies it collectively at the same step barrier
    # (runtime/control.py) — pause/step/θ/dt/quit stay mesh-synchronized
    # (the reference's window input, src/main.rs:168-182, restored on a
    # pod; round-4 verdict item 7). The bus must exist on EVERY process
    # (the poll is a collective), and controls only originate on process 0
    # — so bus activation is agreed by broadcasting process 0's --serve
    # flag once at startup (processes may legitimately be launched with
    # differing --serve values; only rank 0's matters).
    if nproc > 1:
        from jax.experimental import multihost_utils
        serve0 = bool(np.asarray(multihost_utils.broadcast_one_to_all(
            np.int32(1 if (pid == 0 and args.serve) else 0))))
        if serve0:
            from nbody_simulation_tpu.runtime.control import ControlBus
            bus = ControlBus(world.config.theta, world.config.dt,
                             world.config.render_size)
            engine.control_poll = bus.poll
    if args.serve:
        if pid == 0:
            from nbody_simulation_tpu.viz import ViewerServer
            viewer = ViewerServer(engine, port=args.serve,
                                  energy_meter=meter_cb, control_bus=bus)
            viewer.start()
            emit(f"viewer: http://127.0.0.1:{viewer.port}/"
                 + (" (controls broadcast to all processes)"
                    if nproc > 1 else ""), flush=True)

    meter = RateMeter(emit=emit)
    t0 = time.perf_counter()
    engine.start(max_steps=start_step + args.steps)
    last = None
    kept = 0
    while True:
        snap = engine.next_snapshot(timeout=None)
        if snap is None:
            break
        last = snap
        kept += 1
        meter.frame(snap.step, snap.counting)
        if out is not None and args.snapshot_every:
            from nbody_simulation_tpu.utils.pngio import save_png
            save_png(out / f"frame_{snap.step:08d}.png", snap.frame)
    engine.join(timeout=600)
    engine.stop()
    if viewer is not None:
        viewer.stop()

    d = world.diagnostics()
    dt_wall = time.perf_counter() - t0
    steps = world.updates - start_step
    emit(f"done: {steps} steps in {dt_wall:.1f}s "
         f"({steps / max(dt_wall, 1e-9):.1f} steps/s), "
         f"{kept} snapshots kept, {engine.dropped} dropped, "
         f"mass {float(d['total_mass']):.1f}, "
         f"ke {float(d['kinetic_energy']):.6e}")
    if out is not None and last is not None:
        from nbody_simulation_tpu.utils.pngio import save_png
        save_png(out / f"frame_{last.step:08d}.png", last.frame)
    if recorder is not None:
        recorder.close()
        emit(f"recording: {args.record} — {recorder.frames} frames, "
             f"raw {recorder.raw_bytes} comp {recorder.comp_bytes} "
             f"(this process)")

    if args.checkpoint_sharded:
        from nbody_simulation_tpu.utils.checkpoint import (
            save_sharded_checkpoint)
        save_sharded_checkpoint(args.checkpoint_sharded, world.state,
                                world.updates)
        emit(f"sharded checkpoint: {args.checkpoint_sharded} "
             f"@ step {world.updates}")
    if args.checkpoint:
        # compact() must address every row, so replicate first (a
        # collective every process runs); only process 0 writes the file.
        # docs/MULTIHOST.md documents the O(N)-on-host nature of
        # single-file checkpoints.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nbody_simulation_tpu.state import ParticleState
        from nbody_simulation_tpu.utils.checkpoint import save_checkpoint
        rep = jax.jit(lambda x: x + 0,
                      out_shardings=NamedSharding(mesh, P()))
        full = ParticleState(rep(world.state.pos), rep(world.state.vel),
                             rep(world.state.mass),
                             n_real=world.state.n_real, distributed=True)
        if pid == 0:
            save_checkpoint(args.checkpoint, full.compact(), world.updates)
            emit(f"checkpoint: {args.checkpoint} @ step {world.updates}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

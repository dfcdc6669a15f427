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
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="steps between sharded renders (0 = none)")
    p.add_argument("--rebalance-every", type=int, default=1000,
                   help="steps between collective rebalances (0 = never)")
    p.add_argument("--out", default=None,
                   help="frame directory (process 0 only)")
    p.add_argument("--checkpoint", default=None,
                   help="save the final state here (process 0 writes; the "
                        "state is canonicalized via compact-on-host of "
                        "process-0-addressable data only when small, else "
                        "refused — see docs/MULTIHOST.md)")
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
                                               sharded_diagnostics,
                                               simulate_distributed)

    pid, nproc = jax.process_index(), jax.process_count()
    emit = print if pid == 0 else (lambda *a, **k: None)
    emit(f"processes: {nproc}, devices: {len(jax.devices())} "
         f"({len(jax.local_devices())} local)")

    cfg = SimConfig(force_path="bh", theta=args.theta, dt=args.dt)
    mesh = make_1d_mesh()

    kw = {"galaxy": {}, "collision": {}}.get(args.scenario, {"n": args.n})
    chunk = scenario_chunk(args.scenario, pid, nproc, seed=args.seed,
                           exact=args.exact_chunks, **kw)
    state = multihost_state(chunk, mesh, cfg)
    emit(f"len: {int(np.asarray(sharded_diagnostics(state, mesh)['n_live']))}")

    on_frame = None
    if args.out and pid == 0:
        from pathlib import Path

        from nbody_simulation_tpu.utils.pngio import save_png
        out = Path(args.out)
        out.mkdir(parents=True, exist_ok=True)

        def on_frame(i, rgba):
            save_png(out / f"frame_{i:08d}.png", rgba)
    elif args.out:
        on_frame = lambda i, rgba: None  # non-zero procs join the render

    t0 = time.perf_counter()
    state = simulate_distributed(
        state, mesh, cfg, steps=args.steps,
        snapshot_every=args.snapshot_every, on_frame=on_frame,
        rebalance_every=args.rebalance_every)
    d = sharded_diagnostics(state, mesh)
    dt_wall = time.perf_counter() - t0
    emit(f"done: {args.steps} steps in {dt_wall:.1f}s "
         f"({args.steps / dt_wall:.1f} steps/s), "
         f"mass {float(d['total_mass']):.1f}, "
         f"ke {float(d['kinetic_energy']):.6e}")

    if args.checkpoint:
        # O(N)-on-host escape hatch (docs/MULTIHOST.md): replicate the
        # sharded arrays so every process can address them, then process 0
        # compacts + saves. All processes run the replicating jit (it is a
        # collective); only process 0 touches the filesystem.
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from nbody_simulation_tpu.state import ParticleState
        rep = jax.jit(lambda x: x + 0,
                      out_shardings=NamedSharding(mesh, P()))
        full = ParticleState(rep(state.pos), rep(state.vel), rep(state.mass),
                             n_real=state.n_real, distributed=True)
        if pid == 0:
            from nbody_simulation_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(args.checkpoint, full.compact(), args.steps)
            emit(f"checkpoint: {args.checkpoint}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

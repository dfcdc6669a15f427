"""Distributed runtime parity: the Engine stack over a sharded state.

Round 2's ``simulate_distributed`` was a bare host loop — no snapshot
queue, no Counting/fps/ups telemetry, no recorder/viewer/checkpoint. This
module gives multi-chip runs the SAME runtime the single-chip World gets
(runtime/engine.py — itself the TPU re-design of the reference's
physics-thread + lossy-channel + render-loop shell,
/root/reference/src/main.rs:101-184):

- ``DistributedWorld``: the World-shaped adapter around the distributed-BH
  step — step/run/reconfigure/assert_finite/step_timed — plus the
  distributed-only duties: collective rebalance cadence
  (parallel/repartition.py) and adjacency seam-stage rescheduling when the
  rebalance changes the Morton seams (parallel/bh_distributed.py).
- ``DistributedEngine``: the Engine subclass whose snapshots render with
  the pixel-exact sharded raster merge (parallel.sharded_render_frame), so
  only the finished RGBA frame ever leaves the mesh.

Checkpointing a distributed run canonicalizes through
``ParticleState.compact()`` (live rows, global Morton order) so the file
format is identical to single-chip checkpoints and ``--resume`` can target
any mesh size; at very large N this is an O(N)-on-host operation by
nature of writing one file (documented in docs/MULTIHOST.md).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.parallel.bh_distributed import (
    adjacency_stages, make_distributed_bh_step, resolved_seam_stages)
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.parallel.raster import sharded_render_frame
from nbody_simulation_tpu.parallel.repartition import (
    make_collective_rebalance)
from nbody_simulation_tpu.parallel.sharded_step import sharded_diagnostics
from nbody_simulation_tpu.runtime.engine import Engine, Snapshot
from nbody_simulation_tpu.state import ParticleState
from nbody_simulation_tpu.utils.telemetry import Counting, PhaseTimer


class DistributedWorld:
    """World-shaped driver of a distributed state on a device mesh."""

    def __init__(self, state: ParticleState, mesh, config: SimConfig,
                 axis: str = AXIS, rebalance_every: int = 0):
        assert state.distributed, "expects a distribute_state layout"
        self.mesh = mesh
        self.axis = axis
        self.config = config
        self.state = state
        self.updates = 0
        self.rebalance_every = rebalance_every
        self._rebalance = (make_collective_rebalance(mesh, config, axis=axis)
                          if rebalance_every else None)
        self._build_step()

    def _build_step(self) -> None:
        self._extra = (adjacency_stages(self.state, self.mesh, self.config,
                                        axis=self.axis)
                       if resolved_seam_stages(self.config) else ())
        self._step = make_distributed_bh_step(self.mesh, self.config,
                                              axis=self.axis,
                                              extra_pairs=self._extra)

    # -- World interface ----------------------------------------------------
    def step(self) -> None:
        self.state = self._step(self.state)
        self.updates += 1
        if self.rebalance_every and self.updates % self.rebalance_every == 0:
            self.state = self._rebalance(self.state)
            if resolved_seam_stages(self.config):
                extra = adjacency_stages(self.state, self.mesh, self.config,
                                         axis=self.axis)
                if extra != self._extra:
                    # Seam set changed: swap step closures. The jitted pair
                    # is memoized on (mesh, config, axis, extra_pairs)
                    # inside make_distributed_bh_step, so flipping back to
                    # an already-seen adjacency reuses its compiled program
                    # (no retrace; the fresh closure's counter starts at 0,
                    # i.e. resort-first — correct right after a rebalance).
                    self._extra = extra
                    self._step = make_distributed_bh_step(
                        self.mesh, self.config, axis=self.axis,
                        extra_pairs=extra)
                    return
            self._step.reset()

    def run(self, steps: int) -> None:
        for _ in range(steps):
            self.step()

    def step_timed(self, counting: Counting) -> None:
        """One synced, timed step. The fused distributed step has no
        separable phases without extra dispatches; like the single-chip
        fused path (utils/telemetry.py docstring) the whole step lands in
        ``sum_gravity``."""
        self._sync()
        with PhaseTimer(counting, "sum_gravity"):
            self.step()
            self._sync()

    def _sync(self) -> float:
        return float(jnp.sum(self.state.pos))

    def reconfigure(self, **changes) -> None:
        self.config = self.config.replace(**changes)
        if self.rebalance_every:
            self._rebalance = make_collective_rebalance(
                self.mesh, self.config, axis=self.axis)
        self._build_step()

    def assert_finite(self) -> None:
        if not bool(jnp.isfinite(jnp.sum(self.state.pos))):
            raise FloatingPointError(
                f"non-finite positions at step {self.updates}")

    def diagnostics(self) -> dict:
        return sharded_diagnostics(self.state, self.mesh, axis=self.axis)


class DistributedEngine(Engine):
    """Engine whose snapshots come from the sharded raster merge."""

    def __init__(self, world: DistributedWorld, **kw):
        if kw.get("include_particles"):
            raise ValueError(
                "include_particles (position recording) would ship full N "
                "through every snapshot — use sharded recording instead "
                "(utils.recording.ShardedRecorder via the on_batch hook, "
                "or run_multihost --record DIR)")
        super().__init__(world, **kw)
        import jax
        self._multiprocess = jax.process_count() > 1

    def _snapshot_due(self, now: float, paused: bool) -> bool:
        # _render_snapshot is a cross-process collective (psum/pmax over
        # the mesh): in a multi-process run EVERY process must reach the
        # same decision, so the local/nondeterministic gates (queue
        # fullness, wall clock) are unusable — render at every batch
        # boundary unconditionally (the PUSH stays lossy per process,
        # which is local and harmless). run_multihost drives this engine
        # with snapshot_interval=0, so the single-process behavior at
        # those settings is identical anyway.
        if self._multiprocess:
            return not paused
        return super()._snapshot_due(now, paused)

    def _render_snapshot(self) -> bytes:
        w: DistributedWorld = self.world
        cfg = w.config
        frame = np.asarray(sharded_render_frame(
            w.state.pos, w.state.vel, w.state.mass, w.mesh, axis=w.axis,
            world_size=cfg.world_size, render_size=cfg.render_size,
            heavy_weight=cfg.heavy_weight))
        return Snapshot(w.updates, self.counting.copy(), frame, None).pack()


def save_distributed_checkpoint(path, world: DistributedWorld) -> None:
    """Canonicalize (compact live rows, Morton order) and save — same file
    format as single-chip checkpoints, loadable onto any mesh."""
    from nbody_simulation_tpu.utils.checkpoint import save_checkpoint
    save_checkpoint(path, world.state.compact(), world.updates)


def load_distributed_checkpoint(path, mesh, config: SimConfig,
                                axis: str = AXIS):
    """Load a checkpoint (single-chip or canonicalized distributed) and
    distribute it over ``mesh``. Returns (state, step)."""
    from nbody_simulation_tpu.parallel.bh_distributed import distribute_state
    from nbody_simulation_tpu.utils.checkpoint import load_checkpoint
    state, step = load_checkpoint(path)
    return distribute_state(state, mesh, config, axis=axis), step

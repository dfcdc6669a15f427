"""Telemetry: per-phase counters and ups/fps meters.

The reference accumulates wall seconds for its three step phases in
``Counting {build_bvh, sum_gravity, post_calculations}`` (reference
src/main.rs:74-79, :402, :417, :424) and prints fps/ups/step/counters once
per second from the render loop (src/main.rs:148-156). Same semantics here:
``ups`` counts simulation steps, ``fps`` counts frames presented; they are
decoupled because the sim and render loops are.

On TPU the three phases only have distinct wall times when the step is run
in profile mode (one dispatch + host sync per phase); the fused fast path
attributes the whole step to ``sum_gravity``.
"""

from __future__ import annotations

import dataclasses
import time


@dataclasses.dataclass
class Counting:
    build_bvh: float = 0.0
    sum_gravity: float = 0.0
    post_calculations: float = 0.0

    def copy(self) -> "Counting":
        return Counting(self.build_bvh, self.sum_gravity, self.post_calculations)

    def __repr__(self) -> str:  # mirrors Rust's {:?} print shape
        return (f"Counting {{ build_bvh: {self.build_bvh}, "
                f"sum_gravity: {self.sum_gravity}, "
                f"post_calculations: {self.post_calculations} }}")


class PhaseTimer:
    """Context-manager accumulator: ``with timer(counting, 'build_bvh'): ...``"""

    def __init__(self, counting: Counting, phase: str):
        self.counting = counting
        self.phase = phase

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        setattr(self.counting, self.phase,
                getattr(self.counting, self.phase)
                + (time.perf_counter() - self._t0))
        return False


class trace:
    """jax.profiler trace hook: ``with trace("/tmp/tb"): world.run(10)``.

    Produces a TensorBoard-readable device trace (SURVEY.md §5: the TPU
    upgrade of the reference's wall-clock Instant counters). No-op if the
    profiler is unavailable on the backend.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        import jax
        try:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        except Exception:
            self._active = False
        return self

    def __exit__(self, *exc):
        if self._active:
            import jax
            jax.profiler.stop_trace()
        return False


class EnergyMeter:
    """Cadence total-energy telemetry for the Engine's ``on_batch`` hook.

    Makes BASELINE config 2's energy-drift check a LIVE production metric:
    every ``every`` steps it evaluates E = KE + U under the conservative
    counterpart law (ops/energy.py — the reference's own force law is
    non-conservative, see that module) and prints the drift relative to the
    first sample. Works on both the single-chip World and DistributedWorld
    (detected by the ``mesh`` attribute; the sharded path psums a ring
    ppermute pair sweep, O(N²/P) per device). Samples are recorded in
    ``self.samples`` as (step, energy) for programmatic use.
    """

    def __init__(self, every: int, emit=print, softening2: float = 1e-3,
                 method: str = "exact"):
        assert method in ("exact", "bh"), method
        self.every = max(1, every)
        self.emit = emit
        self.softening2 = softening2
        self.method = method
        self.e0: float | None = None
        self.samples: list[tuple[int, float]] = []
        self._last = None

    def __call__(self, world) -> None:
        step = world.updates
        if self._last is not None and step - self._last < self.every:
            return
        self._last = step
        if getattr(world, "mesh", None) is not None:
            if self.method == "bh":
                # O(N·C/P) θ-consistent staged potential — the scalable
                # cadence mode (at flagship N the exact ring sweep costs
                # tens of seconds per evaluation). Uses the world's live
                # seam stages so the approximation matches the force pass.
                from nbody_simulation_tpu.parallel.bh_distributed import (
                    bh_distributed_total_energy)
                e = float(bh_distributed_total_energy(
                    world.state, world.mesh, world.config,
                    extra_pairs=getattr(world, "_extra", ()),
                )["total_energy"])
            else:
                # Sharded exact ring sweep, O(N²/P) per device.
                from nbody_simulation_tpu.parallel.sharded_step import (
                    sharded_total_energy)
                e = float(sharded_total_energy(
                    world.state, world.mesh,
                    softening2=self.softening2)["total_energy"])
        elif self.method == "bh":
            # O(N·C) θ-consistent approximation — the large-N cadence mode.
            from nbody_simulation_tpu.ops.energy import bh_total_energy
            e = float(bh_total_energy(world.state, world.config))
        else:
            from nbody_simulation_tpu.ops.energy import total_energy
            e = float(total_energy(world.state, softening2=self.softening2))
        if self.e0 is None:
            self.e0 = e
        drift = abs(e - self.e0) / max(abs(self.e0), 1e-30)
        self.samples.append((step, e))
        self.emit(f"energy: step {step} E={e:.6e} |dE/E0|={drift:.3e}")


class RateMeter:
    """Once-per-second fps/ups printer (src/main.rs:148-156 semantics)."""

    def __init__(self, emit=print, interval: float = 1.0):
        self.emit = emit
        self.interval = interval
        self.frames = 0
        self.last_updates = 0
        self._t0 = time.perf_counter()

    def frame(self, updates: int, counting: Counting | None = None) -> None:
        self.frames += 1
        now = time.perf_counter()
        if now - self._t0 >= self.interval:
            self.emit(f"fps: {self.frames}\nups: {updates - self.last_updates}")
            self.emit(f"step: {updates}")
            if counting is not None:
                self.emit(repr(counting))
            self.frames = 0
            self.last_updates = updates
            self._t0 = now

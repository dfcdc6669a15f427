"""Cross-process control broadcast — interactive input on a pod.

The reference window is ALWAYS interactive (reference src/main.rs:168-182);
round 4 made multi-process viewers read-only because a control applied to
process 0's engine alone desynchronizes the mesh collectives. This module
restores pause/step/θ/dt/quit on multi-process runs by making control
application itself a deterministic collective:

- the viewer (process 0 only) never touches the engine; it submits the
  user's INTENT to the bus (seq-stamped, lock-protected, viewer thread);
- every process's producer thread polls the bus once per engine-loop
  iteration (engine.control_poll hook, runtime/engine.py): one tiny
  ``broadcast_one_to_all`` of process 0's intent vector — a collective all
  processes join at the SAME iteration index, so every process sees the
  same intent at the same step barrier and applies the same change before
  the same batch (the jax.distributed KV store would give visibility but
  not simultaneity; the broadcast gives both, riding the mesh the steps
  already ride);
- lockstep is self-maintaining: the broadcast blocks until every process
  arrives, and every state change (pause/resume/step-once/reconfigure/
  quit) originates from the same broadcast result, so the loop structure —
  including the paused poll-wait spin — stays identical everywhere.

The intent crosses processes as an int32[8] vector (seq, flags, step_seq,
render_size, θ and dt as raw f64 bit-halves — bit-faithful regardless of
the x64 flag). Single-process buses skip the collective entirely, so the
viewer path is identical code at P=1.
"""

from __future__ import annotations

import threading

import numpy as np

_FLAG_PAUSE = 1
_FLAG_QUIT = 2


def _pack_f64(v: float) -> tuple[int, int]:
    w = np.frombuffer(np.float64(v).tobytes(), np.int32)
    return int(w[0]), int(w[1])


def _unpack_f64(lo: int, hi: int) -> float:
    return float(np.frombuffer(np.array([lo, hi], np.int32).tobytes(),
                               np.float64)[0])


class ControlBus:
    """Deterministic control channel from process 0's viewer to every
    process's engine. Construct on EVERY process (the poll is a collective);
    submit from process 0 only (other processes' intents are ignored by
    construction — only rank 0's vector is broadcast)."""

    def __init__(self, theta: float, dt: float, render_size: int,
                 multiprocess: bool | None = None):
        import jax
        self._lock = threading.Lock()
        self._seq = 0
        self._pause = False
        self._quit = False
        self._step_seq = 0
        self._theta = float(theta)
        self._dt = float(dt)
        self._render_size = int(render_size)
        self._applied_seq = 0
        self._applied_step_seq = 0
        self._multiprocess = (jax.process_count() > 1
                              if multiprocess is None else multiprocess)

    # -- viewer side (process 0, any thread) --------------------------------
    def submit(self, cmd: str | None = None, **changes) -> None:
        """Record a control intent. ``cmd`` ∈ pause|resume|toggle|step|quit;
        ``changes`` may carry validated theta/dt/render_size. The bus's
        pause flag is authoritative (engines start unpaused, the bus starts
        False — in sync), so toggle is a plain flip."""
        with self._lock:
            if cmd == "pause":
                self._pause = True
            elif cmd == "resume":
                self._pause = False
            elif cmd == "toggle":
                self._pause = not self._pause
            elif cmd == "step":
                self._step_seq += 1
            elif cmd == "quit":
                self._quit = True
            if "theta" in changes:
                self._theta = float(changes["theta"])
            if "dt" in changes:
                self._dt = float(changes["dt"])
            if "render_size" in changes:
                self._render_size = int(changes["render_size"])
            self._seq += 1

    def _vector(self) -> np.ndarray:
        with self._lock:
            flags = ((_FLAG_PAUSE if self._pause else 0)
                     | (_FLAG_QUIT if self._quit else 0))
            t_lo, t_hi = _pack_f64(self._theta)
            d_lo, d_hi = _pack_f64(self._dt)
            return np.array([self._seq, flags, self._step_seq,
                             self._render_size, t_lo, t_hi, d_lo, d_hi],
                            np.int32)

    # -- engine side (every process, producer thread) -----------------------
    def poll(self, engine) -> None:
        """One collective broadcast of process 0's intent; apply the delta
        to THIS process's engine. Called from engine.control_poll at every
        loop iteration — identical iteration counts on every process keep
        the collective matched."""
        vec = self._vector()
        if self._multiprocess:
            from jax.experimental import multihost_utils
            vec = np.asarray(multihost_utils.broadcast_one_to_all(vec))
        seq = int(vec[0])
        if seq == self._applied_seq:
            return
        self._applied_seq = seq
        flags = int(vec[1])
        if flags & _FLAG_QUIT:
            engine._stop.set()
            return
        if flags & _FLAG_PAUSE:
            engine.pause()
        else:
            engine.resume()
        step_seq = int(vec[2])
        if step_seq != self._applied_step_seq:
            self._applied_step_seq = step_seq
            engine.step_once()
        cfg = engine.world.config
        changes = {}
        theta = _unpack_f64(int(vec[4]), int(vec[5]))
        dt = _unpack_f64(int(vec[6]), int(vec[7]))
        rs = int(vec[3])
        if theta != cfg.theta:
            changes["theta"] = theta
        if dt != cfg.dt:
            changes["dt"] = dt
        if rs != cfg.render_size:
            changes["render_size"] = rs
        if changes:
            engine.reconfigure(**changes)

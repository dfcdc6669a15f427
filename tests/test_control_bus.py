"""Cross-process control broadcast (runtime/control.ControlBus).

In-process tier: the bus drives a real single-process Engine through the
engine.control_poll hook (identical code path to multi-process, minus the
collective) — pause/resume/step/quit/θ/dt all applied at batch boundaries,
plus the f64 bit-packing that carries θ/dt across processes exactly. The
2-process Gloo tier (viewer → bus → both processes' engines) lives in
tests/test_multihost.py::test_viewer_controls_broadcast_two_process."""

import time

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.models.world import World
from nbody_simulation_tpu.runtime.control import (ControlBus, _pack_f64,
                                                  _unpack_f64)
from nbody_simulation_tpu.runtime.engine import Engine


def test_f64_bit_packing_exact():
    for v in (0.5, 0.1, 50.0, 1e-6, 3.141592653589793, 0.0):
        lo, hi = _pack_f64(v)
        assert _unpack_f64(lo, hi) == v, v


def test_bus_drives_engine_through_poll_hook():
    cfg = SimConfig(force_path="direct", render_size=64, dt=0.1)
    world = World(uniform_disc(256, seed=1), cfg)
    engine = Engine(world, snapshot_interval=0.0, steps_per_snapshot=2)
    bus = ControlBus(cfg.theta, cfg.dt, cfg.render_size, multiprocess=False)
    engine.control_poll = bus.poll
    engine.start(max_steps=None)
    try:
        # Let it run, then pause via the bus: step counter must stop.
        for _ in range(200):
            if world.updates >= 4:
                break
            time.sleep(0.05)
        assert world.updates >= 4
        bus.submit("pause")
        for _ in range(200):
            if engine.paused:
                break
            time.sleep(0.05)
        assert engine.paused
        u0 = world.updates
        time.sleep(0.5)
        assert world.updates == u0

        # step-once while paused: exactly one batch.
        bus.submit("step")
        for _ in range(200):
            if world.updates > u0:
                break
            time.sleep(0.05)
        assert world.updates == u0 + engine.steps_per_snapshot
        assert engine.paused  # still paused after the single batch

        # θ/dt retune applies while paused (poll loop keeps spinning).
        bus.submit(theta=0.25, dt=0.05)
        for _ in range(200):
            if world.config.theta == 0.25 and world.config.dt == 0.05:
                break
            time.sleep(0.05)
        assert world.config.theta == 0.25 and world.config.dt == 0.05

        # resume, then quit: the producer thread exits.
        bus.submit("resume")
        for _ in range(200):
            if not engine.paused and world.updates > u0 + 2:
                break
            time.sleep(0.05)
        assert world.updates > u0 + 2
        bus.submit("quit")
        engine.join(timeout=30)
        assert not engine._thread.is_alive()
    finally:
        engine._stop.set()


def test_viewer_submits_to_bus_instead_of_engine():
    """With a bus attached, /control must not touch the engine directly —
    the change lands via the poll hook (same path multi-process takes)."""
    import json
    import urllib.request

    from nbody_simulation_tpu.viz import ViewerServer

    cfg = SimConfig(force_path="direct", render_size=64, dt=0.1)
    world = World(uniform_disc(256, seed=1), cfg)
    engine = Engine(world, snapshot_interval=0.0, steps_per_snapshot=2)
    bus = ControlBus(cfg.theta, cfg.dt, cfg.render_size, multiprocess=False)
    engine.control_poll = bus.poll
    viewer = ViewerServer(engine, port=0, control_bus=bus)
    viewer.start()
    engine.start(max_steps=None)
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        urllib.request.urlopen(f"{base}/control?cmd=pause&theta=0.5",
                               timeout=10).read()
        assert bus._pause and bus._theta == 0.5
        for _ in range(200):
            stats = json.loads(urllib.request.urlopen(f"{base}/stats",
                                                      timeout=10).read())
            if stats["paused"] and stats["theta"] == 0.5:
                break
            time.sleep(0.05)
        assert stats["paused"] and stats["theta"] == 0.5, stats
        urllib.request.urlopen(f"{base}/control?cmd=quit", timeout=10).read()
        assert viewer.quit_requested.is_set()
        engine.join(timeout=30)
        assert not engine._thread.is_alive()
    finally:
        engine._stop.set()
        viewer.stop()

"""Live viewer server over the engine queue."""

import json
import urllib.request

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.models.world import World
from nbody_simulation_tpu.runtime.engine import Engine
from nbody_simulation_tpu.viz import ViewerServer


def test_viewer_serves_frames_and_stats():
    from nbody_simulation_tpu.utils.telemetry import EnergyMeter

    cfg = SimConfig(force_path="direct", render_size=64)
    world = World(uniform_disc(256, seed=1), cfg)
    engine = Engine(world, snapshot_interval=0.0,
                    on_batch=EnergyMeter(10, emit=lambda *_: None))
    viewer = ViewerServer(engine, port=0)  # ephemeral port
    viewer.start()
    engine.start(max_steps=30)
    engine.join(timeout=120)

    base = f"http://127.0.0.1:{viewer.port}"
    # Wait for the consumer to ingest at least one snapshot.
    import time
    for _ in range(100):
        stats = json.loads(urllib.request.urlopen(f"{base}/stats",
                                                  timeout=10).read())
        if stats["step"] > 0:
            break
        time.sleep(0.05)
    assert stats["step"] > 0, stats
    # Live energy telemetry surfaces once the EnergyMeter has sampled.
    assert "energy" in stats, stats
    assert stats["energy"]["drift"] >= 0.0

    png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    page = urllib.request.urlopen(base, timeout=10).read()
    assert b"nbody_simulation_tpu" in page

    engine.stop()
    viewer.stop()


def test_viewer_controls_and_stream():
    """Input handling parity with the reference window (src/main.rs:168-182):
    pause stops the step counter, resume restarts it, θ/dt retune live, the
    stream endpoint pushes multipart PNG frames, quit ends the run."""
    import time

    cfg = SimConfig(force_path="direct", render_size=64, dt=0.1)
    world = World(uniform_disc(256, seed=1), cfg)
    engine = Engine(world, snapshot_interval=0.0, steps_per_snapshot=2)
    viewer = ViewerServer(engine, port=0)
    viewer.start()
    engine.start(max_steps=None)
    base = f"http://127.0.0.1:{viewer.port}"

    def ctl(q):
        return urllib.request.urlopen(f"{base}/control?{q}", timeout=10).read()

    # stream: first multipart part arrives with a PNG payload
    req = urllib.request.urlopen(f"{base}/stream", timeout=30)
    chunk = req.read(200)
    assert b"--frame" in chunk and b"image/png" in chunk
    req.close()

    ctl("cmd=pause")
    time.sleep(0.3)
    s1 = json.loads(urllib.request.urlopen(f"{base}/stats", timeout=10).read())
    assert s1["paused"] is True
    step_at_pause = world.updates
    time.sleep(0.4)
    assert world.updates == step_at_pause  # no steps while paused

    ctl("cmd=step")
    time.sleep(0.4)
    assert world.updates > step_at_pause  # single batch advanced
    stepped = world.updates
    time.sleep(0.3)
    assert world.updates == stepped       # still paused after the step

    ctl("dt=0.05")
    ctl("cmd=resume")
    time.sleep(0.5)
    assert world.updates > stepped
    assert world.config.dt == 0.05        # live retune took effect

    ctl("cmd=quit")
    engine.join(timeout=30)
    assert not engine._thread.is_alive()
    viewer.stop()


def test_viewer_read_only_refuses_controls():
    """read_only=True (explicitly watch-only surfaces): frames/stats serve,
    /control returns 409 with the explanation, the page shows the banner."""
    import time
    import urllib.error

    cfg = SimConfig(force_path="direct", render_size=64)
    world = World(uniform_disc(256, seed=1), cfg)
    engine = Engine(world, snapshot_interval=0.0)
    viewer = ViewerServer(engine, port=0, read_only=True)
    viewer.start()
    engine.start(max_steps=10)
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        try:
            urllib.request.urlopen(f"{base}/control?cmd=pause", timeout=10)
            raise AssertionError("read_only /control must 409")
        except urllib.error.HTTPError as e:
            assert e.code == 409
            assert b"read-only" in e.read()
        assert not engine.paused
        assert b"read-only" in urllib.request.urlopen(base, timeout=10).read()
        stats = json.loads(urllib.request.urlopen(f"{base}/stats",
                                                  timeout=10).read())
        assert "step" in stats
        engine.join(timeout=120)
    finally:
        engine._stop.set()
        viewer.stop()

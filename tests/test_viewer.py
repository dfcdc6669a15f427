"""Live viewer server over the engine queue."""

import json
import urllib.request

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.models.world import World
from nbody_simulation_tpu.runtime.engine import Engine
from nbody_simulation_tpu.viz import ViewerServer


def test_viewer_serves_frames_and_stats():
    cfg = SimConfig(force_path="direct", render_size=64)
    world = World(uniform_disc(256, seed=1), cfg)
    engine = Engine(world, snapshot_interval=0.0)
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

    png = urllib.request.urlopen(f"{base}/frame.png", timeout=10).read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    page = urllib.request.urlopen(base, timeout=10).read()
    assert b"nbody_simulation_tpu" in page

    engine.stop()
    viewer.stop()

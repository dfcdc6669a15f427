"""Native snapshot queue + engine pipeline (reference src/main.rs:101-184)."""

import threading
import time

import numpy as np
import pytest

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.models.world import World
from nbody_simulation_tpu.runtime.engine import Engine, Snapshot
from nbody_simulation_tpu.runtime.queue import SnapshotQueue
from nbody_simulation_tpu.utils.telemetry import Counting


@pytest.fixture(params=["native", "python"])
def queue_impl(request):
    return request.param == "python"


def test_queue_native_lib_builds():
    q = SnapshotQueue(2, 1024)
    assert q.native, "g++ toolchain should be available in this image"


def test_lossy_push_semantics(queue_impl):
    q = SnapshotQueue(2, 64, force_python=queue_impl)
    assert q.try_push(b"a")
    assert q.try_push(b"b")
    assert not q.try_push(b"c")  # full → dropped, like flume try_send
    assert q.dropped == 1
    assert q.pop(0.1) == b"a"    # FIFO
    assert q.try_push(b"d")
    assert q.pop(0.1) == b"b"
    assert q.pop(0.1) == b"d"
    assert q.pop(0.05) is None   # timeout


def test_oversized_payload_dropped(queue_impl):
    q = SnapshotQueue(2, 8, force_python=queue_impl)
    assert not q.try_push(b"x" * 9)


def test_blocking_pop_wakes_on_push(queue_impl):
    q = SnapshotQueue(2, 64, force_python=queue_impl)
    got = []

    def consumer():
        got.append(q.pop(5.0))

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    q.try_push(b"hello")
    t.join(timeout=5)
    assert got == [b"hello"]


def test_close_unblocks_consumer(queue_impl):
    q = SnapshotQueue(2, 64, force_python=queue_impl)
    t = threading.Thread(target=lambda: q.pop(None))
    t.start()
    time.sleep(0.05)
    q.close()
    t.join(timeout=5)
    assert not t.is_alive()


def test_snapshot_roundtrip():
    frame = np.arange(5 * 4 * 4, dtype=np.uint8).reshape(5, 4, 4)
    s = Snapshot(42, Counting(1.5, 2.5, 3.5), frame)
    r = Snapshot.unpack(s.pack())
    assert r.step == 42
    assert r.counting.sum_gravity == 2.5
    assert r.pos is None
    np.testing.assert_array_equal(r.frame, frame)
    # With particle positions riding along (recording mode).
    pos = np.arange(14, dtype=np.float32).reshape(7, 2)
    r2 = Snapshot.unpack(Snapshot(7, Counting(), frame, pos).pack())
    np.testing.assert_array_equal(r2.pos, pos)
    np.testing.assert_array_equal(r2.frame, frame)


def test_engine_end_to_end():
    cfg = SimConfig(force_path="direct", render_size=100)
    world = World(uniform_disc(256, seed=1), cfg)
    eng = Engine(world)
    eng.start(max_steps=50)
    snaps = []
    while True:
        s = eng.next_snapshot(timeout=30.0)
        if s is None:
            break
        snaps.append(s)
    eng.stop()
    assert world.updates == 50
    assert len(snaps) >= 1
    steps = [s.step for s in snaps]
    assert steps == sorted(steps)
    assert snaps[-1].frame.shape == (100, 100, 4)
    assert snaps[-1].frame[..., 3].max() > 0  # something was drawn


def test_engine_energy_meter():
    """EnergyMeter on the on_batch hook: cadence sampling, drift vs the
    first sample, and the last sample equal to a direct total_energy
    evaluation of the final state."""
    from nbody_simulation_tpu.ops.energy import total_energy
    from nbody_simulation_tpu.utils.telemetry import EnergyMeter
    cfg = SimConfig(force_path="direct", render_size=50, dt=1e-4)
    world = World(uniform_disc(256, seed=1), cfg)
    lines = []
    meter = EnergyMeter(10, emit=lines.append)
    eng = Engine(world, steps_per_snapshot=10, on_batch=meter)
    eng.start(max_steps=40)
    eng.join(timeout=60)
    eng.stop()
    assert world.updates == 40
    steps = [s for s, _ in meter.samples]
    assert steps and steps == sorted(steps)
    assert all(b - a >= 10 for a, b in zip(steps, steps[1:])), steps
    energies = np.array([e for _, e in meter.samples])
    assert np.isfinite(energies).all()
    assert meter.e0 is not None
    # Last sample lands on the final batch boundary == final state.
    assert meter.samples[-1][0] == 40
    np.testing.assert_allclose(
        meter.samples[-1][1], float(total_energy(world.state)), rtol=1e-5)
    # Tiny dt → near-conserved under the conservative counterpart law.
    drift = np.abs(energies - meter.e0) / abs(meter.e0)
    assert drift.max() < 1e-2, drift
    assert lines and lines[0].startswith("energy: step ")


def test_engine_drops_when_consumer_slow():
    cfg = SimConfig(force_path="direct", render_size=50)
    world = World(uniform_disc(256, seed=1), cfg)
    eng = Engine(world, snapshot_interval=0.0)  # flume-style: every step
    eng.start(max_steps=200)
    eng.join(timeout=60)  # no consumer at all while the producer runs
    # 200 steps but queue depth 2 and no consumer → 2 snapshots kept during
    # the run (the rest skipped without blocking physics, flume semantics)
    # plus the end-state push at shutdown, which evicts the oldest.
    assert world.updates == 200
    assert eng.queue.pushed == 3
    drained = []
    while True:
        s = eng.next_snapshot(timeout=1.0)
        if s is None:
            break
        drained.append(s.step)
    eng.stop()
    assert len(drained) == 2
    assert drained[-1] == 200, drained


def test_engine_final_snapshot_is_end_state():
    """A bounded run's LAST popped snapshot reflects the final step — the
    producer pushes the end state on clean exit (the lossy cadence alone
    can miss it entirely on fast runs)."""
    w = World(uniform_disc(512, seed=3),
              SimConfig(force_path="direct", render_size=64))
    eng = Engine(w, steps_per_snapshot=10, snapshot_interval=10.0)
    eng.start(max_steps=40)
    last = None
    while True:
        s = eng.next_snapshot(timeout=5.0)
        if s is None:
            break
        last = s
    eng.join(); eng.stop()
    assert last is not None
    assert last.step == 40, last.step


def test_engine_final_snapshot_wins_over_full_queue():
    """Even with no consumer (queue full at exit), the end state replaces
    the oldest queued frame."""
    w = World(uniform_disc(512, seed=3),
              SimConfig(force_path="direct", render_size=64))
    eng = Engine(w, queue_depth=2, steps_per_snapshot=5,
                 snapshot_interval=0.0)
    eng.start(max_steps=30)
    eng.join(timeout=60)
    last = None
    while True:
        s = eng.next_snapshot(timeout=1.0)
        if s is None:
            break
        last = s
    eng.stop()
    assert last is not None and last.step == 30, last and last.step


def test_engine_live_render_size_reconfigure():
    """The reference handles window resize (src/main.rs:176-181); the
    engine's equivalent: reconfigure(render_size=...) rebuilds the snapshot
    queue at a batch boundary and subsequent frames come out at the new
    size, with the consumer (re-reading engine.queue per pop) never stuck
    on the retired queue."""
    cfg = SimConfig(force_path="direct", render_size=100)
    world = World(uniform_disc(256, seed=1), cfg)
    eng = Engine(world, snapshot_interval=0.0)
    eng.start(max_steps=4000)
    first = eng.next_snapshot(timeout=30.0)
    assert first is not None and first.frame.shape == (100, 100, 4)
    eng.reconfigure(render_size=64)
    shapes = []
    for _ in range(400):
        s = eng.next_snapshot(timeout=30.0)
        if s is None:
            break
        shapes.append(s.frame.shape[0])
        if shapes[-1] == 64:
            break
    eng.stop()
    assert shapes and shapes[-1] == 64, shapes
    # cumulative drop accounting survives the queue swap
    assert eng.dropped >= 0

"""Distributed runtime parity (runtime/distributed.py, run_multihost.py):
the Engine stack — snapshot queue, Counting/fps/ups telemetry, viewer
surface, checkpoint round-trip — over a sharded state on the virtual
8-device mesh."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.parallel import distribute_state, make_1d_mesh
from nbody_simulation_tpu.runtime.distributed import (DistributedEngine,
                                                      DistributedWorld)

REPO = Path(__file__).resolve().parent.parent


def dcfg(**kw):
    return SimConfig(force_path="bh", theta=50.0, render_size=128, **kw)


def make_world(n=4 * 512, nd=4, rebalance_every=0, seed=31):
    mesh = make_1d_mesh(nd)
    cfg = dcfg()
    ds = distribute_state(uniform_disc(n, seed=seed), mesh, cfg)
    return DistributedWorld(ds, mesh, cfg, rebalance_every=rebalance_every)


def test_distributed_engine_end_to_end():
    """Steps, lossy snapshot queue, sharded-rendered frames, end-state push,
    profile-mode Counting — the single-chip Engine contract, distributed."""
    w = make_world()
    eng = DistributedEngine(w, snapshot_interval=0.0, steps_per_snapshot=2,
                            profile_every=2)
    eng.start(max_steps=10)
    snaps = []
    while True:
        s = eng.next_snapshot(timeout=60.0)
        if s is None:
            break
        snaps.append(s)
    eng.stop()
    assert w.updates == 10
    assert snaps and snaps[-1].step == 10
    assert snaps[-1].frame.shape == (128, 128, 4)
    assert snaps[-1].frame[..., 3].max() > 0          # frame is lit
    assert [s.step for s in snaps] == sorted(s.step for s in snaps)
    # profile mode attributed at least one synced step to sum_gravity
    assert snaps[-1].counting.sum_gravity > 0


def test_distributed_engine_energy_meter():
    """EnergyMeter detects the mesh and runs the psum'd sharded sweep; its
    value must match the single-chip total_energy on the replicated state."""
    from nbody_simulation_tpu.ops.energy import total_energy
    from nbody_simulation_tpu.state import ParticleState
    from nbody_simulation_tpu.utils.telemetry import EnergyMeter
    w = make_world()
    meter = EnergyMeter(4, emit=lambda *_: None)
    eng = DistributedEngine(w, steps_per_snapshot=2, on_batch=meter)
    eng.start(max_steps=8)
    eng.join(timeout=120)
    eng.stop()
    assert w.updates == 8
    assert meter.samples and np.isfinite([e for _, e in meter.samples]).all()
    # Same code path the meter used, on the FINAL state, vs the single-chip
    # evaluation of the replicated arrays (padding is inert in both).
    from nbody_simulation_tpu.parallel.sharded_step import sharded_total_energy
    e_sh = float(sharded_total_energy(w.state, w.mesh)["total_energy"])
    single = float(total_energy(
        ParticleState(np.asarray(w.state.pos), np.asarray(w.state.vel),
                      np.asarray(w.state.mass))))
    np.testing.assert_allclose(e_sh, single, rtol=1e-4)


def test_distributed_world_rebalance_and_reconfigure():
    w = make_world(rebalance_every=3)
    total0 = None
    w.run(7)   # crosses two rebalance boundaries
    d = w.diagnostics()
    total0 = float(d["total_mass"])
    assert int(np.asarray(d["n_live"])) == 4 * 512
    w.reconfigure(theta=25.0, dt=0.05)
    assert w.config.theta == 25.0
    w.run(2)
    w.assert_finite()
    np.testing.assert_allclose(float(w.diagnostics()["total_mass"]), total0,
                               rtol=1e-6)


def test_distributed_checkpoint_roundtrip(tmp_path):
    from nbody_simulation_tpu.runtime.distributed import (
        load_distributed_checkpoint, save_distributed_checkpoint)

    w = make_world(n=1000, nd=4)
    w.run(3)
    path = tmp_path / "ck.npz"
    save_distributed_checkpoint(path, w)
    # Resume onto a DIFFERENT mesh size: canonical format is layout-free.
    mesh8 = make_1d_mesh(8)
    state, step = load_distributed_checkpoint(path, mesh8, dcfg())
    assert step == 3 and state.distributed
    mass = np.asarray(state.mass)
    assert int((mass > 0).sum()) == 1000
    # The live particles are identical (same set, same global Morton order).
    np.testing.assert_array_equal(
        np.asarray(state.compact().pos), np.asarray(w.state.compact().pos))
    # And the resumed world steps fine.
    w8 = DistributedWorld(state, mesh8, dcfg())
    w8.run(1)
    w8.assert_finite()


def test_run_py_checkpoint_refuses_distributed_state():
    """run.py --checkpoint uses real_slice(), which now fails loudly on a
    distributed layout instead of silently saving interleaved padding."""
    import pytest

    mesh = make_1d_mesh(4)
    ds = distribute_state(uniform_disc(256, seed=1), mesh, dcfg())
    with pytest.raises(ValueError, match="distributed"):
        ds.real_slice()


def test_multihost_cli_frames_telemetry_checkpoint(tmp_path):
    """The full distributed CLI on one process × 8 virtual devices: frames
    written, fps/ups telemetry printed, checkpoint written and resumable."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    ck = tmp_path / "run.npz"
    out = tmp_path / "frames"
    base = [sys.executable, "-m", "nbody_simulation_tpu.run_multihost",
            "--scenario", "uniform", "--n", "2048",
            "--cpu-devices", "8", "--rebalance-every", "0",
            "--snapshot-every", "2"]
    r = subprocess.run(
        base + ["--steps", "6", "--out", str(out), "--checkpoint", str(ck)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "len: 2048" in r.stdout
    assert "done: 6 steps" in r.stdout
    assert "ups:" in r.stdout and "step:" in r.stdout   # RateMeter telemetry
    assert ck.exists()
    frames = sorted(out.glob("frame_*.png"))
    assert frames, r.stdout
    r2 = subprocess.run(
        base + ["--steps", "2", "--resume", str(ck)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "done: 2 steps" in r2.stdout


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Sharded checkpoint: per-process shard files + manifest; loadable
    onto a different mesh size with bitwise-identical live particles, and
    no step ever materializes global N on one host (each writer saves only
    its addressable rows; each reader loads only its slice)."""
    from nbody_simulation_tpu.utils.checkpoint import (
        load_sharded_checkpoint, save_sharded_checkpoint)

    w = make_world(n=1500, nd=8, seed=33)
    w.run(2)
    ckdir = tmp_path / "sharded_ck"
    save_sharded_checkpoint(ckdir, w.state, w.updates)
    assert (ckdir / "manifest.json").exists()
    assert (ckdir / "shard_00000.npz").exists()

    mesh4 = make_1d_mesh(4)
    state, step = load_sharded_checkpoint(ckdir, mesh4, dcfg())
    assert step == 2 and state.distributed
    np.testing.assert_array_equal(
        np.asarray(state.compact().pos), np.asarray(w.state.compact().pos))
    np.testing.assert_array_equal(
        np.asarray(state.compact().vel), np.asarray(w.state.compact().vel))
    w4 = DistributedWorld(state, mesh4, dcfg())
    w4.run(1)
    w4.assert_finite()


def test_sharded_recording_roundtrip(tmp_path):
    """Sharded recording: per-process delta streams + manifest reassemble
    the exact global padded layout at every cadence point, with no process
    materializing full N (here: 1 process × 8 devices, the same
    addressable-shards path a real multi-process run takes)."""
    from nbody_simulation_tpu.utils.recording import (ShardedRecorder,
                                                      playback_sharded)

    w = make_world(n=1024, nd=8, seed=7)
    rec = ShardedRecorder(tmp_path / "rec", every=2)
    history = {}
    for i in range(1, 7):
        w.step()
        if rec.maybe_record(w.state, w.updates):
            history[w.updates] = np.asarray(w.state.pos).copy()
    rec.close()
    assert rec.frames == 3          # steps 2, 4, 6
    assert (tmp_path / "rec" / "manifest.json").exists()
    got = dict(playback_sharded(tmp_path / "rec"))
    assert sorted(got) == sorted(history)
    for step, want in history.items():
        # first frame is absolute (bitwise); later frames accumulate one
        # f32 rounding per delta-add — bound well under a pixel (80 world
        # units) at world scale 1e5.
        np.testing.assert_allclose(got[step], want, atol=0.1)

    # Offline renderer consumes the sharded directory directly.
    from nbody_simulation_tpu.render_recording import main as render_main
    out = tmp_path / "frames"
    assert render_main([str(tmp_path / "rec"), "--out", str(out),
                        "--render-size", "64", "--quiet"]) == 0
    pngs = sorted(out.glob("frame_*.png"))
    assert len(pngs) == 3
    from PIL import Image
    arr = np.asarray(Image.open(pngs[-1]))
    assert arr.shape == (64, 64, 4) and arr[..., 3].max() > 0


def test_sharded_recording_engine_and_catchup(tmp_path):
    """ShardedRecorder through the Engine on_batch hook: batch boundaries
    coarser than `every` still record (catch-up semantics), and the stream
    plays back in lockstep."""
    from nbody_simulation_tpu.utils.recording import (ShardedRecorder,
                                                      playback_sharded)

    w = make_world(n=512, nd=4, seed=9)
    rec = ShardedRecorder(tmp_path / "rec", every=2)
    eng = DistributedEngine(
        w, snapshot_interval=0.0, steps_per_snapshot=3,
        on_batch=lambda world: rec.maybe_record(world.state, world.updates))
    eng.start(max_steps=9)
    while eng.next_snapshot(timeout=60.0) is not None:
        pass
    eng.stop()
    rec.close()
    # Batches end at steps 3, 6, 9; the first call (step 3) anchors the
    # cadence at the next multiple of 2 (step 4), caught up at batch end 6
    # (next due 8, caught up at 9) → frames at 6 and 9.
    assert rec.frames == 2
    steps = [s for s, _ in playback_sharded(tmp_path / "rec")]
    assert steps == [6, 9]


def test_multihost_cli_sharded_checkpoint(tmp_path):
    """CLI --checkpoint-sharded / --resume-sharded round-trip."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    ck = tmp_path / "shards"
    base = [sys.executable, "-m", "nbody_simulation_tpu.run_multihost",
            "--scenario", "uniform", "--n", "1024", "--cpu-devices", "4",
            "--rebalance-every", "0"]
    r = subprocess.run(base + ["--steps", "3",
                               "--checkpoint-sharded", str(ck)],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "sharded checkpoint:" in r.stdout
    r2 = subprocess.run(base + ["--steps", "1", "--resume-sharded", str(ck)],
                        cwd=REPO, env=env, capture_output=True, text=True,
                        timeout=600)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "len: 1024" in r2.stdout and "done: 1 steps" in r2.stdout

def test_step_closures_cached_across_seam_changes():
    """A rebalance that flips the seam-adjacency set between two
    already-seen matchings must swap to the already-compiled step program,
    not recompile (minutes over the serial TPU tunnel at flagship scale).
    make_distributed_bh_step memoizes its jitted pair on
    (mesh, config, axis, extra_pairs); this alternates two adjacency sets
    and asserts no retrace via the jit cache sizes."""
    from nbody_simulation_tpu.parallel.bh_distributed import (
        _step_fns, make_distributed_bh_step)
    from nbody_simulation_tpu.parallel.mesh import AXIS

    mesh = make_1d_mesh(8)
    cfg = dcfg().replace(theta=0.5)
    ds = distribute_state(uniform_disc(8 * 256, seed=5), mesh, cfg)
    e1 = ()
    e2 = (((0, 2), (2, 0), (5, 7), (7, 5)),)

    _step_fns.cache_clear()
    s_a = make_distributed_bh_step(mesh, cfg, extra_pairs=e1)
    ds = s_a(ds)        # counter=0 → resort variant compiles
    ds = s_a(ds)        # counter=1 → stale variant compiles
    s_b = make_distributed_bh_step(mesh, cfg, extra_pairs=e2)
    ds = s_b(ds)
    # Flip BACK to e1 (what a rebalance alternating between two seam sets
    # does): must be a cache hit, and running it must not add a compile.
    s_c = make_distributed_bh_step(mesh, cfg, extra_pairs=e1)
    info = _step_fns.cache_info()
    assert info.misses == 2 and info.hits == 1, info
    resort1, stale1 = _step_fns(mesh, cfg, AXIS, e1)
    sizes_before = (resort1._cache_size(), stale1._cache_size())
    ds = s_c(ds)        # fresh closure, counter=0 → the resort variant
    ds = s_c(ds)        # counter=1 → the stale variant
    assert (resort1._cache_size(), stale1._cache_size()) == sizes_before
    assert np.isfinite(np.asarray(ds.pos)).all()
    # Distinct closures over the same cached pair never share cadence state.
    s_c.reset()
    assert s_a is not s_c


def test_multiprocess_snapshot_gate_is_deterministic():
    """In a multi-process run _render_snapshot is a mesh collective, so the
    snapshot decision must not depend on per-process state (queue fullness,
    wall clock). With _multiprocess forced, the gate is a pure function of
    the batch boundary."""
    w = make_world()
    eng = DistributedEngine(w, steps_per_snapshot=4)
    assert eng._multiprocess is False      # single-process here
    eng._multiprocess = True
    # ACTUALLY fill the queue: the deterministic gate must say render even
    # when the local lossy gate (queue fullness) would say skip.
    while not eng.queue.is_full():
        eng.queue.try_push(b"x" * 16)
    assert eng._snapshot_due(0.0, paused=False) is True
    assert eng._snapshot_due(1e9, paused=False) is True
    assert eng._snapshot_due(0.0, paused=True) is False
    while eng.queue.pop(0.0) is not None:  # drain for the local-gate check
        pass
    eng._multiprocess = False
    eng._last_snap_t = 0.0
    eng.snapshot_interval = 1e9
    assert eng._snapshot_due(1.0, paused=False) is False  # local gate back

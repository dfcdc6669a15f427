"""Checkpoint, recording, PNG IO, CLI shell."""

import subprocess
import sys
from pathlib import Path

import numpy as np

from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.utils.checkpoint import (load_checkpoint,
                                                   save_checkpoint)
from nbody_simulation_tpu.utils.pngio import save_png
from nbody_simulation_tpu.utils.recording import Recorder, playback


def test_checkpoint_roundtrip(tmp_path):
    st = uniform_disc(300, seed=4)
    p = tmp_path / "ck.npz"
    save_checkpoint(p, st, step=1234)
    st2, step = load_checkpoint(p)
    assert step == 1234
    assert st2.n_real == 300
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st2.pos))
    np.testing.assert_array_equal(np.asarray(st.vel), np.asarray(st2.vel))
    np.testing.assert_array_equal(np.asarray(st.mass), np.asarray(st2.mass))


def test_recording_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 1e5, (500, 2)).astype(np.float32)
    rec = Recorder(tmp_path / "rec.bin", every=10)
    history = {}
    rec.maybe_record(pos, 0)  # first frame is ABSOLUTE → self-contained
    history[0] = pos.copy()
    cur = pos
    for step in range(1, 31):
        cur = cur + rng.normal(0, 0.1, cur.shape).astype(np.float32)
        if rec.maybe_record(cur, step):
            history[step] = cur.copy()
    rec.close()
    assert rec.frames == 4  # steps 0, 10, 20, 30
    assert rec.comp_bytes < rec.raw_bytes
    # Self-contained playback: no initial state needed.
    steps_seen = []
    for step, rpos in playback(tmp_path / "rec.bin"):
        steps_seen.append(step)
        np.testing.assert_allclose(rpos, history[step], atol=1e-4)
    assert steps_seen == [0, 10, 20, 30]


def test_png_roundtrip(tmp_path):
    frame = np.random.default_rng(0).integers(
        0, 255, (32, 16, 4)).astype(np.uint8)
    p = tmp_path / "f.png"
    save_png(p, frame)
    from PIL import Image
    back = np.asarray(Image.open(p).convert("RGBA"))
    np.testing.assert_array_equal(back, frame)


def test_cli_end_to_end(tmp_path):
    out = tmp_path / "frames"
    ck = tmp_path / "ck.npz"
    cmd = [sys.executable, "-m", "nbody_simulation_tpu.run",
           "--scenario", "uniform", "--n", "256", "--steps", "5",
           "--platform", "cpu",
           "--force-path", "direct", "--render-size", "64",
           "--out", str(out), "--checkpoint", str(ck),
           "--record", str(tmp_path / "rec.bin")]
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    import os
    env.update({k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS",)})
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                       env=env, cwd=str(Path(__file__).parent.parent))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "len: 256" in r.stdout
    assert list(out.glob("frame_*.png")), r.stdout
    assert ck.exists()

    # Resume from the checkpoint.
    r2 = subprocess.run(
        [sys.executable, "-m", "nbody_simulation_tpu.run", "--resume",
         str(ck), "--steps", "3", "--force-path", "direct",
         "--platform", "cpu",
         "--render-size", "64", "--out", str(out)],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(Path(__file__).parent.parent))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "done: 3 steps" in r2.stdout


def test_cli_gif_output(tmp_path):
    gif = tmp_path / "out.gif"
    cmd = [sys.executable, "-m", "nbody_simulation_tpu.run",
           "--scenario", "uniform", "--n", "256", "--steps", "12",
           "--platform", "cpu", "--force-path", "direct",
           "--render-size", "48", "--out", "", "--gif", str(gif),
           "--steps-per-snapshot", "3", "--snapshot-interval", "0"]
    import os
    env = dict(os.environ)
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                       env=env, cwd=str(Path(__file__).parent.parent))
    assert r.returncode == 0, r.stderr[-1500:]
    assert gif.exists()
    assert gif.read_bytes()[:6] in (b"GIF87a", b"GIF89a")

def test_render_recording_cli(tmp_path):
    """run.py --record → render_recording renders self-contained PNGs;
    --state restores masses for the heavy-green rule."""
    import os

    out = tmp_path / "frames"
    ck = tmp_path / "ck.npz"
    rec = tmp_path / "rec.bin"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cwd = str(Path(__file__).parent.parent)
    r = subprocess.run(
        [sys.executable, "-m", "nbody_simulation_tpu.run",
         "--scenario", "uniform", "--n", "256", "--steps", "5",
         "--platform", "cpu", "--force-path", "direct",
         "--render-size", "64", "--checkpoint", str(ck),
         "--record", str(rec)],
        capture_output=True, text=True, timeout=300, env=env, cwd=cwd)
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "nbody_simulation_tpu.render_recording",
         str(rec), "--out", str(out), "--render-size", "64",
         "--state", str(ck)],
        capture_output=True, text=True, timeout=300, env=env, cwd=cwd)
    assert r2.returncode == 0, r2.stderr[-2000:]
    pngs = sorted(out.glob("frame_*.png"))
    assert pngs, r2.stdout
    from PIL import Image
    arr = np.asarray(Image.open(pngs[-1]))
    assert arr.shape == (64, 64, 4) and arr[..., 3].max() > 0

def test_playback_legacy_headerless_requires_initial(tmp_path):
    """Headerless (pre-v1) streams must refuse self-contained playback
    instead of decoding the first delta as absolute garbage; with the
    external initial state they still replay exactly."""
    import pytest
    from nbody_simulation_tpu.utils.recording import _REC_MAGIC

    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 1e5, (64, 2)).astype(np.float32)
    rec = Recorder(tmp_path / "v1.bin", every=1)
    rec.maybe_record(pos, 0)
    pos2 = pos + 1.0
    rec.maybe_record(pos2, 1)
    rec.close()
    data = (tmp_path / "v1.bin").read_bytes()
    assert data.startswith(_REC_MAGIC)
    # Strip the magic + the absolute first frame to fabricate a legacy
    # stream (first frame = delta from an external initial state).
    import struct
    hdr = struct.Struct("<QII")
    off = len(_REC_MAGIC)
    _, _, comp_len = hdr.unpack(data[off:off + hdr.size])
    legacy = data[off + hdr.size + comp_len:]
    (tmp_path / "legacy.bin").write_bytes(legacy)
    with pytest.raises(ValueError, match="legacy"):
        next(playback(tmp_path / "legacy.bin"))
    step, got = next(playback(tmp_path / "legacy.bin", pos))
    assert step == 1
    np.testing.assert_allclose(got, pos2, atol=1e-4)


def test_render_recording_refuses_state_for_sharded(tmp_path):
    """--state rows cannot be mapped onto a sharded recording's padded
    device layout — the renderer must refuse, not mis-tint silently."""
    import json

    import pytest
    from nbody_simulation_tpu.render_recording import main as render_main

    recdir = tmp_path / "rec"
    recdir.mkdir()
    (recdir / "manifest.json").write_text(json.dumps(
        {"version": 1, "every": 1, "n_processes": 1, "n_rows": 4,
         "spans": [[[0, 4]]]}))
    ck = tmp_path / "ck.npz"
    save_checkpoint(ck, uniform_disc(4, seed=0), step=0)
    with pytest.raises(SystemExit, match="sharded"):
        render_main([str(recdir), "--out", str(tmp_path / "f"),
                     "--state", str(ck), "--quiet"])

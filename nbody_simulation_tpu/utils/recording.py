"""Position-delta recording with zstd compression.

The reference carries a vestigial, commented-out sketch of this (reference
src/main.rs:119-134): every 10 steps, transmute the per-step position deltas
to bytes and zstd-compress them at level 22, printing raw vs compressed
sizes. This module is the working version of that idea: a Recorder keeps the
previous positions, emits delta frames (f32 pos - prev), compresses, and can
play the stream back exactly.

Falls back to zlib when the zstandard module is unavailable.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

try:
    import zstandard as _zstd

    def _compress(b: bytes, level: int) -> bytes:
        return _zstd.ZstdCompressor(level=min(level, 22)).compress(b)

    def _decompress(b: bytes) -> bytes:
        return _zstd.ZstdDecompressor().decompress(b)

    CODEC = "zstd"
except ImportError:  # pragma: no cover
    import zlib

    def _compress(b: bytes, level: int) -> bytes:
        return zlib.compress(b, min(level, 9))

    def _decompress(b: bytes) -> bytes:
        return zlib.decompress(b)

    CODEC = "zlib"

_FRAME_HDR = struct.Struct("<QII")  # step, raw_len, comp_len
# File magic + version. v1 semantics: the first frame is ABSOLUTE (delta
# from zeros) so the stream is self-contained. Headerless files are the
# pre-v1 legacy format whose first frame was a delta from an EXTERNAL
# initial state — playback requires initial_pos for those.
_REC_MAGIC = b"NBREC\x00\x00\x01"


class Recorder:
    """Streams zstd-compressed position-delta frames to a file."""

    def __init__(self, path: str | Path, every: int = 10, level: int = 22):
        self.path = Path(path)
        self.every = every
        self.level = level
        self._prev: np.ndarray | None = None
        self._f = open(self.path, "wb")
        self._f.write(_REC_MAGIC)
        self.frames = 0
        self.raw_bytes = 0
        self.comp_bytes = 0

    def maybe_record(self, pos: np.ndarray, step: int) -> bool:
        """Record a delta frame if step % every == 0 (src/main.rs:125).

        The FIRST call writes the positions as an absolute frame (delta
        from zeros), so the recording is self-contained: ``playback`` needs
        no separate initial state."""
        pos = np.asarray(pos, np.float32)
        if self._prev is None or step % self.every == 0:
            self.record(pos, step)
            return True
        return False

    def record(self, pos: np.ndarray, step: int) -> None:
        """Unconditionally write one delta frame (cadence handled by the
        caller). With no prior frame the delta is taken from zeros, i.e. an
        absolute frame — playback then starts from ``np.zeros``."""
        pos = np.asarray(pos, np.float32)
        if self._prev is None:
            self._prev = np.zeros_like(pos)
        delta = pos - self._prev
        self._prev = pos.copy()
        raw = delta.tobytes()
        comp = _compress(raw, self.level)
        self._f.write(_FRAME_HDR.pack(step, len(raw), len(comp)))
        self._f.write(comp)
        self.frames += 1
        self.raw_bytes += len(raw)
        self.comp_bytes += len(comp)

    def close(self) -> None:
        self._f.close()


def playback(path: str | Path, initial_pos: np.ndarray | None = None):
    """Yields (step, positions) reconstructed from a recording.

    v1 streams (``NBREC`` magic) are self-contained — the first frame is
    absolute and ``initial_pos`` is not needed. Headerless legacy streams
    REQUIRE ``initial_pos`` (their first frame is a delta from the run's
    initial state); passing None for one raises instead of silently
    decoding garbage."""
    pos = (None if initial_pos is None
           else np.asarray(initial_pos, np.float32).copy())
    with open(path, "rb") as f:
        head = f.read(len(_REC_MAGIC))
        if head != _REC_MAGIC:
            if pos is None:
                raise ValueError(
                    f"{path}: headerless (legacy) recording — its first "
                    "frame is a delta from an external initial state; "
                    "pass initial_pos")
            f.seek(0)
        while True:
            hdr = f.read(_FRAME_HDR.size)
            if not hdr:
                return
            step, raw_len, comp_len = _FRAME_HDR.unpack(hdr)
            delta = np.frombuffer(_decompress(f.read(comp_len)),
                                  np.float32).reshape(
                                      (-1, 2) if pos is None else pos.shape)
            pos = delta if pos is None else pos + delta
            yield step, pos.copy()


# --- sharded recording (distributed runs, no full-N on any process) --------
#
# The single-chip path ships positions through snapshots (Engine
# include_particles); on a device mesh that would move full N through every
# snapshot, so recording goes per-process instead, mirroring the sharded
# checkpoints (utils/checkpoint.py): each process streams ONLY its
# addressable rows to its own file, and a small manifest records every
# process's global row spans so one analysis host can reassemble exact
# global frames offline.

import json

SHARDED_REC_VERSION = 1


class ShardedRecorder:
    """Per-process position-delta recording of a device-sharded state.

    ``path`` is a directory: this process writes ``rec_{pid:05d}.bin`` (the
    same delta-frame stream as ``Recorder``, covering its local shards in
    device-major order, padding rows included — they sit still and compress
    to ~nothing), and process 0 writes ``manifest.json`` with every
    process's global row spans. The FIRST frame each process writes is
    absolute (delta from zeros), so ``playback_sharded`` needs no separate
    initial state. Cadence is ``step % every == 0`` checked with >= catch-up
    semantics (``maybe_record`` may be called at batch boundaries coarser
    than ``every``). Per-process memory/IO is O(N / num_processes).
    """

    def __init__(self, path: str | Path, every: int = 10, level: int = 22):
        import jax
        self.dir = Path(path)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.pid = jax.process_index()
        self.every = max(1, every)
        self._next_due: int | None = None  # set from the first call's step
        self._rec = Recorder(self.dir / f"rec_{self.pid:05d}.bin",
                             every=every, level=level)
        self._manifest_done = False

    def _local_block(self, arr) -> tuple[np.ndarray, list[tuple[int, int]]]:
        # THE per-process readback convention, shared with sharded
        # checkpoints (parallel/multihost.local_block).
        from nbody_simulation_tpu.parallel.multihost import local_block
        return local_block(arr)

    def _write_manifest(self, state, spans) -> None:
        import jax
        nproc = jax.process_count()
        if nproc == 1:
            all_spans = [spans]
        else:
            from jax.experimental import multihost_utils
            mine = np.asarray(spans, np.int64)
            gathered = np.asarray(multihost_utils.process_allgather(mine))
            all_spans = [[(int(a), int(b)) for a, b in proc]
                         for proc in gathered.reshape(nproc, -1, 2)]
        if self.pid == 0:
            man = {"version": SHARDED_REC_VERSION, "every": self.every,
                   "n_processes": nproc, "n_rows": int(state.pos.shape[0]),
                   "spans": all_spans}
            tmp = self.dir / "manifest.json.tmp"
            tmp.write_text(json.dumps(man))
            import os
            os.replace(tmp, self.dir / "manifest.json")
        self._manifest_done = True

    def maybe_record(self, state, step: int) -> bool:
        """Record this process's local rows if a cadence point (a multiple
        of ``every``) was reached since the last call. ``state`` is a
        distributed ParticleState."""
        if self._next_due is None:  # first call anchors the cadence
            self._next_due = -(-step // self.every) * self.every
        if step < self._next_due:
            return False
        block, spans = self._local_block(state.pos)
        if not self._manifest_done:
            self._write_manifest(state, spans)
        self._rec.record(block, step)
        self._next_due = (step // self.every + 1) * self.every
        return True

    @property
    def frames(self) -> int:
        return self._rec.frames

    @property
    def raw_bytes(self) -> int:
        return self._rec.raw_bytes

    @property
    def comp_bytes(self) -> int:
        return self._rec.comp_bytes

    def close(self) -> None:
        self._rec.close()


def playback_sharded(path: str | Path):
    """Yields (step, global padded positions) from a sharded recording.

    Reads every process's stream in lockstep (all processes record at the
    same cadence points) and scatters each block into the global row order
    via the manifest spans. Rows are the PADDED device-major layout of the
    distributed state — filter live particles with the run's masses (e.g.
    from a checkpoint) if needed; padding rows sit at PAD_POS.
    """
    path = Path(path)
    man = json.loads((path / "manifest.json").read_text())
    if man["version"] != SHARDED_REC_VERSION:
        raise ValueError(f"unsupported recording version {man['version']}")
    spans = man["spans"]
    n_rows = man["n_rows"]
    streams = []
    for pid in range(man["n_processes"]):
        rows = sum(hi - lo for lo, hi in spans[pid])
        streams.append(playback(path / f"rec_{pid:05d}.bin",
                                np.zeros((rows, 2), np.float32)))
    for frames in zip(*streams):
        step = frames[0][0]
        out = np.zeros((n_rows, 2), np.float32)
        for (fstep, block), proc_spans in zip(frames, spans):
            assert fstep == step, "per-process streams out of lockstep"
            off = 0
            for lo, hi in proc_spans:
                out[lo:hi] = block[off:off + hi - lo]
                off += hi - lo
        yield step, out

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


class Recorder:
    """Streams zstd-compressed position-delta frames to a file."""

    def __init__(self, path: str | Path, every: int = 10, level: int = 22):
        self.path = Path(path)
        self.every = every
        self.level = level
        self._prev: np.ndarray | None = None
        self._f = open(self.path, "wb")
        self.frames = 0
        self.raw_bytes = 0
        self.comp_bytes = 0

    def maybe_record(self, pos: np.ndarray, step: int) -> bool:
        """Record a delta frame if step % every == 0 (src/main.rs:125)."""
        pos = np.asarray(pos, np.float32)
        if self._prev is None:
            self._prev = pos.copy()
            return False
        if step % self.every != 0:
            return False
        delta = pos - self._prev
        self._prev = pos.copy()
        raw = delta.tobytes()
        comp = _compress(raw, self.level)
        self._f.write(_FRAME_HDR.pack(step, len(raw), len(comp)))
        self._f.write(comp)
        self.frames += 1
        self.raw_bytes += len(raw)
        self.comp_bytes += len(comp)
        return True

    def close(self) -> None:
        self._f.close()


def playback(path: str | Path, initial_pos: np.ndarray):
    """Yields (step, positions) reconstructed from a recording."""
    pos = np.asarray(initial_pos, np.float32).copy()
    with open(path, "rb") as f:
        while True:
            hdr = f.read(_FRAME_HDR.size)
            if not hdr:
                return
            step, raw_len, comp_len = _FRAME_HDR.unpack(hdr)
            delta = np.frombuffer(_decompress(f.read(comp_len)),
                                  np.float32).reshape(pos.shape)
            pos = pos + delta
            yield step, pos.copy()

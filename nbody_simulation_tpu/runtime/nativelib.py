"""Shared on-demand builder for the native (C++) runtime pieces."""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
import threading
from pathlib import Path

_NATIVE_DIR = Path(__file__).parent / "native"
_lock = threading.Lock()
_cache: dict[str, ctypes.CDLL | None] = {}


def load_native(name: str) -> ctypes.CDLL | None:
    """Compile native/<name>.cpp (g++ -O3, content-hashed cache) and load it.
    Returns None when no toolchain is available — callers must fall back."""
    with _lock:
        if name in _cache:
            return _cache[name]
        src_path = _NATIVE_DIR / f"{name}.cpp"
        try:
            src = src_path.read_text()
            tag = hashlib.sha256(src.encode()).hexdigest()[:16]
            so = _NATIVE_DIR / f"lib{name}_{tag}.so"
            if not so.exists():
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-o", str(so), str(src_path)],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(str(so))
        except (OSError, subprocess.SubprocessError):
            lib = None
        _cache[name] = lib
        return lib

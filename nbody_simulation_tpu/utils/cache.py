"""Persistent XLA compilation cache.

TPU compiles are expensive (tens of seconds to minutes for the full BH step,
and far worse over a remote compile tunnel). The persistent cache makes every
compile once-per-machine instead of once-per-process: bench runs, the CLI,
and the test driver all reuse each other's executables.

Enabled automatically on package import unless NBODY_TPU_NO_CACHE is set.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/nbody_tpu_jax_cache")
_enabled = False


def enable_persistent_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("NBODY_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = path or os.environ.get("NBODY_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        pass  # older jax without these knobs — cache is best-effort

"""Hardware-only tests: run ON THE REAL TPU (no CPU forcing, no virtual mesh).

The main suite (tests/) pins JAX to a virtual 8-device CPU mesh — that is
CI. Everything here exercises code paths that only exist on real hardware
(Mosaic-compiled Pallas, aliased read-modify-write accumulators, approximate
VPU reciprocals) and SKIPS unless jax's default backend is a TPU:

    PYTHONPATH="/root/repo:$PYTHONPATH" python -m pytest tests_tpu/ -q

Keep shapes small: remote compiles are serial (CLAUDE.md) and each new
pallas shape costs a compile.
"""

import jax
import numpy as np
import pytest


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.startswith("tpu")
    except Exception:  # backend init failure == no hardware
        return False


collect_ignore: list[str] = []

requires_tpu = pytest.mark.skipif(
    not _on_tpu(), reason="requires a real TPU backend")


@pytest.fixture
def rng():
    return np.random.default_rng(0)

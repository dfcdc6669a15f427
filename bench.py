"""Headline benchmark: pairwise interactions/sec/chip, blocked Pallas kernel.

BASELINE.json config 4: N=1,048,576 all-pairs on a single chip. North-star
target ≥1e11 pairs/s (BASELINE.md) — vs_baseline is measured/1e11.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# The axon TPU tunnel has multi-hour outages in BOTH failure modes
# (observed round 3): jax.devices() raising "Unable to initialize backend
# 'axon': UNAVAILABLE", and jax.devices() HANGING at init. JAX caches a
# failed backend init for the process lifetime, so the raise mode retries
# by re-exec'ing; the hang mode is detected FIRST with a killable
# subprocess probe (a client stuck at *init* is safe to kill — unlike one
# mid-compile, which would wedge the serial tunnel queue).
_MAX_RETRIES = 20
_RETRY_WAIT_S = 30
_PROBE_ATTEMPTS = 240           # × (timeout+wait) ≈ up to ~12 h of outage
_PROBE_TIMEOUT_S = 180          # healthy init over the tunnel is ~20-40 s
_PROBE_WAIT_S = 60


def _wait_for_backend() -> None:
    """Block until a throwaway subprocess can complete jax.devices()."""
    import subprocess
    for k in range(_PROBE_ATTEMPTS):
        try:
            r = subprocess.run([sys.executable, "-c",
                                "import jax; jax.devices()"],
                               timeout=_PROBE_TIMEOUT_S,
                               capture_output=True)
            if r.returncode == 0:
                return
            msg = (r.stderr or b"").decode(errors="replace").strip()
            msg = msg.splitlines()[-1] if msg else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            msg = f"init hang (> {_PROBE_TIMEOUT_S}s)"
        print(f"bench: backend probe failed "
              f"({k + 1}/{_PROBE_ATTEMPTS}): {msg}",
              file=sys.stderr, flush=True)
        time.sleep(_PROBE_WAIT_S)
    # Fall through: let the real import surface the failure.


def _backend_or_retry() -> None:
    _wait_for_backend()
    import jax
    try:
        jax.devices()
    except RuntimeError as e:
        k = int(os.environ.get("NBODY_BENCH_RETRY", "0"))
        if k >= _MAX_RETRIES:
            raise
        print(f"bench: backend unavailable (retry {k + 1}/{_MAX_RETRIES}): "
              f"{e}", file=sys.stderr, flush=True)
        time.sleep(_RETRY_WAIT_S)
        os.environ["NBODY_BENCH_RETRY"] = str(k + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> None:
    _backend_or_retry()
    import jax
    import jax.numpy as jnp
    from nbody_simulation_tpu.ops.allpairs import allpairs_accel_sym

    on_tpu = jax.default_backend() == "tpu"
    n = 1_048_576 if on_tpu else 4_096
    reps = 3 if on_tpu else 1

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 1e5, (n, 2)).astype(np.float32))
    mass = jnp.asarray(rng.integers(1, 100, n).astype(np.float32))

    def run() -> float:
        t0 = time.perf_counter()
        # float(...) forces a host readback — block_until_ready does not
        # synchronize under the axon tunnel.
        # Symmetric third-law kernel (each unordered pair evaluated once,
        # applied to both particles): 3.55e11 pairs/s vs the ordered
        # kernel's 2.83e11 at this exact workload — the round-4 A/B table
        # is in docs/PERFORMANCE.md (benchmarks/probe_sym.py).
        # rcp="approx+clamp": raw VPU reciprocal with the is_normal mask
        # replaced by the 1-op L1 clamp — BITWISE-identical to "approx" on
        # finite inputs (tests/test_allpairs.py::test_clamp_guard_identity).
        # Quality vs the f64-accumulated oracle at 4096 sampled targets of
        # THIS workload (benchmarks/probe_rcp_error.py --sym): relative
        # error med 4.7e-6 / p99 3.9e-5 / max 2.2e-4 — same error class as
        # the ordered kernel (max 2.1e-4), inside BASELINE's <1e-3 budget
        # (sym newton: med 4.4e-7 / max 1.9e-5).
        # Library default stays "newton" (NaN-freeze guard) for
        # physics-quality use.
        _ = float(allpairs_accel_sym(pos, mass, tile=1024, strips=4,
                                     rcp="approx+clamp").sum())
        return time.perf_counter() - t0

    run()  # compile + warm
    dt = min(run() for _ in range(reps))
    pairs_per_sec = n * n / dt

    print(json.dumps({
        "metric": "pairwise interactions/sec/chip (all-pairs Pallas, N=%d)" % n,
        "value": pairs_per_sec,
        "unit": "pairs/s",
        "vs_baseline": pairs_per_sec / 1e11,
    }))


if __name__ == "__main__":
    main()

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

# The axon TPU tunnel has transient outages ("Unable to initialize backend
# 'axon': UNAVAILABLE", observed round 3). JAX caches a failed backend init
# for the process lifetime, so retry by re-exec'ing, not by looping.
_MAX_RETRIES = 20
_RETRY_WAIT_S = 30


def _backend_or_retry() -> None:
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
    from nbody_simulation_tpu.ops.allpairs import allpairs_accel

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
        # rcp="approx": raw VPU reciprocal — measured max deviation 6.5e-4
        # from the Newton-refined kernel (p99 3.7e-5), inside BASELINE's
        # <1e-3 force-error budget, and +11% pairs/s (2.46e11 → 2.72e11).
        # Library default stays "newton" (≤6e-6) for physics-quality use.
        _ = float(allpairs_accel(pos, mass, rcp="approx").sum())
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

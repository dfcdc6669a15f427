"""A/B the planner's interior-scan bucket size at large N.

The bucketed scan (≤_SCAN_BUCKET_LEVELS levels per lax.scan, each bucket
padded only to its own deepest width) won −9% step time at N=1M but
measured +4% at N=4.2M vs the round-3-early single-scan numbers — this
probe measures full World step time across bucket sizes at a given N to
decide whether the bucket size should adapt to depth.

Run (real TPU, idle machine): PYTHONPATH=/root/repo python
benchmarks/probe_bucket.py [N] [bucket_sizes...]
"""
from __future__ import annotations

import sys
import time

import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models import World, uniform_disc
from nbody_simulation_tpu.ops import traversal


def measure(n: int, bucket: int, steps: int = 32) -> float:
    import jax

    # _SCAN_BUCKET_LEVELS is read at TRACE time inside the module-level
    # jitted bh_accel_sorted: without clearing the pjit cache, every bucket
    # after the first silently reuses the first bucket's trace and this
    # probe measures nothing (near-identical readings are the signature).
    jax.clear_caches()
    traversal._SCAN_BUCKET_LEVELS = bucket
    w = World(uniform_disc(n, seed=0), SimConfig(force_path="bh"))
    w.run(17)
    float(jnp.sum(w.state.pos))
    t0 = time.perf_counter()
    w.run(steps)
    float(jnp.sum(w.state.pos))
    return (time.perf_counter() - t0) / steps * 1e3


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
    buckets = [int(b) for b in sys.argv[2:]] or [4, 6, 99]
    for b in buckets:
        ms = measure(n, b)
        print(f"N={n} bucket={b}: {ms:.2f} ms/step  {1e3/ms:.2f} steps/s",
              flush=True)


if __name__ == "__main__":
    main()

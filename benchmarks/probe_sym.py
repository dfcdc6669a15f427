"""Probe: symmetric (Newton's-third-law) all-pairs kernel vs the ordered one.

Correctness first (N=65,536 vs the ordered kernel at the same rcp — fp32
summation-order differences only), then an A/B timing at the headline shape
(N=1,048,576). Run on the real TPU:

    PYTHONPATH=/root/repo python benchmarks/probe_sym.py
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.ops.allpairs import allpairs_accel, allpairs_accel_sym


def sync(x) -> float:
    return float(jnp.sum(x))


def timeit(fn, reps=3):
    sync(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.default_rng(0)

    # --- small-nt correctness (the aliased-RMW hazard band) ---
    # nt<4 routes through the per-round path on TPU (no revisits); nt=4,5
    # are the smallest grid-path tile counts — exercised here on hardware.
    tile = 1024
    for nt in (1, 2, 3, 4, 5):
        n = tile * nt
        pos = jnp.asarray(rng.uniform(0, 1e5, (n, 2)).astype(np.float32))
        mass = jnp.asarray(rng.integers(1, 100, n).astype(np.float32))
        a_ord = np.asarray(allpairs_accel(pos, mass,
                                          tile_i=min(512, n),
                                          tile_j=1024))
        a_sym = np.asarray(allpairs_accel_sym(pos, mass, tile=tile))
        scale = np.abs(a_ord).max()
        err = np.abs(a_sym - a_ord).max() / scale
        print(f"small-nt nt={nt}: max |sym-ord|/max|a| = {err:.3e}",
              flush=True)
        assert err < 1e-4, (nt, err)

    # --- correctness at 64k ---
    n = 65_536
    pos = jnp.asarray(rng.uniform(0, 1e5, (n, 2)).astype(np.float32))
    mass = jnp.asarray(rng.integers(1, 100, n).astype(np.float32))
    for rcp in ("newton", "approx+clamp"):
        a_ord = np.asarray(allpairs_accel(pos, mass, rcp=rcp))
        for tile, strips in ((512, 4), (1024, 8)):
            a_sym = np.asarray(allpairs_accel_sym(pos, mass, tile=tile,
                                                  strips=strips, rcp=rcp))
            scale = np.abs(a_ord).max()
            err = np.abs(a_sym - a_ord).max() / scale
            print(f"correctness rcp={rcp} tile={tile}: "
                  f"max |sym-ord|/max|a| = {err:.3e}", flush=True)
            assert err < 1e-4, err

    # --- timing at the headline shape ---
    n = 1_048_576
    pos = jnp.asarray(rng.uniform(0, 1e5, (n, 2)).astype(np.float32))
    mass = jnp.asarray(rng.integers(1, 100, n).astype(np.float32))
    results = {}
    for rcp in ("newton", "approx+clamp"):
        t = timeit(lambda: allpairs_accel(pos, mass, rcp=rcp))
        results[f"ordered/{rcp}"] = n * n / t
        print(f"ordered   rcp={rcp:13s}: {n*n/t:.4e} pairs/s", flush=True)
        for tile, strips in ((512, 2), (512, 4), (1024, 4), (1024, 8),
                             (2048, 16)):
            try:
                t = timeit(lambda: allpairs_accel_sym(
                    pos, mass, tile=tile, strips=strips, rcp=rcp))
            except Exception as e:  # noqa: BLE001 — report VMEM fails etc.
                print(f"sym t={tile}/s{strips} rcp={rcp}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            results[f"sym{tile}s{strips}/{rcp}"] = n * n / t
            print(f"sym t={tile:4d}/s{strips:2d} rcp={rcp:13s}: "
                  f"{n*n/t:.4e} pairs/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

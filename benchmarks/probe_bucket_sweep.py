"""Adopt-or-kill: occupancy-bucketed force sweep (round-4 verdict item 6).

Measures full World step time on the reference galaxy (the occupancy-skewed
scene: 46% of source columns past the per-row last nonzero,
benchmarks/probe_lastnz.py) across (block_frac, col_frac) budgets, plus the
1M uniform disc (where every 128-group block holds a full row, so the
lax.cond guard falls back every step — this measures the pure overhead of
the occupancy computation + guard).

Run (real TPU, idle): PYTHONPATH=/root/repo python benchmarks/probe_bucket_sweep.py
"""
from __future__ import annotations

import time

import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models import World, galaxy, uniform_disc


def measure(make_state, buckets, steps=64, warm=17):
    # Fresh state per World: at exactly-padded N (1M = 16384 leaves) pad_to
    # is a no-op and a reused state's buffers were DONATED by the previous
    # World's steps ("Array has been deleted").
    cfg = SimConfig(force_path="bh", sweep_buckets=buckets)
    w = World(make_state(), cfg)
    w.run(warm)
    float(jnp.sum(w.state.pos))
    t0 = time.perf_counter()
    w.run(steps)
    float(jnp.sum(w.state.pos))
    return (time.perf_counter() - t0) / steps * 1e3


def main() -> None:
    gal = lambda: galaxy(seed=0)
    base = measure(gal, None)
    print(f"galaxy  buckets=None: {base:.3f} ms/step  "
          f"({1e3/base:.1f} ups)", flush=True)
    # The win lives at SMALL col_frac: the galaxy's sparse-tail blocks have
    # last-nonzero well under c/8, and at this C the narrow call's cost is
    # pipeline-fill-dominated, so shrinking its tile further buys little
    # while risking the guard. Measured 2026-08-20 (idle chip):
    # (0.625,0.125) → 469.0 ups vs 408.8 base (1.15×, ADOPTED for galaxy);
    # (0.625,0.25) 1.10×, (0.75,0.05) 1.10×, (0.625,0.05) 1.04×; the
    # earlier coarse grid (bf∈{.25,.5} × cf∈{.25..625}) was flat at 1.0×.
    for bf, cf in ((0.625, 0.05), (0.625, 0.125), (0.625, 0.25),
                   (0.75, 0.05), (0.75, 0.125), (0.5, 0.125)):
        ms = measure(gal, (bf, cf))
        print(f"galaxy  buckets=({bf},{cf}): {ms:.3f} ms/step  "
              f"({1e3/ms:.1f} ups, {base/ms:.2f}x)", flush=True)

    disc = lambda: uniform_disc(1_048_576, seed=0)
    b0 = measure(disc, None, steps=32)
    b1 = measure(disc, (0.5, 0.5), steps=32)
    print(f"1M disc buckets=None: {b0:.3f} ms/step ({1e3/b0:.1f} steps/s)",
          flush=True)
    print(f"1M disc buckets=(0.5,0.5) [guard-fallback overhead]: "
          f"{b1:.3f} ms/step ({1e3/b1:.1f} steps/s, {b0/b1:.3f}x)",
          flush=True)


if __name__ == "__main__":
    main()

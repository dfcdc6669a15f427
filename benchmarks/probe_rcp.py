"""Probe: all-pairs headline kernel — rcp/guard modes × tile shapes at N=1M.

Round-3 follow-up to the docs/PERFORMANCE.md "reciprocal mode sweep": the
"+clamp" guard (mono_tile docstring, ops/allpairs.py) replaces the 4-op
is_normal mask with one VPU max — bitwise-identical for finite world-scale
inputs — but was never speed-measured. Run with the TPU otherwise idle.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nbody_simulation_tpu.ops.allpairs import allpairs_accel

N = 1_048_576
REPS = 3

rng = np.random.default_rng(0)
pos = jnp.asarray(rng.uniform(0, 1e5, (N, 2)).astype(np.float32))
mass = jnp.asarray(rng.integers(1, 100, N).astype(np.float32))


def timeit(**kw) -> float:
    def run() -> float:
        t0 = time.perf_counter()
        _ = float(allpairs_accel(pos, mass, **kw).sum())
        return time.perf_counter() - t0
    run()  # compile + warm
    return min(run() for _ in range(REPS))


# Reference accel for deviation checks (newton mode, current library default).
ref = np.asarray(allpairs_accel(pos, mass, rcp="newton"))
ref_norm = np.linalg.norm(ref, axis=1) + 1e-30

import itertools

MODES = sys.argv[1].split(",") if len(sys.argv) > 1 else (
    "approx", "approx+clamp", "newton+clamp", "newton")
TILES = ((512, 2048), (256, 2048), (512, 1024), (1024, 2048))
if len(sys.argv) > 2:
    TILES = tuple(tuple(int(v) for v in t.split("x"))
                  for t in sys.argv[2].split(","))

for rcp, (ti, tj) in itertools.product(MODES, TILES):
    try:
        dt = timeit(rcp=rcp, tile_i=ti, tile_j=tj)
    except Exception as e:  # VMEM overflow at big tiles, etc.
        msg = (str(e).splitlines() or [""])[0][:100]
        print(f"rcp={rcp:13s} tiles=({ti:4d},{tj:4d})  FAILED: "
              f"{type(e).__name__}: {msg}", flush=True)
        continue
    pairs = N * N / dt
    out = np.asarray(allpairs_accel(pos, mass, rcp=rcp,
                                    tile_i=ti, tile_j=tj))
    dev = np.linalg.norm(out - ref, axis=1) / ref_norm
    print(f"rcp={rcp:13s} tiles=({ti:4d},{tj:4d})  {dt*1e3:7.2f} ms  "
          f"{pairs:.3e} pairs/s  dev vs newton: med {np.median(dev):.2e} "
          f"max {dev.max():.2e}", flush=True)

"""Error study: kernel rcp modes vs the order-independent f64 oracle.

Grounds the bench.py quality claim properly: relative-to-newton deviation
is ill-conditioned for targets whose net force nearly cancels (a tiny
|a| denominator turns reduction-order noise into huge "relative" error),
so this probe measures every mode against the f64-accumulated oracle of
the exact reference pair math (oracle.direct_accel_oracle convention) at
M sampled targets of the exact bench workload, and reports med/p99/max
relative error plus error normalized by the RMS force scale.

Run: PYTHONPATH=/root/repo python benchmarks/probe_rcp_error.py [N] [M]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
M = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
FLT_MIN_NORMAL = np.float32(1.17549435e-38)

rng = np.random.default_rng(0)          # the exact bench.py workload
pos = rng.uniform(0, 1e5, (N, 2)).astype(np.float32)
mass = rng.integers(1, 100, N).astype(np.float32)
idx = np.sort(np.random.default_rng(1).choice(N, M, replace=False))

# ---- f64-accumulated truth at the sampled targets (exact fp32 pair math,
# order-independent f64 sum — oracle.direct_accel_oracle, row-sliced) ----
x, y = pos[:, 0], pos[:, 1]
truth = np.zeros((M, 2), np.float64)
t0 = time.perf_counter()
for k, i in enumerate(idx):
    dx = x - x[i]
    dy = y - y[i]
    s = np.abs(dx) + np.abs(dy)
    normal = np.isfinite(s) & (s >= FLT_MIN_NORMAL)
    d2 = np.maximum(dx * dx + dy * dy, np.float32(1e-3))
    den = np.where(normal, s * d2, np.float32(1.0))
    # Exact oracle op order — numerator FIRST, (dx*mass)/den — matching
    # oracle.direct_accel_oracle / src/main.rs:245-252. (dx*(mass/den)
    # is the kernel's own flattering order; ~1 ulp/pair different.)
    ax = np.where(normal, (dx * mass) / den, np.float32(0.0))
    ay = np.where(normal, (dy * mass) / den, np.float32(0.0))
    truth[k, 0] = ax.astype(np.float64).sum()
    truth[k, 1] = ay.astype(np.float64).sum()
print(f"oracle: {time.perf_counter() - t0:.1f}s for {M} targets", flush=True)

tnorm = np.linalg.norm(truth, axis=1)
rms = float(np.sqrt(np.mean(tnorm ** 2)))
print(f"force scale: med |a| {np.median(tnorm):.3e}  rms {rms:.3e}  "
      f"min |a| {tnorm.min():.3e}", flush=True)

# ---- kernel modes on the device ----
import jax.numpy as jnp
from nbody_simulation_tpu.ops.allpairs import allpairs_accel, allpairs_accel_sym

SYM = "--sym" in sys.argv   # also measure the symmetric third-law kernel

jp = jnp.asarray(pos)
jm = jnp.asarray(mass)
kernels = [("ord", lambda rcp: allpairs_accel(jp, jm, rcp=rcp))]
if SYM:
    kernels.append(("sym", lambda rcp: allpairs_accel_sym(
        jp, jm, tile=1024, strips=4, rcp=rcp)))
for name, fn in kernels:
    for rcp in ("newton", "approx+clamp"):
        out = np.asarray(fn(rcp))[idx].astype(np.float64)
        err = np.linalg.norm(out - truth, axis=1)
        rel = err / np.maximum(tnorm, 1e-300)
        rel_rms = err / rms
        q = lambda a: (np.median(a), np.percentile(a, 99), a.max())
        print(f"{name} rcp={rcp:13s} rel-to-own-|a|: med {q(rel)[0]:.2e} "
              f"p99 {q(rel)[1]:.2e} max {q(rel)[2]:.2e}   "
              f"rel-to-rms-force: med {q(rel_rms)[0]:.2e} "
              f"p99 {q(rel_rms)[1]:.2e} max {q(rel_rms)[2]:.2e}", flush=True)

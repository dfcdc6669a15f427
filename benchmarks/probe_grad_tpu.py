"""Gradient cost on the real chip — galaxy scale + the flagship 1M shard.

Round-4 verdict item 2 asks for "a galaxy-scale distributed BH gradient
timed on TPU". The distributed grad (parallel/bh_distributed_grad.py) is
the staged pipeline with the custom-VJP sweep substituted; its collectives
transpose to the same ppermute/psum payloads the FORWARD accounting already
brackets (suite config 5), so the per-chip grad cost is the single-chip
value+grad of the same walk at the shard size. This probe measures that on
the real TPU:

1. galaxy (151,317, θ=50) — refresh of the README "galaxy-scale BH gradient"
   number (value+grad of a scalar loss through bh_accel_diff);
2. 1M uniform disc, θ=50, flagship caps — the per-shard backward cost of
   the distributed flagship grad (the number the v5e-16 projection
   multiplies by 1, same per-shard-proxy methodology as suite config 5).

Timing per CLAUDE.md rules: reps dispatched back-to-back, ONE closing sync.

Run (real TPU, idle): PYTHONPATH=/root/repo python benchmarks/probe_grad_tpu.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.models.scenarios import galaxy, uniform_disc
from nbody_simulation_tpu.ops.traversal_grad import bh_accel_diff


def timeit(fn, *args, reps=8, warm=2):
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    for label, st, kw in [
        ("galaxy 151k theta=50", galaxy(seed=0), {}),
        ("1M disc theta=50 (flagship shard)", uniform_disc(1 << 20, seed=0),
         {}),
    ]:
        pos = jnp.asarray(st.pos)
        mass = jnp.asarray(st.mass)

        def loss(p, m):
            return jnp.sum(bh_accel_diff(p, m, theta=50.0, **kw) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))
        t_vg = timeit(vg, pos, mass)
        print(f"{label}: value+grad {t_vg * 1e3:.2f} ms", flush=True)
        if "--fwd" in __import__("sys").argv:
            fwd = jax.jit(lambda p, m: bh_accel_diff(p, m, theta=50.0, **kw))
            t_f = timeit(fwd, pos, mass)
            print(f"{label}: diff-mode forward {t_f * 1e3:.2f} ms "
                  f"(bwd/fwd {t_vg / t_f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()

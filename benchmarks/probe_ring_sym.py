"""Symmetric ring visiting stages: adopt-or-kill measurement (round-4
verdict item 5).

The ring's k>0 visiting stages are 15/16 of the pair work at the flagship
mesh; ring_allpairs_accel keeps them on the ORDERED kernel. The symmetric
cross-shard kernel (ops/allpairs.allpairs_accel_sym_pair) evaluates each
unordered cross-shard pair once and ships the j-side partial home on the
rotating tile (parallel/ring.ring_allpairs_accel_symring).

Accounting at mesh size P with shard L:
- ordered:   P−1 ordered blocks/shard, each L² pairs → (P−1)·L² evaluated
- symmetric: ⌈(P−1)/2⌉ sym blocks/shard (even P: one of them half-gated),
  each L² pair EVALUATIONS but BOTH sides accumulated → (P−1)/2·L²
  evaluations + 1 extra ring hop (2·L·8 B wire) + the half-round waste
  at even P (L²/2 evaluations discarded).

This probe times ONE visiting block both ways on the chip at 1M-shard tile
shapes (the per-stage cost the ring multiplies by P−1 resp. ⌈(P−1)/2⌉),
then prints the per-step ring totals both ways at P=8 and P=16.

Run (real TPU, idle): PYTHONPATH=/root/repo python benchmarks/probe_ring_sym.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.ops.allpairs import (allpairs_accel,
                                               allpairs_accel_sym_pair)

L = 262_144  # block side: L² pairs/block — big enough to be compute-bound,
#              small enough for quick reps (a 1M block is 4 s at 3e11/s)


def timeit(fn, reps=8, warm=2):
    for _ in range(warm):
        out = fn()
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x)), out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    rng = np.random.default_rng(0)
    pi = jnp.asarray(rng.uniform(0, 1e5, (L, 2)).astype(np.float32))
    mi = jnp.asarray(rng.integers(1, 100, L).astype(np.float32))
    pj = jnp.asarray(rng.uniform(0, 1e5, (L, 2)).astype(np.float32))
    mj = jnp.asarray(rng.integers(1, 100, L).astype(np.float32))

    for rcp in ("newton", "approx+clamp"):
        t_ord = timeit(lambda: allpairs_accel(
            pi, mi, src_pos=pj, src_mass=mj, tile_i=512, tile_j=2048,
            rcp=rcp))
        best = None
        for tile, strips in [(1024, 4), (1024, 8), (512, 4), (2048, 4)]:
            try:
                t_sym = timeit(lambda: allpairs_accel_sym_pair(
                    pi, mi, pj, mj, tile=tile, strips=strips, rcp=rcp))
            except Exception as e:  # scoped-VMEM overflow at big tiles
                print(f"  sym tile={tile}/strips={strips}: {type(e).__name__}",
                      flush=True)
                continue
            print(f"  sym tile={tile}/strips={strips}: {t_sym*1e3:.2f} ms",
                  flush=True)
            if best is None or t_sym < best[0]:
                best = (t_sym, tile, strips)
        t_sym, tile, strips = best
        pairs = L * L
        print(f"rcp={rcp}: ordered block {t_ord*1e3:.2f} ms "
              f"({pairs/t_ord/1e11:.2f}e11 pairs/s); sym block "
              f"{t_sym*1e3:.2f} ms tile={tile}/strips={strips} "
              f"({pairs/t_sym/1e11:.2f}e11 evals/s, both sides)", flush=True)
        for P in (8, 16):
            t_o = (P - 1) * t_ord
            # even P: (P/2 − 1) full + 1 half-gated (costs a full block of
            # device time, half of it discarded) — time = P/2 blocks.
            t_s = (P // 2) * t_sym
            print(f"  P={P}: visiting stages ordered {t_o*1e3:.1f} ms vs "
                  f"sym {t_s*1e3:.1f} ms ({t_o/t_s:.2f}x)", flush=True)


if __name__ == "__main__":
    main()

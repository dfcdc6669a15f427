"""Probe: is third-law sharing in the BH near-field sweep worth building?

The grouped sweep is ~6.4 ms of the ~9.9 ms 1M-BH step; its source columns
are [interior COM cols | leaf-particle cols]. Leaf-tile interactions between
mutually-planned group pairs are symmetric (a's targets vs b's leaves AND
b's targets vs a's leaves compute the same displacement tiles), so a
third-law sweep could halve that work — IF the structure admits a static
schedule. This probe measures, at the exact flagship shapes:

1. Sweep-time decomposition: full columns vs interior-only vs leaf-only
   (and the diagonal self-tile) → the ceiling of any sharing scheme.
2. Morton-band structure of the near field: what fraction of a plan row's
   near leaves lie within ±B plan rows in Morton order → whether a STATIC
   banded symmetric kernel (tile pair (g, g+o), o = 0..B — the
   allpairs_accel_sym dataflow at static offsets) could cover the near
   field without data-dependent aliased scatters (the measured dead-end
   class, docs/PERFORMANCE.md round 3).

Run: PYTHONPATH=/root/repo python benchmarks/probe_sweep_sym.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import uniform_disc
from nbody_simulation_tpu.ops.morton import morton_sort_state
from nbody_simulation_tpu.ops.traversal import _grouped_force, bh_plan_sources
from nbody_simulation_tpu.ops.tree import summarize_sorted


def sync(x) -> float:
    return float(jnp.sum(x))


def timeit(fn, reps=20):
    # Back-to-back async dispatch, one closing sync: a per-call sync pays
    # the ~20 ms tunnel round-trip per rep and swamps ms-scale kernels
    # (the profile_bh.py pattern; CLAUDE.md measurement rules).
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    n = 1_048_576
    cfg = SimConfig(force_path="bh")        # θ=50 flagship defaults
    st = uniform_disc(n, seed=0)
    fcap, lcap = cfg.resolved_caps()
    pos, vel, mass = morton_sort_state(st.pos, st.vel, st.mass,
                                       cfg.world_size,
                                       bits=cfg.resolved_morton_bits())
    tree = summarize_sorted(pos, mass, leaf_size=cfg.leaf_size,
                            unweighted_leaf_com=cfg.unweighted_leaf_com)
    n_leaves, S, _ = tree.leaf_pos.shape
    pl_ = cfg.plan_leaves
    G = n_leaves // pl_
    rcp = cfg.resolved_rcp(bh=True)
    mp = cfg.resolved_multipole()

    plan = jax.jit(lambda t: bh_plan_sources(
        t, cfg.theta, fcap, lcap, arity=cfg.tree_arity, plan_leaves=pl_,
        multipole=mp))
    cols = plan(tree)
    src_x, src_y, src_m = cols[:3]
    C = src_x.shape[1]
    leaf_w = lcap * S
    print(f"shapes: G={G} rows × S'={pl_ * S} targets, C={C} cols "
          f"(interior {C - leaf_w}, leaf {leaf_w}); "
          f"mean nonzero-mass cols {float((src_m > 0).sum(1).mean()):.0f}",
          flush=True)

    tgt = tree.leaf_pos.reshape(G, pl_ * S, 2)

    @functools.partial(jax.jit, static_argnames=("lo", "hi"))
    def sweep_fn(sx, sy, sm, lo, hi):
        sl = slice(lo, hi)
        return _grouped_force(tgt, sx[:, sl], sy[:, sl], sm[:, sl],
                              softening2=cfg.softening2, rcp=rcp,
                              interpret=False)

    def sweep(lo, hi):
        return lambda: sweep_fn(src_x, src_y, src_m, lo, hi)

    t_full = timeit(sweep(0, C))
    t_int = timeit(sweep(0, C - leaf_w))
    t_leaf = timeit(sweep(C - leaf_w, C))
    print(f"sweep full {t_full * 1e3:.2f} ms | interior-only "
          f"{t_int * 1e3:.2f} ms | leaf-only {t_leaf * 1e3:.2f} ms",
          flush=True)
    print(f"third-law ceiling (leaf work halved, zero overhead): "
          f"{(t_int + t_leaf / 2) * 1e3:.2f} ms sweep "
          f"(saves {(t_full - t_int - t_leaf / 2) * 1e3:.2f} ms/step)",
          flush=True)

    if "--band" not in sys.argv:
        return

    # --- Morton-band structure of the near field (host, NumPy) ---
    # Approximate row-g's near-leaf set by the planner's own leaf-level
    # criterion: leaf ℓ is NEAR row g if NOT (disjoint AND s² < d²·θ²)
    # with s, d from the leaf record vs the row AABB (the walk only reaches
    # ℓ if every ancestor also failed, so this SUPERSET of the true leaf
    # list is the right object for band coverage).
    lp = np.asarray(tree.leaf_pos)          # (n_leaves, S, 2)
    lm = np.asarray(tree.leaf_mass)
    live = lm > 0
    big = np.float32(3e38)
    lmin = np.where(live[..., None], lp, big).min(1)    # (n_leaves, 2)
    lmax = np.where(live[..., None], lp, -big).max(1)
    rmin = lmin.reshape(G, pl_, 2).min(1)               # (G, 2)
    rmax = lmax.reshape(G, pl_, 2).max(1)
    lcom = (np.where(live[..., None], lp, 0).sum(1)
            / np.maximum(live.sum(1), 1)[..., None])    # unweighted COM quirk
    size2 = ((lmax - lmin).max(-1) ** 2)                # (n_leaves,)

    theta2 = np.float32(cfg.theta ** 2)
    band_hist = np.zeros(8, np.int64)   # |row distance| 0,1,2,3,4..7
    far_count = 0
    near_total = 0
    rows = np.arange(G)
    for g in range(G):
        gmn, gmx = rmin[g], rmax[g]
        disjoint = ((gmx[0] <= lmin[:, 0]) | (gmn[0] >= lmax[:, 0])
                    | (gmx[1] <= lmin[:, 1]) | (gmn[1] >= lmax[:, 1]))
        dx = np.maximum(np.maximum(gmn[0] - lcom[:, 0],
                                   lcom[:, 0] - gmx[0]), 0)
        dy = np.maximum(np.maximum(gmn[1] - lcom[:, 1],
                                   lcom[:, 1] - gmx[1]), 0)
        accept = disjoint & (size2 < (dx * dx + dy * dy) * theta2)
        near = np.nonzero(~accept & live.any(1))[0]
        near_total += len(near)
        dist = np.abs(near // pl_ - g)
        for b in range(7):
            band_hist[b] += int((dist == b).sum())
        band_hist[7] += int((dist >= 7).sum())
        far_count += int((dist >= 7).sum())
    frac = band_hist / max(near_total, 1)
    cum = np.cumsum(frac)
    print(f"near-leaf Morton-band histogram (|Δrow|): "
          + " ".join(f"{b}:{frac[b]:.3f}" for b in range(7))
          + f" ≥7:{frac[7]:.3f}", flush=True)
    print(f"cumulative coverage within ±B rows: "
          + " ".join(f"B={b}:{cum[b]:.3f}" for b in range(7)), flush=True)
    print(f"near leaves total {near_total} "
          f"({near_total / G:.1f}/row; leaf_cap holds {lcap})", flush=True)


if __name__ == "__main__":
    main()

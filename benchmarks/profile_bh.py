"""Phase-level profile of the BH step (sort / summarize / plan / sweep /
fused step) at a given N — finds where the ms go. Not part of the suite.

Run: PYTHONPATH=/root/repo python benchmarks/profile_bh.py [N]
"""
from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models import World, uniform_disc, galaxy
from nbody_simulation_tpu.ops.morton import morton_order
from nbody_simulation_tpu.ops.traversal import (bh_accel_sorted,
                                                bh_plan_sources,
                                                _grouped_force)
from nbody_simulation_tpu.ops.tree import summarize_sorted


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0]))


def timeit(fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    scenario = sys.argv[2] if len(sys.argv) > 2 else "disc"
    cfg = SimConfig(force_path="bh")
    st = galaxy(seed=0) if scenario == "galaxy" else uniform_disc(n, seed=0)
    w = World(st, cfg)
    st = w.state
    n = st.n
    mbits = cfg.resolved_morton_bits()
    fcap, lcap = cfg.resolved_caps()
    mp = cfg.resolved_multipole()

    t_sort = timeit(jax.jit(functools.partial(
        morton_order, world_size=cfg.world_size, bits=mbits)),
        st.pos, st.mass)
    order = morton_order(st.pos, st.mass, cfg.world_size, bits=mbits)
    spos, smass = st.pos[order], st.mass[order]

    @jax.jit
    def permute3(pos, vel, mass, order):
        return pos[order], vel[order], mass[order]
    t_perm = timeit(permute3, st.pos, st.vel, st.mass, order)

    summ = jax.jit(functools.partial(
        summarize_sorted, leaf_size=cfg.leaf_size,
        unweighted_leaf_com=cfg.unweighted_leaf_com))
    t_summ = timeit(summ, spos, smass)
    tree = summ(spos, smass)

    plan = jax.jit(functools.partial(
        bh_plan_sources, theta=cfg.theta, frontier_cap=fcap, leaf_cap=lcap,
        arity=cfg.tree_arity, plan_leaves=cfg.plan_leaves, multipole=mp))
    t_plan = timeit(plan, tree)
    planned = plan(tree)
    src_q = planned[3:] if mp == 2 else None
    C = planned[0].shape[1]
    n_leaves, S, _ = tree.leaf_pos.shape
    pl_ = cfg.plan_leaves
    tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)

    sweep = jax.jit(functools.partial(
        _grouped_force, softening2=cfg.softening2, rcp=cfg.resolved_rcp(bh=True),
        interpret=False, src_q=src_q))
    t_sweep = timeit(sweep, tgt, *planned[:3])

    full = jax.jit(functools.partial(
        bh_accel_sorted, theta=cfg.theta, softening2=cfg.softening2,
        frontier_cap=fcap, leaf_cap=lcap, arity=cfg.tree_arity,
        plan_leaves=cfg.plan_leaves, multipole=mp))
    t_full = timeit(full, tree)

    # Fused engine step, steady-state (resort amortized over resort_every).
    w.run(5)
    sync(w.state)
    t0 = time.perf_counter()
    w.run(32)
    sync(w.state)
    t_step = (time.perf_counter() - t0) / 32 * 1e3

    print(json.dumps({
        "n": n, "scenario": scenario, "groups": int(tgt.shape[0]),
        "src_width_C": int(C),
        "sort_ms": round(t_sort, 3), "permute3_ms": round(t_perm, 3),
        "summarize_ms": round(t_summ, 3), "plan_ms": round(t_plan, 3),
        "sweep_ms": round(t_sweep, 3), "bh_accel_sorted_ms": round(t_full, 3),
        "engine_step_ms": round(t_step, 3),
        "steps_per_s": round(1e3 / t_step, 1)}), flush=True)


if __name__ == "__main__":
    main()

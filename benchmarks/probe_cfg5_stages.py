"""Decompose the config-5 flagship composite by stage.

Times the SAME single-jit per-shard step body as benchmarks/suite.py
config 5, truncated after each stage: local walk only / +1 near stage /
+2 near stages / +forest (= the full composite). Differences between
consecutive rows attribute the marginal cost of each stage inside one
fused program (separately dispatched stages would overcount by ~3 ms
dispatch latency each over the axon tunnel).

Run (real TPU, idle): PYTHONPATH=/root/repo python
benchmarks/probe_cfg5_stages.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models import uniform_disc
from nbody_simulation_tpu.ops.morton import morton_sort_state
from nbody_simulation_tpu.ops.traversal import _grouped_force, plan_rows
from nbody_simulation_tpu.ops.tree import summarize_sorted
from nbody_simulation_tpu.parallel import distribute_state, make_1d_mesh
from nbody_simulation_tpu.parallel.bh_distributed import (
    FOREST_ROW_LEAVES, NEAR_ROW_LEAVES, _near_stage)

P, N = 16, 16_777_216
L = N // P


def main() -> None:
    cfg = SimConfig(force_path="bh")
    mesh = make_1d_mesh(1)
    mp = cfg.resolved_multipole()
    fcap, lcap = cfg.resolved_caps()
    rcp = cfg.resolved_rcp(bh=True)
    mbits = cfg.resolved_morton_bits()
    fdt = np.float32(cfg.dt)

    def step_body(pos, vel, mass, resort, n_near, forest):
        if resort:
            pos, vel, mass = morton_sort_state(pos, vel, mass,
                                               cfg.world_size, bits=mbits)
        tree = summarize_sorted(pos, mass, leaf_size=cfg.leaf_size,
                                unweighted_leaf_com=cfg.unweighted_leaf_com)
        n_leaves, S, _ = tree.leaf_pos.shape
        pl_ = cfg.plan_leaves
        own = tree.levels[tree.depth - (pl_.bit_length() - 1)]
        tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)
        planned = plan_rows(tree, own, cfg.theta, fcap, lcap,
                            cfg.tree_arity, multipole=mp)
        acc = _grouped_force(tgt, *planned[:3], softening2=cfg.softening2,
                             rcp=rcp, interpret=False,
                             src_q=planned[3:] if mp == 2 else None)
        pln = NEAR_ROW_LEAVES
        own_n = tree.levels[tree.depth - (pln.bit_length() - 1)]
        tgt_n = tree.leaf_pos.reshape(n_leaves // pln, pln * S, 2)
        ncaps = (fcap, max(lcap, 4 * pln))
        for _ in range(n_near):
            acc_n = _near_stage(jnp.zeros(tgt_n.shape, jnp.float32), tree,
                                own_n, tgt_n, cfg, mp, rcp, False,
                                caps=ncaps)
            acc = acc + acc_n.reshape(acc.shape)
        if forest:
            plf = FOREST_ROW_LEAVES
            own_f = tree.levels[tree.depth - (plf.bit_length() - 1)]
            tgt_f = tree.leaf_pos.reshape(n_leaves // plf, plf * S, 2)
            planned_f = plan_rows(tree, own_f, cfg.theta, 16, 0, 2,
                                  multipole=mp,
                                  max_levels=min(cfg.forest_levels,
                                                 tree.depth - 4))
            acc_f = _grouped_force(tgt_f, *planned_f[:3],
                                   softening2=cfg.softening2, rcp=rcp,
                                   interpret=False,
                                   src_q=planned_f[3:] if mp == 2 else None)
            acc = acc + acc_f.reshape(acc.shape)
        accp = acc.reshape(n_leaves * S, 2)[:pos.shape[0]]
        vel = vel + accp * fdt
        pos = pos + vel * fdt
        return pos, vel, mass

    prev = None
    for label, n_near, forest in [("local only", 0, False),
                                  ("+1 near", 1, False),
                                  ("+2 near", 2, False),
                                  ("+forest (full)", 2, True)]:
        st = distribute_state(uniform_disc(L, seed=0), mesh, cfg)
        step_r = jax.jit(functools.partial(step_body, resort=True,
                                           n_near=n_near, forest=forest),
                         donate_argnums=(0, 1, 2))
        step_s = jax.jit(functools.partial(step_body, resort=False,
                                           n_near=n_near, forest=forest),
                         donate_argnums=(0, 1, 2))
        pva = (st.pos, st.vel, st.mass)
        every = max(1, cfg.resort_every)
        for i in range(every + 2):
            pva = (step_r if i % every == 0 else step_s)(*pva)
        float(jnp.sum(pva[0]))
        t0 = time.perf_counter()
        for i in range(every + 2, every + 2 + 16):
            pva = (step_r if i % every == 0 else step_s)(*pva)
        float(jnp.sum(pva[0]))
        ms = (time.perf_counter() - t0) / 16 * 1e3
        delta = "" if prev is None else f"  (marginal {ms - prev:+.2f} ms)"
        print(f"{label}: {ms:.2f} ms/step{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

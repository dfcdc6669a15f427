"""Measure per-ROW last-nonzero source columns at flagship planner shapes.

The sweep kernel's sub loop processes each group's full (S, C) tile; the
recorded j-skip dead end measured per-128-group-BLOCK max last-nonzero
(1343/1344 — one full row per block kills block-level skipping). This
probes the PER-ROW distribution, the quantity a per-sub dynamic chunk
loop would exploit: leaf lists are prefix-compacted, so each row's
trailing leaf-tile columns are zero-mass and exactly skippable.
"""
from __future__ import annotations

import json

import numpy as np

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models.scenarios import galaxy, uniform_disc
from nbody_simulation_tpu.ops.traversal import bh_plan_sources
from nbody_simulation_tpu.ops.tree import build_tree


def probe(name, state, cfg: SimConfig):
    state = state.pad_to(cfg.leaf_size * cfg.plan_leaves)
    tree, _ = build_tree(state.pos, state.mass, leaf_size=cfg.leaf_size,
                         world_size=cfg.world_size,
                         unweighted_leaf_com=cfg.unweighted_leaf_com,
                         morton_bits=cfg.resolved_morton_bits())
    f, l = cfg.resolved_caps()
    src_m = bh_plan_sources(tree, cfg.theta, f, l,
                            plan_leaves=cfg.plan_leaves,
                            multipole=cfg.resolved_multipole())[2]
    m = np.asarray(src_m)
    g, c = m.shape
    nz = m > 0
    cols = np.arange(1, c + 1)
    last_nz = (nz * cols).max(axis=1)                  # per-row last nonzero
    chunks = -(-last_nz // 128) * 128                  # 128-lane chunk cost
    block_max = (last_nz[: g - g % 128].reshape(-1, 128).max(axis=1)
                 if g >= 128 else None)
    out = {
        "name": name, "G": g, "C": c,
        "nonzero_mean": float(nz.sum(1).mean()),
        "last_nz_mean": float(last_nz.mean()),
        "last_nz_p50": float(np.percentile(last_nz, 50)),
        "last_nz_p99": float(np.percentile(last_nz, 99)),
        "chunked_cols_mean": float(chunks.mean()),
        "per_row_skip_frac": float(1 - chunks.mean() / c),
        "per_block_skip_frac": (
            float(1 - (-(-block_max // 128) * 128).mean() / c)
            if block_max is not None else None),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    probe("disc_1M_theta50", uniform_disc(1 << 20, seed=0), SimConfig())
    probe("galaxy_theta50", galaxy(seed=0), SimConfig())

"""Multi-chip Barnes-Hut: replicated tree, group-sharded traversal.

Scaling strategy (v1, bandwidth-simple):

- all_gather the particle shards over ICI → every device holds the full
  (pos, mass) and builds the SAME Morton tree (sort + summaries are
  replicated compute — cheap next to the force work);
- each device plans + sweeps only its 1/P slice of the leaf groups (the
  expensive part — the Pallas force sweep — is perfectly sharded);
- the acceleration slices are all_gathered back and returned in the
  ORIGINAL particle order with the input sharding.

Communication per step: all_gather of (N,2)+(N,) in and (n_pad,2) out —
~5N·4 bytes over ICI (≈330 MB/step at N=16.7M, well within ICI bandwidth at
the 60 steps/sec target). A fully-distributed tree (sampled splitters +
sharded sort) is the round-2 upgrade; this version scales the BH path while
computing exactly the same walk as a single chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.ops.morton import morton_order
from nbody_simulation_tpu.ops.traversal import (_accept_group, _compact,
                                                _grouped_force)
from nbody_simulation_tpu.ops.tree import FlatTree, Level, summarize_sorted
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.state import ParticleState


def _plan_rows(tree: FlatTree, own: Level, leaf0, theta: float,
               frontier_cap: int, leaf_cap: int, arity: int):
    """The standard BFS planner, over an explicit row slice.

    ``own`` holds the slice's own-group AABBs; candidate records and leaf
    tiles are gathered from the FULL tree (global node ids). Identical logic
    to ops.traversal.bh_plan_sources with plan_leaves=1, minus row layout.
    """
    depth = tree.depth
    g_rows = own.aabb_min.shape[0]
    S = tree.leaf_pos.shape[1]
    F = frontier_cap
    gmin = own.aabb_min[:, None, :]
    gmax = own.aabb_max[:, None, :]
    k0 = min(max(F.bit_length() - 1, 0), depth - 1) if depth > 0 else 0

    src_x, src_y, src_m = [], [], []
    width = 1 << k0
    frontier = jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[None, :],
                                (g_rows, width))
    if width < F:
        frontier = jnp.concatenate(
            [frontier, jnp.zeros((g_rows, F - width), jnp.int32)], axis=1)
    valid = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[None, :] < width, (g_rows, F))
    leaf_ids = jnp.zeros((g_rows, 1), jnp.int32)
    leaf_valid = jnp.ones((g_rows, 1), dtype=bool)

    lvl = k0
    while lvl < depth:
        step = 2 if (arity == 4 and lvl + 2 <= depth) else 1
        fan = 1 << step
        child_lv = tree.levels[lvl + step]
        cand = jnp.concatenate([frontier * fan + i for i in range(fan)],
                               axis=1)
        cvalid = jnp.concatenate([valid] * fan, axis=1)
        rec = child_lv.packed[cand]
        nmin, nmax = rec[..., 0:2], rec[..., 2:4]
        ncom, nmassf = rec[..., 4:6], rec[..., 6]
        nonempty = rec[..., 7] > 0
        accept = cvalid & _accept_group(gmin, gmax, nmin, nmax, ncom, theta)
        opened = cvalid & ~accept & nonempty
        if lvl + step < depth:
            frontier, valid, overflow = _compact(opened, cand, F)
        else:
            leaf_ids, leaf_valid, overflow = _compact(opened, cand, leaf_cap)
        use_com = accept | overflow  # overflow → COM fallback
        src_x.append(ncom[..., 0])
        src_y.append(ncom[..., 1])
        src_m.append(jnp.where(use_com, nmassf, 0.0))
        lvl += step

    lp = tree.leaf_pos[leaf_ids]
    lm = tree.leaf_mass[leaf_ids] * leaf_valid[..., None]
    L = leaf_ids.shape[1]
    src_x.append(lp[..., 0].reshape(g_rows, L * S))
    src_y.append(lp[..., 1].reshape(g_rows, L * S))
    src_m.append(lm.reshape(g_rows, L * S))
    return (jnp.concatenate(src_x, axis=1),
            jnp.concatenate(src_y, axis=1),
            jnp.concatenate(src_m, axis=1))


def bh_sharded_accel(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                     axis: str = AXIS, config: SimConfig | None = None
                     ) -> jax.Array:
    """BH acceleration with particles sharded over ``axis``.

    Returns accel in the original particle order, sharded like the input.
    """
    cfg = config or SimConfig(force_path="bh")
    n_dev = mesh.shape[axis]
    fcap, lcap = cfg.resolved_caps()
    interpret = jax.default_backend() == "cpu"

    def local(pos_l, mass_l):
        pos_all = jax.lax.all_gather(pos_l, axis, tiled=True)    # (N, 2)
        mass_all = jax.lax.all_gather(mass_l, axis, tiled=True)  # (N,)
        n = pos_all.shape[0]
        order = morton_order(pos_all, mass_all, cfg.world_size)
        tree = summarize_sorted(pos_all[order], mass_all[order],
                                leaf_size=cfg.leaf_size,
                                unweighted_leaf_com=cfg.unweighted_leaf_com)
        n_leaves, S, _ = tree.leaf_pos.shape
        assert n_leaves % n_dev == 0, (n_leaves, n_dev)
        my_leaves = n_leaves // n_dev
        leaf0 = jax.lax.axis_index(axis) * my_leaves

        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, leaf0, my_leaves, 0)
        lv = tree.levels[-1]
        own = Level(aabb_min=sl(lv.aabb_min), aabb_max=sl(lv.aabb_max),
                    com=sl(lv.com), mass_i=sl(lv.mass_i), count=sl(lv.count))
        src_x, src_y, src_m = _plan_rows(tree, own, leaf0, cfg.theta,
                                         fcap, lcap, cfg.tree_arity)
        acc_slice = _grouped_force(
            sl(tree.leaf_pos), src_x, src_y, src_m,
            softening2=cfg.softening2, rcp=cfg.rcp,
            interpret=interpret).reshape(my_leaves * S, 2)

        acc_sorted = jax.lax.all_gather(acc_slice, axis, tiled=True)
        acc_orig = (jnp.zeros((n, 2), jnp.float32)
                    .at[order].set(acc_sorted[:n]))
        chunk = pos_l.shape[0]
        return jax.lax.dynamic_slice_in_dim(
            acc_orig, jax.lax.axis_index(axis) * chunk, chunk, 0)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis)),
                      out_specs=P(axis, None), check_vma=False)
    return f(pos, mass)


def make_sharded_bh_step(mesh: Mesh, config: SimConfig, axis: str = AXIS):
    """Full multi-chip BH simulation step: sharded force + Euler."""
    fdt = np.float32(config.dt)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: ParticleState) -> ParticleState:
        acc = bh_sharded_accel(state.pos, state.mass, mesh, axis=axis,
                               config=config)
        vel = state.vel + acc * fdt
        pos = state.pos + vel * fdt
        return state.replace(pos=pos, vel=vel)

    return step

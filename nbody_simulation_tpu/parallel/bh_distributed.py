"""Fully distributed Barnes-Hut: ring-subtree sweep, no device holds full N.

Round-1's sharded BH (parallel/bh_sharded.py) all_gathered the complete
particle set to every device and built the full Morton tree replicated —
O(N) memory and an O(N log N) replicated sort per chip per step. This module
replaces it with a design where per-device memory is O(N/P):

- **Ownership.** Particles are globally Morton-ordered once at
  ``distribute_state`` (host-side sort, init time); device d owns the d-th
  contiguous run of Z-order leaves. Each step every device re-sorts ONLY its
  local shard (stale global order between host rebalances just loosens
  AABBs — the conservative walk opens more; physics is unchanged, exactly
  like the single-chip ``resort_every`` contract, ops/tree.py).
- **Local subtree.** Each device builds the flat BVH over its own shard —
  by construction the same nodes as the global tree's subtree covering its
  leaf range (binary combines of the same leaf blocks).
- **Ring sweep.** The per-device subtree block (leaf tiles + level
  summaries, ≈ the size of the particle shard itself) rotates P−1 times
  around the ICI ring (``ppermute``), the ring-attention dataflow of
  parallel/ring.py applied to *trees*: at each stage every device plans its
  own leaf groups against the visiting subtree (ops/traversal.plan_rows)
  and accumulates one Pallas force sweep. Communication overlaps compute —
  XLA schedules the next permute against the current sweep.
- **Distance-dependent capacities.** A visiting subtree that is ring-far is
  almost always accepted near its root, so far stages run with small
  frontier/leaf caps (overflow degrades to the node-COM approximation,
  never dropped force — ops/traversal.py contract). Ring-adjacent stages
  carry the full near-field caps because the Morton boundary leaves are
  spatial neighbors.

Equivalence: with caps ≥ level widths (no overflow) and frontier_cap ≥
n_leaves_global/2, the union of per-stage walks tests exactly the node set
of the single-chip walk, so the result matches a single chip to fp32
summation order (asserted at 1e-5 in tests/test_distributed.py).

Reference scale anchor: the traversal being sharded is
/root/reference/src/main.rs:348-386; the reference itself has no
distributed backend (SURVEY.md §2, parallelism table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.ops.morton import morton_keys, morton_sort_state
from nbody_simulation_tpu.ops.traversal import _grouped_force, plan_rows
from nbody_simulation_tpu.ops.tree import summarize_sorted
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.state import PAD_POS, ParticleState


def distribute_state(state: ParticleState, mesh: Mesh, config: SimConfig,
                     axis: str = AXIS) -> ParticleState:
    """Globally Morton-sort (host side, init/rebalance time) and shard.

    Each device receives an equal contiguous Z-order run of ceil(N/P) real
    particles, padded per device to L = (next power of two of leaf count) ×
    leaf_size so the local tree is a complete subtree. Device memory after
    this call is O(N/P); the host-side sort is the only O(N) step and runs
    outside the simulation loop.
    """
    n_dev = mesh.shape[axis]
    n = state.n_real
    hi, lo = morton_keys(jnp.asarray(np.asarray(state.pos[:n])),
                         jnp.asarray(np.asarray(state.mass[:n])),
                         config.world_size,
                         bits=config.resolved_morton_bits())
    order = np.lexsort((np.asarray(lo), np.asarray(hi)))
    pos = np.asarray(state.pos[:n])[order]
    vel = np.asarray(state.vel[:n])[order]
    mass = np.asarray(state.mass[:n])[order]

    per_dev = -(-n // n_dev)
    leaves = -(-per_dev // config.leaf_size)
    leaves = 1 << max(0, (leaves - 1).bit_length())
    local = max(leaves * config.leaf_size, config.leaf_size)

    def chunk(a, fill=0.0):
        out = np.full((n_dev * local,) + a.shape[1:], fill, np.float32)
        for d in range(n_dev):
            src = a[d * per_dev:(d + 1) * per_dev]
            out[d * local:d * local + len(src)] = src
        return out

    cpos = chunk(pos, PAD_POS)
    cvel = chunk(vel)
    cmass = chunk(mass)
    shp = NamedSharding(mesh, P(axis, None))
    shm = NamedSharding(mesh, P(axis))
    return ParticleState(jax.device_put(jnp.asarray(cpos), shp),
                         jax.device_put(jnp.asarray(cvel), shp),
                         jax.device_put(jnp.asarray(cmass), shm),
                         n_real=n)


def _stage_caps(config: SimConfig, dist: int, n_dev: int):
    """Frontier/leaf caps for a visiting subtree at ring distance ``dist``.

    Ring-adjacent subtrees (Morton neighbors — the spatial near field
    crosses their boundary) get the full caps; ring-far subtrees default to
    caps/4 / caps/8 (overflow → closest-first COM fallback on the farthest
    opened nodes, so far seams degrade smoothly). Set
    ``far_frontier_cap=frontier_cap`` etc. for bit-level parity with the
    single-chip walk at any distance.
    """
    fcap, lcap = config.resolved_caps()
    if dist <= 1 or dist == n_dev - 1 or n_dev <= 4:
        return fcap, lcap
    ff = config.far_frontier_cap or max(4, fcap // 4)
    fl = config.far_leaf_cap or max(2, lcap // 8)
    return min(fcap, ff), min(lcap, fl)


def bh_distributed_accel(pos: jax.Array, mass: jax.Array, mesh: Mesh,
                         axis: str = AXIS, config: SimConfig | None = None
                         ) -> jax.Array:
    """Distributed-BH acceleration for an already-distributed state.

    ``pos``/``mass`` are sharded over ``axis`` with each shard locally
    Morton-ordered (``distribute_state``). Returns accelerations in the SAME
    (sharded, sorted) order — the step keeps the state in sorted order, so
    no unsort/gather of full N ever happens.
    """
    cfg = config or SimConfig(force_path="bh")
    n_dev = mesh.shape[axis]
    interpret = jax.default_backend() == "cpu"
    mp = cfg.resolved_multipole()
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local(pos_l, mass_l):
        tree = summarize_sorted(pos_l, mass_l, leaf_size=cfg.leaf_size,
                                unweighted_leaf_com=cfg.unweighted_leaf_com)
        n_leaves, S, _ = tree.leaf_pos.shape
        pl_ = max(1, min(cfg.plan_leaves, n_leaves))
        while n_leaves % pl_:
            pl_ //= 2
        own = tree.levels[tree.depth - (pl_.bit_length() - 1)]
        tgt = tree.leaf_pos.reshape(n_leaves // pl_, pl_ * S, 2)

        acc = jnp.zeros((n_leaves // pl_, pl_ * S, 2), jnp.float32)
        visiting = tree
        for s in range(n_dev):
            if s > 0:
                visiting = jax.tree.map(
                    lambda x: jax.lax.ppermute(x, axis, perm), visiting)
            fcap, lcap = _stage_caps(cfg, min(s, n_dev - s), n_dev)
            planned = plan_rows(visiting, own, cfg.theta, fcap, lcap,
                                cfg.tree_arity, multipole=mp)
            acc = acc + _grouped_force(
                tgt, *planned[:3], softening2=cfg.softening2, rcp=cfg.resolved_rcp(bh=True),
                interpret=interpret,
                src_q=planned[3:] if mp == 2 else None)
        return acc.reshape(n_leaves * S, 2)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis)),
                      out_specs=P(axis, None), check_vma=False)
    return f(pos, mass)


def make_distributed_bh_step(mesh: Mesh, config: SimConfig,
                             axis: str = AXIS):
    """Full multi-chip distributed-BH step: local re-sort → local subtree →
    ring-subtree force sweep → semi-implicit Euler. One jitted, donated
    computation; per-device memory O(N/P) (one visiting subtree in flight).
    """
    cfg = config
    n_dev = mesh.shape[axis]
    fdt = np.float32(cfg.dt)
    mbits = cfg.resolved_morton_bits()

    def local_sort(pos_l, vel_l, mass_l):
        return morton_sort_state(pos_l, vel_l, mass_l, cfg.world_size,
                                 bits=mbits)

    sort_sharded = jax.shard_map(
        local_sort, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis)))

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: ParticleState) -> ParticleState:
        spos, svel, smass = sort_sharded(state.pos, state.vel, state.mass)
        acc = bh_distributed_accel(spos, smass, mesh, axis=axis, config=cfg)
        vel = svel + acc * fdt
        pos = spos + vel * fdt
        return state.replace(pos=pos, vel=vel, mass=smass)

    return step

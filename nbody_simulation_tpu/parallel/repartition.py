"""Collective on-device repartition: global Morton sort without any host.

``bh_distributed.rebalance_state`` round-trips the full state through one
host's NumPy (O(N) host memory + tunnel transfer — a multi-second stall at
N=16.7M). This module replaces it with a jitted, O(N/P)-per-device
collective equivalent, and is also what lets multi-host runs build the
canonical distributed layout without ANY process ever materializing global
N (parallel/multihost.py).

Two phases, both static-shaped under ``shard_map`` (P devices × L local
rows):

1. **Global merge-split sort** (block odd-even transposition): P rounds; in
   round r, devices pair up ((0,1),(2,3),… then (1,2),(3,4),…), exchange
   their full local blocks over ICI (``ppermute``), each sorts the merged
   2L rows by the key triple ``(morton_hi, morton_lo, gid)`` and keeps the
   lower (left partner) or upper (right partner) half. Blocks stay locally
   sorted between rounds, and P rounds of block odd-even transposition sort
   any input globally [Knuth, TAOCP vol. 3, §5.3.4 / Scherson & Sen's
   shear-sort bound for the 1-D case]. ``gid`` — the pre-sort device-major
   global row index — breaks Morton-key ties in exactly the order NumPy's
   stable lexsort sees them, so the resulting permutation is bitwise THE
   one ``rebalance_state`` computes on the host. Padding rows carry
   ``PAD_KEY`` in both words (ops/morton.py) and sink to the global tail.

2. **Even spread** (ring pull): the sorted global prefix of n live rows is
   re-cut into P runs of ``per = ceil(n/P)`` — device d takes global ranks
   [d·per, (d+1)·per) into its local slots [0, per), padding after — the
   exact real-first layout ``distribute_state`` builds. P ring rotations of
   the sorted blocks; at each stage a device copies out whichever of its
   wanted ranks the visiting block covers (every rank is seen exactly
   once). ``n`` is data-dependent, but only ever used as gather indices and
   masks — shapes stay static, so the whole repartition is one compiled
   program reused at every rebalance cadence.

Per-device cost: P rounds × one 2L-row multi-payload sort + 2·P block
transfers (≈ 2·N/P·28 B over ICI) — at the flagship shard (P=16, L=1M)
~56 MB of ICI traffic and 16 local sorts, microseconds-to-milliseconds
scale, vs a ~335 MB host round-trip for the NumPy path.

Equality with the host path is asserted bitwise in
tests/test_repartition.py. Reference anchor: the reference's only spatial
repartition is the in-place BVH build permutation
(/root/reference/src/bvh_tree.rs:57-96, single-threaded); a distributed
equivalent has no counterpart there (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.ops.morton import morton_keys
from nbody_simulation_tpu.parallel.mesh import AXIS
from nbody_simulation_tpu.state import PAD_POS, ParticleState


def _merge_split_sort(cols, keys, axis: str, n_dev: int):
    """Phase 1: block odd-even transposition sort of (keys, cols) rows.

    ``keys``: tuple of int32 (L,) arrays, lexicographic; ``cols``: payload
    (L,) / (L,) float columns. Blocks must arrive locally sorted. Returns
    the globally sorted (keys, cols).
    """
    my = jax.lax.axis_index(axis)
    ops = tuple(keys) + tuple(cols)
    nk = len(keys)
    L = ops[0].shape[0]
    for r in range(n_dev):
        # Round r pairs (i, i+1) for i ≡ r (mod 2) — a static pairing.
        pairs = []
        for i in range(r % 2, n_dev - 1, 2):
            pairs += [(i, i + 1), (i + 1, i)]
        if not pairs:
            continue
        recv = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis, pairs), ops)
        direction = jnp.where((my % 2) == (r % 2), 1, -1)
        partner = my + direction
        valid = (partner >= 0) & (partner < n_dev)
        merged = jax.lax.sort(
            tuple(jnp.concatenate([a, b]) for a, b in zip(ops, recv)),
            num_keys=nk, is_stable=True)
        keep_lower = direction > 0
        halves = tuple(
            jnp.where(keep_lower, m[:L], m[L:]) for m in merged)
        ops = tuple(jnp.where(valid, h, o) for h, o in zip(halves, ops))
    return ops[:nk], ops[nk:]


def _even_spread(cols, live, axis: str, n_dev: int, fills):
    """Phase 2: re-cut the sorted global prefix of live rows into P equal
    real-first runs. ``cols`` globally sorted (live first), ``live`` bool
    (L,). Returns columns in the distribute_state layout."""
    my = jax.lax.axis_index(axis)
    L = live.shape[0]
    n = jax.lax.psum(jnp.sum(live.astype(jnp.int32)), axis)
    per = (n + n_dev - 1) // n_dev
    j = jnp.arange(L, dtype=jnp.int32)
    r = my * per + j                      # wanted global rank per out slot
    out = tuple(jnp.full((L,) + c.shape[1:], f, c.dtype)
                for c, f in zip(cols, fills))
    back = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    block = cols
    for s in range(n_dev):
        if s > 0:
            block = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, back), block)
        src = (my + s) % n_dev            # origin device of this block
        want = (j < per) & (r < n) & (r // L == src)
        idx = jnp.clip(r - src * L, 0, L - 1)
        out = tuple(
            jnp.where(
                want.reshape((L,) + (1,) * (o.ndim - 1)),
                b[idx], o)
            for b, o in zip(block, out))
    return out


def make_collective_rebalance(mesh: Mesh, config: SimConfig,
                              axis: str = AXIS):
    """Build the jitted collective repartition for a fixed mesh/layout.

    Returns ``fn(state) -> state``: same padded shapes in and out (the jit
    cache survives every rebalance), output bitwise equal to
    ``rebalance_state`` whenever the host path would choose the same local
    size — i.e. whenever the input already has the ``distribute_state``
    layout for this mesh and particle count.
    """
    cfg = config
    n_dev = mesh.shape[axis]
    mbits = cfg.resolved_morton_bits()

    def local(pos_l, vel_l, mass_l):
        L = pos_l.shape[0]
        my = jax.lax.axis_index(axis)
        hi, lo = morton_keys(pos_l, mass_l, cfg.world_size, bits=mbits)
        gid = my * L + jnp.arange(L, dtype=jnp.int32)
        # Local pre-sort so merge-split rounds always merge sorted runs.
        cols = (pos_l[:, 0], pos_l[:, 1], vel_l[:, 0], vel_l[:, 1], mass_l)
        srt = jax.lax.sort((hi, lo, gid) + cols, num_keys=3, is_stable=True)
        keys, cols = srt[:3], srt[3:]
        keys, cols = _merge_split_sort(cols, keys, axis, n_dev)
        live = cols[4] > 0
        px, py, vx, vy, m = _even_spread(
            cols, live, axis, n_dev,
            fills=(PAD_POS, PAD_POS, 0.0, 0.0, 0.0))
        return (jnp.stack([px, py], axis=1), jnp.stack([vx, vy], axis=1), m)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
        check_vma=False))

    def rebalance(state: ParticleState) -> ParticleState:
        pos, vel, mass = f(state.pos, state.vel, state.mass)
        return state.replace(pos=pos, vel=vel, mass=mass)

    return rebalance


@functools.lru_cache(maxsize=16)
def _cached(mesh: Mesh, config: SimConfig, axis: str):
    return make_collective_rebalance(mesh, config, axis=axis)


def collective_rebalance(state: ParticleState, mesh: Mesh,
                         config: SimConfig, axis: str = AXIS
                         ) -> ParticleState:
    """One-shot wrapper around ``make_collective_rebalance`` (memoized on
    (mesh, config), so repeated calls reuse the compiled program)."""
    return _cached(mesh, config, axis)(state)

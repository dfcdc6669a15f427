"""Microbenchmark the planner's component ops at N=1M shapes on TPU."""
from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

G, F, W = 2048, 16, 8192  # groups, frontier, deepest interior level width


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(fn, *args, reps=50):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1e3


rng = np.random.default_rng(0)
cand = jnp.asarray(rng.integers(0, W, (G, 2 * F)), jnp.int32)
packed = jnp.asarray(rng.normal(size=(W, 8)), jnp.float32)
d2 = jnp.asarray(rng.normal(size=(G, 2 * F)) ** 2, jnp.float32)
opened = jnp.asarray(rng.random((G, 2 * F)) < 0.3)

t_gather = timeit(jax.jit(lambda p, c: p[c]), packed, cand)


@jax.jit
def onehot_gather(p, c):
    oh = (c[..., None] == jnp.arange(W, dtype=jnp.int32)).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        oh.reshape(G * 2 * F, W), p.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(G, 2 * F, 8)


t_onehot = timeit(onehot_gather, packed, cand)

t_argsort = timeit(jax.jit(lambda d, o: jnp.argsort(
    jnp.where(o, d, 3e38), axis=1)), d2, opened)


@jax.jit
def sort_payload(d, o, c):
    key = jnp.where(o, d, 3e38)
    _, cs, os_ = jax.lax.sort((key, c, o.astype(jnp.int32)), num_keys=1)
    return cs, os_


t_sortp = timeit(sort_payload, d2, opened, cand)


@jax.jit
def compact(flags, values, cap=F):
    g, _ = flags.shape
    slot = jnp.cumsum(flags, axis=1) - 1
    store = flags & (slot < cap)
    rows = jnp.arange(g, dtype=jnp.int32)[:, None] * cap
    flat_idx = jnp.where(store, rows + slot, g * cap)
    lists = (jnp.zeros((g * cap,), jnp.int32)
             .at[flat_idx.ravel()].set(values.ravel(), mode="drop")
             .reshape(g, cap))
    valid = (jnp.zeros((g * cap,), dtype=bool)
             .at[flat_idx.ravel()].set(store.ravel(), mode="drop")
             .reshape(g, cap))
    return lists, valid


t_compact = timeit(compact, opened, cand)

# Leaf gather at 1M shapes: (G, L=32) leaf ids -> (G, L, S=64, 2) positions.
leaf_pos = jnp.asarray(rng.normal(size=(16384, 64, 2)), jnp.float32)
leaf_ids = jnp.asarray(rng.integers(0, 16384, (G, 32)), jnp.int32)
t_leafgather = timeit(jax.jit(lambda p, i: p[i]), leaf_pos, leaf_ids)

# Full-state permute: argsort+gather vs multi-payload sort at N=1M.
N = 1 << 20
keys = jnp.asarray(rng.integers(0, 2**30, N), jnp.int32)
pos = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
vel = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
mass = jnp.asarray(rng.random(N), jnp.float32)


@jax.jit
def perm_gather(k, p, v, m):
    order = jnp.argsort(k, stable=True)
    return p[order], v[order], m[order]


@jax.jit
def perm_sortpayload(k, p, v, m):
    out = jax.lax.sort((k, p[:, 0], p[:, 1], v[:, 0], v[:, 1], m),
                       num_keys=1, is_stable=True)
    return out


t_perm_gather = timeit(perm_gather, keys, pos, vel, mass, reps=10)
t_perm_sort = timeit(perm_sortpayload, keys, pos, vel, mass, reps=10)
t_sort_only = timeit(jax.jit(lambda k: jnp.argsort(k, stable=True)), keys,
                     reps=10)

print(json.dumps({
    "gather_2048x32_from_8192x8_ms": round(t_gather, 3),
    "onehot_matmul_gather_ms": round(t_onehot, 3),
    "argsort_2048x32_ms": round(t_argsort, 3),
    "sort_payload_2048x32_ms": round(t_sortp, 3),
    "compact_scatter_ms": round(t_compact, 3),
    "leaf_gather_2048x32x64x2_ms": round(t_leafgather, 3),
    "permute3_argsort_gather_1M_ms": round(t_perm_gather, 3),
    "permute3_sort_payload_1M_ms": round(t_perm_sort, 3),
    "argsort_1M_ms": round(t_sort_only, 3),
}), flush=True)

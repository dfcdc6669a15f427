"""Decompose + attack the raster cost at the flagship shard (round-5).

probe_render.py measured the dense raster at 34 ms @1M — bigger than the
whole BH step body (~15 ms). This probe:

1. times each accumulate_pixels component (3 scatters + 1 npix gather);
2. a PACKED variant: last-light index and its velocity tint ride ONE
   scatter-max as idx·256+vterm (idx dominates the ordering; a given idx
   has one vterm, so max picks the same winner) — 3 scatters, no gather;
3. a SORTED variant: lex-sort particles by (pix, light, idx); per-pixel
   reductions become cumsum/cummax diffs at run ends, and the final
   scatters have SORTED UNIQUE indices (indices_are_sorted=True,
   unique_indices=True — the XLA TPU scatter fast path).

Run (real TPU, idle): PYTHONPATH=/root/repo python benchmarks/probe_raster.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.models import uniform_disc
from nbody_simulation_tpu.ops.raster import accumulate_pixels, render_frame

N = 1_048_576
WORLD, RS, HW = 100_000.0, 1250, 10.0
NPIX = RS * RS


def timeit(fn, reps=16, warm=3):
    for _ in range(warm):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / reps * 1e3


def pix_of(pos):
    x, y = pos[:, 0], pos[:, 1]
    in_b = (y < WORLD) & (x < WORLD) & (y >= 0.0) & (x >= 0.0)
    scale = int(WORLD) // RS
    cx = (x.astype(jnp.uint32) // scale).astype(jnp.int32)
    cy = (y.astype(jnp.uint32) // scale).astype(jnp.int32)
    return jnp.where(in_b, cy * RS + cx, NPIX)


def main() -> None:
    st = uniform_disc(N, seed=0)
    pos, vel, mass = jnp.asarray(st.pos), jnp.asarray(st.vel), jnp.asarray(st.mass)

    # -- components of the current formulation --------------------------
    @jax.jit
    def comp_pix(pos):
        return pix_of(pos)

    @jax.jit
    def comp_green(pos, mass):
        pix = pix_of(pos)
        heavy = mass > HW
        return jnp.zeros(NPIX, jnp.int32).at[pix].max(
            heavy.astype(jnp.int32), mode="drop")

    @jax.jit
    def comp_count(pos, mass):
        pix = pix_of(pos)
        light = ~(mass > HW)
        return jnp.zeros(NPIX, jnp.int32).at[pix].add(
            light.astype(jnp.int32), mode="drop")

    @jax.jit
    def comp_last(pos, mass):
        pix = pix_of(pos)
        light = ~(mass > HW)
        idx = jnp.arange(N, dtype=jnp.int32)
        return jnp.full(NPIX, -1, jnp.int32).at[pix].max(
            jnp.where(light, idx, -1), mode="drop")

    @jax.jit
    def comp_full(pos, vel, mass):
        return accumulate_pixels(pos, vel, mass, WORLD, RS, HW)

    print(f"pix only: {timeit(lambda: comp_pix(pos)):.2f} ms", flush=True)
    print(f"green scatter-max: {timeit(lambda: comp_green(pos, mass)):.2f} ms", flush=True)
    print(f"count scatter-add: {timeit(lambda: comp_count(pos, mass)):.2f} ms", flush=True)
    print(f"last scatter-max: {timeit(lambda: comp_last(pos, mass)):.2f} ms", flush=True)
    print(f"full accumulate_pixels: {timeit(lambda: comp_full(pos, vel, mass)):.2f} ms", flush=True)

    # -- packed variant: 3 scatters, no npix gather ----------------------
    @jax.jit
    def packed(pos, vel, mass):
        pix = pix_of(pos)
        heavy = mass > HW
        light = ~heavy
        idx = jnp.arange(N, dtype=jnp.int32)
        speed = (jnp.abs(vel[:, 0]) + jnp.abs(vel[:, 1])) * jnp.float32(10.0)
        speed = jnp.where(jnp.isnan(speed), 0.0, speed)
        v8 = jnp.clip(speed, 0.0, 255.0).astype(jnp.int32)
        vterm = jnp.int32(0x10) + jnp.minimum(v8, jnp.int32(0xEF))
        lastpack = (jnp.full(NPIX, -1, jnp.int32).at[pix].max(
            jnp.where(light, idx * 256 + vterm, -1), mode="drop"))
        green = jnp.zeros(NPIX, jnp.int32).at[pix].max(
            heavy.astype(jnp.int32), mode="drop")
        count = jnp.zeros(NPIX, jnp.int32).at[pix].add(
            light.astype(jnp.int32), mode="drop")
        last = jnp.where(lastpack >= 0, lastpack // 256, -1)
        vlast = jnp.where(lastpack >= 0, lastpack % 256, 0)
        return green, count, last, vlast

    print(f"packed (3 scatters, no gather): {timeit(lambda: packed(pos, vel, mass)):.2f} ms", flush=True)

    # -- sorted variant ---------------------------------------------------
    @jax.jit
    def sorted_acc(pos, vel, mass):
        pix = pix_of(pos)
        heavy = mass > HW
        light = ~heavy
        idx = jnp.arange(N, dtype=jnp.int32)
        speed = (jnp.abs(vel[:, 0]) + jnp.abs(vel[:, 1])) * jnp.float32(10.0)
        speed = jnp.where(jnp.isnan(speed), 0.0, speed)
        v8 = jnp.clip(speed, 0.0, 255.0).astype(jnp.int32)
        vterm = jnp.int32(0x10) + jnp.minimum(v8, jnp.int32(0xEF))
        spix, slight, sidx, svterm, sheavy = jax.lax.sort(
            (pix, light.astype(jnp.int32), idx, vterm,
             heavy.astype(jnp.int32)), num_keys=3)
        run_end = jnp.concatenate([spix[1:] != spix[:-1],
                                   jnp.ones(1, bool)])
        ch = jnp.cumsum(sheavy)
        cl = jnp.cumsum(slight)
        # previous run's inclusive csum at each position: cummax of the
        # run-end-masked csum, shifted right by one.
        def prev_at_end(c):
            d = jnp.where(run_end, c, 0)
            return jnp.concatenate([jnp.zeros(1, c.dtype),
                                    jax.lax.cummax(d)[:-1]])
        nh = ch - prev_at_end(ch)
        nl = cl - prev_at_end(cl)
        tgt = jnp.where(run_end, spix, NPIX)
        kw = dict(mode="drop", indices_are_sorted=True, unique_indices=True)
        green = jnp.zeros(NPIX, jnp.int32).at[tgt].set(
            (nh > 0).astype(jnp.int32), **kw)
        count = jnp.zeros(NPIX, jnp.int32).at[tgt].set(nl, **kw)
        last = jnp.full(NPIX, -1, jnp.int32).at[tgt].set(
            jnp.where(slight > 0, sidx, -1), **kw)
        vlast = jnp.zeros(NPIX, jnp.int32).at[tgt].set(
            jnp.where(slight > 0, svterm, 0), **kw)
        return green, count, last, vlast

    print(f"sorted (1 sort + 4 sorted-unique scatters): {timeit(lambda: sorted_acc(pos, vel, mass)):.2f} ms", flush=True)

    # parity check vs the reference formulation
    a = jax.tree_util.tree_map(np.asarray, comp_full(pos, vel, mass))
    b = jax.tree_util.tree_map(np.asarray, sorted_acc(pos, vel, mass))
    c = jax.tree_util.tree_map(np.asarray, packed(pos, vel, mass))
    for name, x, y in zip(("green", "count", "last", "vlast"), a, b):
        assert np.array_equal(x, y), f"sorted mismatch in {name}"
    for name, x, y in zip(("green", "count", "last", "vlast"), a, c):
        assert np.array_equal(x, y), f"packed mismatch in {name}"
    print("parity: sorted & packed == reference accumulate_pixels", flush=True)

    # sort-only cost for attribution
    @jax.jit
    def sort_only(pos, mass):
        pix = pix_of(pos)
        idx = jnp.arange(N, dtype=jnp.int32)
        return jax.lax.sort((pix, idx), num_keys=1)

    print(f"sort only (1 key + 1 payload): {timeit(lambda: sort_only(pos, mass)):.2f} ms", flush=True)


def probe_two_scatter() -> None:
    """2-scatter variant: ONE scatter-max carries green+last+vlast
    (heavy -> 1<<30, which dominates; light -> idx*256+vterm), ONE
    scatter-add carries count. Frame-level pixel-exact: light info at a
    green pixel is shadowed, but colorize ignores it there."""
    st = uniform_disc(N, seed=0)
    pos, vel, mass = (jnp.asarray(st.pos), jnp.asarray(st.vel),
                      jnp.asarray(st.mass))

    @jax.jit
    def two(pos, vel, mass):
        pix = pix_of(pos)
        heavy = mass > HW
        light = ~heavy
        idx = jnp.arange(N, dtype=jnp.int32)
        speed = (jnp.abs(vel[:, 0]) + jnp.abs(vel[:, 1])) * jnp.float32(10.0)
        speed = jnp.where(jnp.isnan(speed), 0.0, speed)
        v8 = jnp.clip(speed, 0.0, 255.0).astype(jnp.int32)
        vterm = jnp.int32(0x10) + jnp.minimum(v8, jnp.int32(0xEF))
        key = jnp.where(heavy, jnp.int32(1 << 30), idx * 256 + vterm)
        mx = jnp.full(NPIX, -1, jnp.int32).at[pix].max(key, mode="drop")
        count = jnp.zeros(NPIX, jnp.int32).at[pix].add(
            light.astype(jnp.int32), mode="drop")
        green = (mx >= (1 << 30)).astype(jnp.int32)
        has_light = (mx >= 0) & (mx < (1 << 30))
        last = jnp.where(has_light, mx // 256, -1)
        vlast = jnp.where(has_light, mx % 256, 0)
        return green, count, last, vlast

    print(f"two-scatter: {timeit(lambda: two(pos, vel, mass)):.2f} ms",
          flush=True)
    # frame-level parity vs reference colorize
    from nbody_simulation_tpu.ops.raster import colorize_pixels
    a = accumulate_pixels(pos, vel, mass, WORLD, RS, HW)
    fa = np.asarray(colorize_pixels(a[0], a[1], a[3], RS))
    b = two(pos, vel, mass)
    fb = np.asarray(colorize_pixels(b[0], b[1], b[3], RS))
    assert np.array_equal(fa, fb), "two-scatter frame mismatch"
    print("two-scatter frame parity ok", flush=True)

    from nbody_simulation_tpu.models import galaxy
    g = galaxy(seed=0)
    ng = g.pos.shape[0]

    @jax.jit
    def two_g(pos, vel, mass):
        pix = pix_of(pos)
        heavy = mass > HW
        light = ~heavy
        idx = jnp.arange(ng, dtype=jnp.int32)
        speed = (jnp.abs(vel[:, 0]) + jnp.abs(vel[:, 1])) * jnp.float32(10.0)
        speed = jnp.where(jnp.isnan(speed), 0.0, speed)
        v8 = jnp.clip(speed, 0.0, 255.0).astype(jnp.int32)
        vterm = jnp.int32(0x10) + jnp.minimum(v8, jnp.int32(0xEF))
        key = jnp.where(heavy, jnp.int32(1 << 30), idx * 256 + vterm)
        mx = jnp.full(NPIX, -1, jnp.int32).at[pix].max(key, mode="drop")
        count = jnp.zeros(NPIX, jnp.int32).at[pix].add(
            light.astype(jnp.int32), mode="drop")
        return mx, count

    gp, gv, gm = jnp.asarray(g.pos), jnp.asarray(g.vel), jnp.asarray(g.mass)
    print(f"two-scatter @galaxy ({ng}): "
          f"{timeit(lambda: two_g(gp, gv, gm)):.2f} ms", flush=True)


if __name__ == "__main__":
    probe_two_scatter()

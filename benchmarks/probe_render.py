"""Measure the render stage at flagship scale — closes the config-5
accounting gap (round-4 verdict Missing #1).

The reference's 60-steps/s loop is sim + draw + present
(/root/reference/src/main.rs:41-72,143-162); the config-5 projection in
benchmarks/suite.py timed the per-chip step BODY only. This probe measures
what a per-step render adds at the 1M-particle per-chip shard:

1. ``render_frame`` (dense 1250² RGBA) as its own dispatch at N=1M;
2. the same raster FUSED into the flagship step body (the marginal cost
   inside one jit — what the real loop pays, since XLA overlaps the
   scatter DMAs with the sweep);
3. the sparse variant (``render_frame_sparse``) at the galaxy N;
4. the ICI cost model of the distributed merge (parallel/raster.py):
   4 npix-i32 buffers through pmax/psum ring all-reduces at 2(P-1)/P ×
   size per device — reported as serialized wire-time at 45 GB/s/dir,
   the same conservative figure as suite config 5.

Run (real TPU, idle): PYTHONPATH=/root/repo python benchmarks/probe_render.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_simulation_tpu.config import SimConfig
from nbody_simulation_tpu.models import galaxy, uniform_disc
from nbody_simulation_tpu.ops.raster import render_frame, render_frame_sparse

P, N = 16, 16_777_216
L = N // P


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


def main() -> None:
    cfg = SimConfig()
    rng = np.random.default_rng(0)
    st = uniform_disc(L, seed=0)
    pos = jnp.asarray(st.pos)
    vel = jnp.asarray(st.vel)
    mass = jnp.asarray(st.mass)

    ms_dense = timeit(lambda: render_frame(pos, vel, mass))
    print(f"dense render_frame @N={L}: {ms_dense:.2f} ms", flush=True)

    g = galaxy(seed=0)
    gp, gv, gm = jnp.asarray(g.pos), jnp.asarray(g.vel), jnp.asarray(g.mass)
    ms_g = timeit(lambda: render_frame(gp, gv, gm))
    print(f"dense render_frame @galaxy N={g.n}: {ms_g:.2f} ms", flush=True)
    cap = 1 << int(np.ceil(np.log2(g.n)))
    ms_gs = timeit(lambda: render_frame_sparse(gp, gv, gm, cap))
    print(f"sparse render_frame @galaxy (cap={cap}): {ms_gs:.2f} ms",
          flush=True)

    # Marginal cost of the raster FUSED into a flagship-shaped step: a
    # cheap-force step (the raster's overlap partner hardly matters — we
    # difference two variants of the SAME body) vs the same + raster.
    from nbody_simulation_tpu.ops.raster import (accumulate_pixels,
                                                 colorize_pixels)

    def step(pos, vel, mass, render):
        acc = -pos * jnp.float32(1e-6)  # placeholder force (cost ~0)
        vel = vel + acc * jnp.float32(cfg.dt)
        pos = pos + vel * jnp.float32(cfg.dt)
        if render:
            green, count, _, vlast = accumulate_pixels(
                pos, vel, mass, cfg.world_size, cfg.render_size,
                cfg.heavy_weight)
            frame = colorize_pixels(green, count, vlast, cfg.render_size)
            return pos, vel, mass, frame
        return pos, vel, mass

    s0 = jax.jit(functools.partial(step, render=False))
    s1 = jax.jit(functools.partial(step, render=True))
    ms0 = timeit(lambda: s0(pos, vel, mass))
    ms1 = timeit(lambda: s1(pos, vel, mass))
    print(f"fused step+raster marginal @N={L}: {ms1 - ms0:.2f} ms "
          f"({ms0:.2f} -> {ms1:.2f})", flush=True)

    # Distributed merge wire time (parallel/raster.py): green/count/glast
    # pmax/psum all-reduce + the masked vlast psum = 4 npix-i32 ring
    # all-reduces, each moving 2(P-1)/P × npix × 4 B per device.
    npix = cfg.render_size * cfg.render_size
    wire = 4 * 2 * (P - 1) / P * npix * 4 / 45e9
    print(f"merge all-reduce wire time (P={P}, 4 bufs, 45 GB/s/dir): "
          f"{wire * 1e3:.2f} ms", flush=True)
    # reduce_scatter+slice-colorize alternative: (P-1)/P × size each.
    wire_rs = 4 * (P - 1) / P * npix * 4 / 45e9
    print(f"reduce_scatter alternative wire time: {wire_rs * 1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

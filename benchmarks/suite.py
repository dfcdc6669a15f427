"""Benchmark suite — the five BASELINE.json configs.

Run: ``python benchmarks/suite.py [--configs 0,1,2,3,4,5,6]``
Prints one JSON line per config. bench.py (the driver headline) is config 4.

0. The reference's own workload: the ~151k-particle galaxy at θ=50 → ups
6. N=1,048,576 Barnes-Hut θ=50 → particle-steps/sec (the BASELINE.json
   headline's second metric)

1. N=4,096 random disc, direct O(N²), fixed-dt integrator → steps/sec
2. N=65,536 Plummer-like cluster, BH θ=0.5 → force error + energy drift
   vs direct sum over 50 steps
3. N=262,144, BVH force path, per-step rebuild (resort_every=1) → steps/sec
4. N=1,048,576 blocked all-pairs Pallas kernel → pairwise interactions/sec
5. N=16,777,216 sharded ring all-pairs on v5e-16 — requires 16 chips; on a
   single-chip/virtual mesh this config validates compile+execute on tiny
   shapes (the driver's dryrun covers the same path).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Optional SimConfig.rcp override for every BH config (--rcp flag):
# lets guard/reciprocal experiments ("approx+clamp", ...) run the exact
# suite workloads without editing the configs.
RCP: str | None = None


def _rcp_kw():
    return {"rcp": RCP} if RCP else {}


def sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x if not hasattr(x, "pos") else x.pos))


def emit(config, metric, value, unit, **extra):
    print(json.dumps({"config": config, "metric": metric,
                      "value": value, "unit": unit, **extra}), flush=True)


def config0():
    import numpy as np_
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import World, galaxy
    from nbody_simulation_tpu.ops.raster import render_frame_sparse, sparse_to_frame
    # sweep_buckets: measured winner on the galaxy's occupancy skew —
    # 408.8 → 469.0 ups (1.15×), bitwise-identical forces
    # (benchmarks/probe_bucket_sweep.py, 2026-08-20).
    cfg = SimConfig(force_path="bh", sweep_buckets=(0.625, 0.125),
                    **_rcp_kw())
    w = World(galaxy(seed=0), cfg)
    w.run(17); sync(w.state)   # ≥ resort_every+1: warm BOTH step variants
    # 256-step window: at ~2 ms device steps a 64-step window is inside
    # the axon tunnel's dispatch-jitter band (measured 242-450 ups for
    # identical code, 2026-08-20); 256 amortizes it.
    t0 = time.perf_counter(); w.run(256); sync(w.state)
    dt = (time.perf_counter() - t0) / 256
    emit(0, "reference galaxy (151k, theta=50) ups", 1 / dt, "steps/s")
    # The reference's loop is sim + draw + present (src/main.rs:41-72,
    # 143-162) with fps decoupled from ups by the lossy frame channel.
    # This row renders EVERY step (fps == ups — the worst case the lossy
    # queue protects against) including the sparse host readback the
    # engine's snapshot pipeline performs, so the number is the full
    # per-step loop cost, not the step body alone (round-4 verdict item 1).
    cap = 1 << int(np_.ceil(np_.log2(w.state.n)))

    def step_render():
        w.run(1)
        idx, vals = render_frame_sparse(
            w.state.pos, w.state.vel, w.state.mass, cap,
            world_size=cfg.world_size, render_size=cfg.render_size,
            heavy_weight=cfg.heavy_weight)
        return sparse_to_frame(idx, vals, cfg.render_size)

    for _ in range(3):
        step_render()
    t0 = time.perf_counter()
    for _ in range(32):
        frame = step_render()
    dt_r = (time.perf_counter() - t0) / 32
    assert frame.shape == (cfg.render_size, cfg.render_size, 4)
    emit(0, "reference galaxy ups incl. per-step render + host readback",
         1 / dt_r, "steps/s", render_ms=round((dt_r - dt) * 1e3, 2))
    # Companion: sim + draw with the frame LEFT ON DEVICE (the readback
    # above is ~2 MB/frame over the axon tunnel — a per-frame cost a real
    # TPU host pays over PCIe at ~100× the bandwidth; this row is the
    # device-side render loop cost, steps and draws dispatched
    # back-to-back, ONE closing sync).
    import jax as _jax
    from nbody_simulation_tpu.ops.raster import (accumulate_pixels,
                                                 colorize_pixels)

    @_jax.jit
    def draw(pos, vel, mass):
        g, c, _, vl = accumulate_pixels(pos, vel, mass, cfg.world_size,
                                        cfg.render_size, cfg.heavy_weight)
        return colorize_pixels(g, c, vl, cfg.render_size)

    for _ in range(3):
        w.run(1)
        fr = draw(w.state.pos, w.state.vel, w.state.mass)
    sync(w.state); sync(fr.astype(np_.float32))
    t0 = time.perf_counter()
    for _ in range(128):
        w.run(1)
        fr = draw(w.state.pos, w.state.vel, w.state.mass)
    sync(w.state); sync(fr.astype(np_.float32))
    dt_d = (time.perf_counter() - t0) / 128
    emit(0, "reference galaxy ups incl. per-step on-device render "
            "(frame resident; draw cost = render_ms)",
         1 / dt_d, "steps/s", render_ms=round((dt_d - dt) * 1e3, 2))


def config6():
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import World, uniform_disc
    n = 1_048_576
    w = World(uniform_disc(n, seed=0), SimConfig(force_path="bh", **_rcp_kw()))
    w.run(17); sync(w.state)   # ≥ resort_every+1: warm BOTH step variants
    t0 = time.perf_counter(); w.run(32); sync(w.state)
    dt = (time.perf_counter() - t0) / 32
    emit(6, "BH theta=50 N=1M particle-steps/sec", n / dt, "particle-steps/s",
         steps_per_sec=1 / dt)


def config1():
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import World, uniform_disc
    w = World(uniform_disc(4096, seed=0), SimConfig(force_path="pallas"))
    w.run(5); sync(w.state)
    t0 = time.perf_counter(); w.run(100); sync(w.state)
    dt = (time.perf_counter() - t0) / 100
    emit(1, "direct N=4096 steps/sec", 1 / dt, "steps/s")
    # Companion number: per-step DEVICE time from a 1,000-step back-to-back
    # dispatched window. The 100-step wall number above is tunnel-dispatch-
    # latency bound at this N (measured 725→2311→2085 steps/s across
    # rounds — a 3× band that hides real regressions); amortizing dispatch
    # over 1,000 async steps with ONE closing sync makes this the
    # regression-detecting metric (stable within ~5% across runs).
    w.run(5); sync(w.state)
    t0 = time.perf_counter(); w.run(1000); sync(w.state)
    dt_dev = (time.perf_counter() - t0) / 1000
    emit(1, "direct N=4096 per-step device time (1000-step window)",
         dt_dev * 1e3, "ms/step", steps_per_sec=1 / dt_dev)


def config2():
    import jax.numpy as jnp
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import World, plummer
    from nbody_simulation_tpu.ops.force import direct_accel
    from nbody_simulation_tpu.ops.traversal import bh_accel

    # Quality path: bh_accel auto-resolves θ=0.5 to 24-bit Morton keys (the
    # Plummer core keeps subdividing instead of collapsing into 3-unit cells)
    # and quadrupole node moments (monopole acceptance error at θ=0.5 is
    # inherently ~1.6e-3; the quadrupole correction lands ~1e-4 median —
    # under the <1e-3 BASELINE north star).
    st = plummer(65_536, seed=0)
    # Force error at t=0 vs direct sum (physics-quality COMs).
    want = np.asarray(direct_accel(st.pos, st.mass, row_chunk=4096))
    got = np.asarray(bh_accel(st.pos, st.mass, theta=0.5,
                              unweighted_leaf_com=False))
    rel = (np.linalg.norm(got - want, axis=1)
           / np.maximum(np.linalg.norm(want, axis=1), 1e-12))
    emit(2, "BH theta=0.5 force rel err (median)", float(np.median(rel)), "")

    # TOTAL-energy drift (KE + counterpart pair potential, ops/energy.py —
    # the reference's own law is non-conservative, see that module) of
    # direct AND BH over 50 steps, plus how closely BH tracks direct. Both
    # trajectories drift (Euler + non-conservative law); the fidelity claim
    # is that the BH approximation does not ADD drift.
    from nbody_simulation_tpu.ops.energy import total_energy
    drifts = {}
    for path, kw in [("direct", {}),
                     ("bh", dict(theta=0.5, unweighted_leaf_com=False,
                                 plan_leaves=1))]:
        w = World(plummer(65_536, seed=0),
                  SimConfig(force_path=path, **kw))
        e0 = float(total_energy(w.state))
        w.run(50); sync(w.state)
        drifts[path] = (float(total_energy(w.state)) - e0) / abs(e0)
        emit(2, f"{path} total-energy drift after 50 steps",
             drifts[path], "dE/|E0|")
    emit(2, "BH-vs-direct total-energy tracking",
         abs(drifts["bh"] - drifts["direct"]), "|dE_bh - dE_direct|/|E0|")


def config3():
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import World, uniform_disc
    w = World(uniform_disc(262_144, seed=0),
              SimConfig(force_path="bh", resort_every=1, **_rcp_kw()))
    w.run(5); sync(w.state)
    t0 = time.perf_counter(); w.run(50); sync(w.state)
    dt = (time.perf_counter() - t0) / 50
    emit(3, "BH N=262144 per-step rebuild steps/sec", 1 / dt, "steps/s")


def config4():
    import subprocess, sys, pathlib
    r = subprocess.run([sys.executable,
                        str(pathlib.Path(__file__).parent.parent / "bench.py")],
                       capture_output=True, text=True, timeout=3600)
    line = r.stdout.strip().splitlines()[-1]
    print(line, flush=True)


def config5():
    import jax
    from nbody_simulation_tpu.config import SimConfig
    from nbody_simulation_tpu.models import uniform_disc
    from nbody_simulation_tpu.parallel import (make_1d_mesh, shard_state,
                                               make_sharded_step)
    n_dev = len(jax.devices())
    if n_dev >= 2:
        mesh = make_1d_mesh(n_dev)
        st = shard_state(uniform_disc(n_dev * 2048, seed=0), mesh)
        step = make_sharded_step(mesh, SimConfig(), tile_i=512, tile_j=2048)
        st = step(st); sync(st)
        t0 = time.perf_counter()
        for _ in range(5):
            st = step(st)
        sync(st)
        dt = (time.perf_counter() - t0) / 5
        emit(5, f"ring all-pairs N={n_dev*2048} on {n_dev} devices", 1 / dt,
             "steps/s")
        return
    # Single-chip proxy for the v5e-16 flagship (N=16.7M distributed BH,
    # far_mode="forest"): ONE jitted composite running the FULL per-chip
    # step body — amortized local Morton re-sort, subtree summarize, local
    # plan+sweep, TWO refined neighbor stages, the bounded forest walk, and
    # the Euler integrate — with every visiting tree substituted by the
    # local tree (shape-identical, spatially interleaved, so planner/sweep
    # cost matches a real neighbor/forest). Collectives are KB-to-MB-scale
    # ppermute/all_gather that XLA overlaps with compute; separately-
    # dispatched per-stage timings overcount by ~3 ms dispatch latency per
    # stage over the axon tunnel (measured), which the real one-module
    # step never pays.
    import functools
    import jax.numpy as jnp
    from nbody_simulation_tpu.parallel import distribute_state
    from nbody_simulation_tpu.parallel.bh_distributed import (
        FOREST_ROW_LEAVES, NEAR_ROW_LEAVES, _near_stage)
    from nbody_simulation_tpu.ops.morton import morton_sort_state
    from nbody_simulation_tpu.ops.tree import summarize_sorted
    from nbody_simulation_tpu.ops.traversal import _grouped_force, plan_rows
    from nbody_simulation_tpu.parallel import make_1d_mesh

    P, N = 16, 16_777_216
    L = N // P
    cfg = SimConfig(force_path="bh", **_rcp_kw())   # flagship regime: θ=50
    mesh = make_1d_mesh(1)
    st = distribute_state(uniform_disc(L, seed=0), mesh, cfg)
    mp = cfg.resolved_multipole()
    fcap, lcap = cfg.resolved_caps()
    rcp = cfg.resolved_rcp(bh=True)
    mbits = cfg.resolved_morton_bits()
    fdt = np.float32(cfg.dt)

    def step_body(pos, vel, mass, resort, render=False):
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
        for _ in range(2):   # the two Morton-neighbor stages
            acc_n = _near_stage(jnp.zeros(tgt_n.shape, jnp.float32), tree,
                                own_n, tgt_n, cfg, mp, rcp, False,
                                caps=ncaps)
            acc = acc + acc_n.reshape(acc.shape)
        plf = FOREST_ROW_LEAVES   # forest walk (flush from level-4 roots)
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
        if render:
            # The per-chip render stage (the reference's draw loop,
            # src/main.rs:41-72, run on-device): local partial raster +
            # colorize of the shard. The real P-chip program additionally
            # merges the 4 npix buffers over ICI (pmax/psum,
            # parallel/raster.py) — that wire time is added to the
            # adversarial bound below, not measurable on one chip.
            from nbody_simulation_tpu.ops.raster import (accumulate_pixels,
                                                         colorize_pixels)
            green, count, _, vlast = accumulate_pixels(
                pos, vel, mass, cfg.world_size, cfg.render_size,
                cfg.heavy_weight)
            frame = colorize_pixels(green, count, vlast, cfg.render_size)
            return pos, vel, mass, frame
        return pos, vel, mass

    def time_steps(step_r, step_s, pva):
        # Warmup spans a full resort cycle (verify-skill rule): both
        # variants compile AND re-execute once on the steady-state input
        # shardings before the window.
        every = max(1, cfg.resort_every)
        warm = every + 2
        for i in range(warm):
            pva = (step_r if i % every == 0 else step_s)(*pva)
        sync(pva[0])
        t0 = time.perf_counter()
        for i in range(warm, warm + 16):
            pva = (step_r if i % every == 0 else step_s)(*pva)
        sync(pva[0])
        return (time.perf_counter() - t0) / 16

    # ---- collective payload accounting (REAL sizes, not assumptions) ----
    # Per step the real P-chip program moves over ICI, per device (the
    # compute-to-data near protocol of parallel/bh_distributed.py): for
    # each of the 2 neighbor stages the device RECEIVES the visiting
    # subtree's levels 0..cut (the bounded walk needs no leaf data), a
    # seam-row continuation request from the opposite neighbor (targets +
    # row AABBs + frontier), and its own seam rows' result accelerations;
    # plus the coarse-forest all_gather (P × top-level records). With
    # near_refine_levels=0 the stages fall back to shipping whole subtree
    # blocks (2 × tree_bytes — the round-2 protocol).
    from nbody_simulation_tpu.parallel.bh_distributed import _near_geometry
    tree0 = summarize_sorted(st.pos, st.mass, leaf_size=cfg.leaf_size,
                             unweighted_leaf_com=cfg.unweighted_leaf_com)
    tree_bytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree_util.tree_leaves(tree0))
    n_leaves0, S0, _ = tree0.leaf_pos.shape
    ncaps0 = (fcap, max(lcap, 4 * NEAR_ROW_LEAVES))
    k0n, cutn, refine0 = _near_geometry(cfg, ncaps0, tree0.depth)
    if refine0 and cfg.near_remote:
        top_bytes = sum(x.size * x.dtype.itemsize for x in
                        jax.tree_util.tree_leaves(list(tree0.levels[:cutn + 1])))
        g_n = n_leaves0 // NEAR_ROW_LEAVES
        r = min(g_n, cfg.near_rows or max(64, g_n // 16))
        row = NEAR_ROW_LEAVES * S0
        req_bytes = r * (row * 2 * 4 + 2 * 2 * 4 + ncaps0[0] * (4 + 1))
        res_bytes = r * row * 2 * 4
        near_bytes = top_bytes + req_bytes + res_bytes
    else:
        near_bytes = tree_bytes
    forest_bytes = P * sum(
        (1 << l) * 8 * 4 for l in range(min(cfg.forest_levels,
                                            tree0.depth + 1)))
    payload = 2 * near_bytes + forest_bytes           # inbound per device
    # v5e ICI: ~45 GB/s per direction per link (conservative public
    # figure); a 1-D ring uses one link each way, so serialized (zero
    # overlap) transfer time is payload / 45e9 (out rides the other
    # direction concurrently).
    t_ici = payload / 45e9

    # ---- optimistic bound: the round-2 composite (XLA overlaps all
    # collectives with compute; transfers cost nothing) ----
    step_r = jax.jit(functools.partial(step_body, resort=True),
                     donate_argnums=(0, 1, 2))
    step_s = jax.jit(functools.partial(step_body, resort=False),
                     donate_argnums=(0, 1, 2))
    t_opt = time_steps(step_r, step_s, (st.pos, st.vel, st.mass))

    # ---- adversarial bound: same composite + a REAL-size dummy payload
    # forced through HBM inside the step (the memory cost of materializing
    # received blocks with zero compute/DMA overlap), + the serialized ICI
    # wire time added outside. Both bounds are printed; the pessimistic
    # number is the one that must clear the 60 steps/s target. ----
    n_dummy = payload // 4
    dummy0 = jnp.zeros((n_dummy,), jnp.float32)

    def step_adv(pos, vel, mass, dummy, resort):
        # Model the zero-overlap materialization of the received payload:
        # one full read+write of the payload-size buffer strictly AFTER
        # the step (scalar dependency on the step output). The buffer must
        # have exactly ONE use — a second read (an earlier tok-in variant
        # used dummy[:128]) defeats donation and costs a 28 MB
        # device-to-device copy per step (~25 ms on this backend).
        pos, vel, mass = step_body(pos, vel, mass, resort)
        dummy = dummy + pos[0, 0] * 0
        return pos, vel, mass, dummy

    adv_r = jax.jit(functools.partial(step_adv, resort=True),
                    donate_argnums=(0, 1, 2, 3))
    adv_s = jax.jit(functools.partial(step_adv, resort=False),
                    donate_argnums=(0, 1, 2, 3))
    st2 = distribute_state(uniform_disc(L, seed=0), mesh, cfg)

    def time_adv():
        # Warm across a FULL resort cycle so both variants compile with
        # the same (post-donation) input shardings before the timed
        # window — the first adv_r call sees distribute_state's
        # NamedSharding but later cycles see the jit outputs' sharding,
        # and a mismatch re-compiles (~50 s over the tunnel).
        pva = (st2.pos, st2.vel, st2.mass, dummy0)
        every = max(1, cfg.resort_every)
        for i in range(every + 2):
            pva = (adv_r if i % every == 0 else adv_s)(*pva)
        sync(pva[0])
        t0 = time.perf_counter()
        for i in range(every + 2, every + 2 + 16):
            pva = (adv_r if i % every == 0 else adv_s)(*pva)
        sync(pva[0])
        return (time.perf_counter() - t0) / 16

    t_adv = time_adv() + t_ici
    emit(5, f"distributed-BH projected steps/s @N={N} on v5e-{P} "
            "(single-chip composite per-shard proxy, forest far-mode)",
         1 / t_opt, "steps/s", t_step_ms=round(t_opt * 1e3, 2), shard=L,
         bound="optimistic (collectives fully overlapped)")
    emit(5, f"distributed-BH projected steps/s @N={N} on v5e-{P} "
            "(ADVERSARIAL: real-size payload through HBM + serialized ICI)",
         1 / t_adv, "steps/s", t_step_ms=round(t_adv * 1e3, 2),
         payload_mb=round(payload / 1e6, 1),
         t_ici_ms=round(t_ici * 1e3, 2),
         bound="pessimistic (zero collective/compute overlap)")

    # ---- render-inclusive accounting (round-4 verdict item 1): the
    # reference's 60-steps/s loop is sim + draw + present
    # (src/main.rs:41-72,143-162). The draw is dispatched as its OWN jit
    # back-to-back with the step — exactly what the engine does — NOT
    # fused into the composite: fusing the raster scatters into the big
    # step program measured 76 ms marginal vs 16.2 ms standalone (4.7×,
    # XLA scatter scheduling pathology; 2026-08-20 A/B). The real P-chip
    # program additionally merges the 4 npix buffers over ICI
    # (parallel/raster.py) — that wire time rides the adversarial side.
    # fps and ups are DECOUPLED in the reference (lossy depth-2 frame
    # channel drops frames when draw is slower, src/main.rs:136-139) —
    # the last row reports the fps the lossy pipeline sustains with ups
    # pinned at 60. ----
    from nbody_simulation_tpu.ops.raster import (accumulate_pixels,
                                                 colorize_pixels)

    @jax.jit
    def draw(pos, vel, mass):
        g, c, _, vl = accumulate_pixels(pos, vel, mass, cfg.world_size,
                                        cfg.render_size, cfg.heavy_weight)
        return colorize_pixels(g, c, vl, cfg.render_size)

    st3 = distribute_state(uniform_disc(L, seed=0), mesh, cfg)

    def time_render():
        pva = (st3.pos, st3.vel, st3.mass)
        every = max(1, cfg.resort_every)
        frame = None
        for i in range(every + 2):
            pva = (step_r if i % every == 0 else step_s)(*pva)
            frame = draw(*pva)
        sync(pva[0]); sync(frame.astype(jnp.float32))
        t0 = time.perf_counter()
        for i in range(every + 2, every + 2 + 16):
            pva = (step_r if i % every == 0 else step_s)(*pva)
            frame = draw(*pva)
        sync(pva[0]); sync(frame.astype(jnp.float32))
        return (time.perf_counter() - t0) / 16

    npix = cfg.render_size * cfg.render_size
    t_wire_render = 4 * 2 * (P - 1) / P * npix * 4 / 45e9
    t_opt_r = time_render()
    t_adv_r = t_adv + (t_opt_r - t_opt) + t_wire_render
    emit(5, f"distributed-BH steps/s @N={N} on v5e-{P} INCL. per-step "
            "render (step + draw programs back-to-back; optimistic "
            "overlap)",
         1 / t_opt_r, "steps/s", t_step_ms=round(t_opt_r * 1e3, 2),
         render_ms=round((t_opt_r - t_opt) * 1e3, 2))
    emit(5, f"distributed-BH steps/s @N={N} on v5e-{P} INCL. per-step "
            "render (ADVERSARIAL + 4-buffer npix merge wire)",
         1 / t_adv_r, "steps/s", t_step_ms=round(t_adv_r * 1e3, 2),
         merge_wire_ms=round(t_wire_render * 1e3, 2))
    # Decoupled (reference) semantics: physics at 60 ups, frames rendered
    # from snapshots as device time allows, excess frames dropped.
    slack = 1.0 - 60.0 * t_adv
    fps = max(0.0, slack / (t_opt_r - t_opt + t_wire_render))
    emit(5, f"fps sustainable at 60 ups @N={N} on v5e-{P} "
            "(reference lossy-channel semantics, adversarial step cost)",
         fps, "frames/s", step_slack_ms=round(max(0.0, slack) * 1e3 / 60, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="0,1,2,3,4,5,6")
    ap.add_argument("--rcp", default=None,
                    help="SimConfig.rcp override for the BH configs "
                         "(e.g. approx+clamp)")
    args = ap.parse_args()
    global RCP
    RCP = args.rcp
    fns = {0: config0, 1: config1, 2: config2, 3: config3,
           4: config4, 5: config5, 6: config6}
    for c in [int(x) for x in args.configs.split(",")]:
        fns[c]()


if __name__ == "__main__":
    main()

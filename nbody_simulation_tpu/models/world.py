"""The step loop: World = state + config + a compiled step.

Mirrors the reference's ``World::update`` (reference src/main.rs:388-425):
force summation followed by semi-implicit Euler, with per-phase telemetry.
Differences by design (TPU-first):

- the whole step is one jitted, donated device computation (``step``/``run``)
  instead of clone → rebuild → par_iter → sequential loop;
- accelerations are applied to the same particle ordering they were computed
  for — the reference's clone/permute index-mismatch bug (SURVEY.md §3.2) is
  not reproduced;
- ``step_timed`` runs the phases as separate dispatches with host syncs to
  populate ``Counting`` like the reference's per-phase Instant timers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nbody_simulation_tpu.config import DEFAULT_CONFIG, SimConfig
from nbody_simulation_tpu.ops.allpairs import allpairs_accel, allpairs_accel_sym
from nbody_simulation_tpu.ops.force import direct_accel
from nbody_simulation_tpu.ops.integrate import euler_step
from nbody_simulation_tpu.state import ParticleState


def make_accel_fn(config: SimConfig):
    """Resolve config.force_path to a ``(pos, mass) -> accel`` function."""
    if config.force_path == "direct":
        return functools.partial(direct_accel, softening2=config.softening2)
    if config.force_path == "pallas":
        ordered = functools.partial(
            allpairs_accel, softening2=config.softening2,
            tile_i=config.tile_i, tile_j=config.tile_j,
            rcp=config.resolved_rcp())
        if not config.sym_allpairs:
            return ordered

        def accel(pos, mass):
            # Symmetric third-law kernel where the tiling admits it (N a
            # multiple of the sym tile — World pads to guarantee this);
            # ordered kernel otherwise. Same law/result up to fp32
            # summation order (ops/allpairs.allpairs_accel_sym).
            n = pos.shape[0]
            if n % min(config.sym_tile, n):
                return ordered(pos, mass)
            return allpairs_accel_sym(
                pos, mass, softening2=config.softening2,
                tile=config.sym_tile, strips=config.sym_strips,
                rcp=config.resolved_rcp())
        return accel
    if config.force_path == "bh":
        from nbody_simulation_tpu.ops.traversal import bh_accel_fn
        return bh_accel_fn(config)
    raise ValueError(f"unknown force_path {config.force_path!r} "
                     "(ring runs via parallel.sharded_step)")


class World:
    """Host-side handle around a device-resident simulation."""

    def __init__(self, state: ParticleState, config: SimConfig = DEFAULT_CONFIG):
        self.config = config
        pad = (max(config.tile_i, config.tile_j,
                   config.sym_tile if config.sym_allpairs else 0)
               if config.force_path == "pallas" else 256)
        self.state = state.pad_to(pad)
        self.updates = 0
        self._build_step(config)

    def reconfigure(self, **changes) -> None:
        """Swap runtime knobs (theta, dt, integrator, ...) mid-simulation —
        the live version of the reference's recompile-to-tune consts
        (src/main.rs:31-35). Rebuilds the jitted step closures; the state
        and step counter carry over. Must be called from the thread that
        owns the state (the engine applies it at batch boundaries)."""
        self.config = self.config.replace(**changes)
        self._build_step(self.config)

    def _build_step(self, config: SimConfig) -> None:
        dt = config.dt

        if config.force_path == "bh":
            self._init_bh_step(config, dt)
        else:
            accel = make_accel_fn(config)

            if config.integrator == "leapfrog":
                from nbody_simulation_tpu.ops.integrate import leapfrog_step

                @functools.partial(jax.jit, donate_argnums=0)
                def _step(st: ParticleState) -> ParticleState:
                    return leapfrog_step(st, accel, dt)
            else:
                @functools.partial(jax.jit, donate_argnums=0)
                def _step(st: ParticleState) -> ParticleState:
                    return euler_step(st, accel(st.pos, st.mass), dt)

            self._step = _step
            self._accel = jax.jit(accel)

    def _init_bh_step(self, config: SimConfig, dt: float) -> None:
        """BH fast path: the particle array is kept in Morton order like the
        reference's in-place partition reorders it (src/bvh_tree.rs:74-76);
        summaries rebuild every step, the sort refreshes every
        config.resort_every steps."""
        from nbody_simulation_tpu.ops.morton import morton_sort_state
        from nbody_simulation_tpu.ops.traversal import bh_accel_sorted
        from nbody_simulation_tpu.ops.tree import summarize_sorted

        n = self.state.n

        fcap, lcap = config.resolved_caps()

        def _acc_of(pos, mass):
            tree = summarize_sorted(
                pos, mass, leaf_size=config.leaf_size,
                unweighted_leaf_com=config.unweighted_leaf_com)
            return bh_accel_sorted(tree, theta=config.theta,
                                   softening2=config.softening2,
                                   frontier_cap=fcap, leaf_cap=lcap,
                                   arity=config.tree_arity,
                                   plan_leaves=config.plan_leaves,
                                   multipole=config.resolved_multipole(),
                                   rcp=config.resolved_rcp(bh=True),
                                   sweep_buckets=config.sweep_buckets)[:n]

        import numpy as _np
        fdt = _np.float32(dt)  # host constant: device constants in closures
        # break re-tracing if the device hiccups

        def _body(spos, svel, smass, st):
            if config.integrator == "leapfrog":
                v_half = svel + _acc_of(spos, smass) * (fdt * jnp.float32(0.5))
                pos = spos + v_half * fdt
                vel = v_half + _acc_of(pos, smass) * (fdt * jnp.float32(0.5))
            else:
                vel = svel + _acc_of(spos, smass) * fdt
                pos = spos + vel * fdt
            return st.replace(pos=pos, vel=vel, mass=smass)

        ws = config.world_size
        mbits = config.resolved_morton_bits()

        @functools.partial(jax.jit, donate_argnums=0)
        def _step_resort(st: ParticleState) -> ParticleState:
            # Morton sort fused into the step: one dispatch. The multi-payload
            # sort is ~5x cheaper than argsort+gather at N=1M (ops/morton.py),
            # and its outputs are fresh buffers so donation stays safe.
            spos, svel, smass = morton_sort_state(st.pos, st.vel, st.mass,
                                                  ws, bits=mbits)
            return _body(spos, svel, smass, st)

        @jax.jit  # NOT donated: donating inputs that feed the pallas call
        # directly (no copy-producing gather in between) measured 13x slower
        # (404 vs 30 ms/step) — aliasing defeats the kernel pipeline.
        def _step_sorted(st: ParticleState) -> ParticleState:
            # Between resorts the state is already in (stale) Morton order —
            # skip the 3-array permute gather entirely.
            return _body(st.pos, st.vel, st.mass, st)

        def step_bh(st: ParticleState) -> ParticleState:
            if self.updates % max(config.resort_every, 1) == 0:
                return _step_resort(st)
            return _step_sorted(st)

        self._step = step_bh
        from nbody_simulation_tpu.ops.traversal import bh_accel_fn
        self._accel = bh_accel_fn(config)

    # -- fused fast path ------------------------------------------------------
    def step(self) -> None:
        self.state = self._step(self.state)
        self.updates += 1

    def run(self, n_steps: int) -> None:
        """n donated jitted steps, async-dispatched back-to-back.

        Measured: a host loop of donated dispatches sustains ~4x the step
        rate of an on-device lax.fori_loop wrapping the same body (the loop
        serializes the Pallas grid pipeline), so the host loop is the fast
        path. Dispatch is async — nothing syncs until the state is read.
        """
        for _ in range(n_steps):
            self.state = self._step(self.state)
            self.updates += 1  # per-step: the BH path branches on it

    def diagnostics(self) -> dict:
        """Conserved-quantity diagnostics — the single-chip counterpart of
        ``parallel.sharded_diagnostics`` (same keys), so both CLIs report
        mass/momentum/KE with one code shape. Zero-mass padding is inert
        in every sum."""
        import jax.numpy as jnp
        pos, vel, mass = self.state.pos, self.state.vel, self.state.mass
        m = mass[:, None]
        mtot = jnp.sum(mass)
        return {
            "momentum": jnp.sum(vel * m, axis=0),
            "kinetic_energy": jnp.sum(0.5 * mass * jnp.sum(vel ** 2, -1)),
            "total_mass": mtot,
            "center_of_mass": jnp.sum(pos * m, axis=0) / mtot,
            "n_live": jnp.sum((mass > 0).astype(jnp.int32)),
        }

    # -- failure detection ------------------------------------------------------
    def assert_finite(self) -> None:
        """Divergence guard (SURVEY.md §5: the reference's only fault masking
        is the per-pair is_normal skip). Raises on non-finite state. Must be
        called from the thread that owns the state (donation safety)."""
        import numpy as np
        pos = np.asarray(self.state.pos[:self.state.n_real])
        if not np.isfinite(pos).all():
            bad = int((~np.isfinite(pos)).any(axis=1).sum())
            raise FloatingPointError(
                f"simulation diverged: {bad} particles non-finite at "
                f"step {self.updates}")

    # -- profile path ---------------------------------------------------------
    def step_timed(self, counting) -> None:
        """One step as separate synced dispatches, accumulating Counting.

        Phase attribution matches the reference (src/main.rs:402,417,424):
        build_bvh = tree build (0 for direct paths), sum_gravity = force
        summation, post_calculations = integration.
        """
        from nbody_simulation_tpu.utils.telemetry import PhaseTimer

        if self.config.force_path == "bh":
            from nbody_simulation_tpu.ops.morton import morton_sort_state
            from nbody_simulation_tpu.ops.traversal import bh_accel_sorted
            from nbody_simulation_tpu.ops.tree import summarize_sorted

            cfg = self.config
            st = self.state
            fcap, lcap = cfg.resolved_caps()

            def _build(pos, mass):
                return summarize_sorted(
                    pos, mass, leaf_size=cfg.leaf_size,
                    unweighted_leaf_com=cfg.unweighted_leaf_com)

            def _force(tree, n):
                # Same walk configuration as the fused step (_init_bh_step):
                # Counting must time the configuration the engine actually runs.
                return bh_accel_sorted(tree, theta=cfg.theta,
                                       softening2=cfg.softening2,
                                       frontier_cap=fcap, leaf_cap=lcap,
                                       arity=cfg.tree_arity,
                                       plan_leaves=cfg.plan_leaves,
                                       multipole=cfg.resolved_multipole(),
                                       rcp=cfg.resolved_rcp(bh=True))[:n]

            with PhaseTimer(counting, "build_bvh"):
                spos, svel, smass = morton_sort_state(
                    st.pos, st.vel, st.mass, cfg.world_size,
                    bits=cfg.resolved_morton_bits())
                tree = _build(spos, smass)
                _ = float(tree.levels[0].com[0, 0])  # host sync
            with PhaseTimer(counting, "sum_gravity"):
                accel = _force(tree, st.n)
                _ = float(accel[0, 0])
            if cfg.integrator == "leapfrog":
                # Kick-drift, then the second force eval (timed as
                # sum_gravity, its tree rebuild as build_bvh) and the
                # closing kick — same trajectory as the fused leapfrog step.
                dt = jnp.float32(cfg.dt)
                with PhaseTimer(counting, "post_calculations"):
                    v_half = svel + accel * (dt * jnp.float32(0.5))
                    spos2 = spos + v_half * dt
                    _ = float(spos2[0, 0])
                with PhaseTimer(counting, "build_bvh"):
                    tree2 = _build(spos2, smass)
                    _ = float(tree2.levels[0].com[0, 0])
                with PhaseTimer(counting, "sum_gravity"):
                    accel2 = _force(tree2, st.n)
                    _ = float(accel2[0, 0])
                with PhaseTimer(counting, "post_calculations"):
                    vel2 = v_half + accel2 * (dt * jnp.float32(0.5))
                    self.state = st.replace(pos=spos2, vel=vel2, mass=smass)
                    _ = float(self.state.pos[0, 0])
            else:
                with PhaseTimer(counting, "post_calculations"):
                    self.state = euler_step(
                        st.replace(pos=spos, vel=svel, mass=smass), accel,
                        cfg.dt)
                    _ = float(self.state.pos[0, 0])
        else:
            with PhaseTimer(counting, "sum_gravity"):
                accel = self._accel(self.state.pos, self.state.mass)
                jax.block_until_ready(accel)
                _ = float(accel[0, 0])  # host sync (axon: block_until_ready is lazy)
            with PhaseTimer(counting, "post_calculations"):
                self.state = euler_step(self.state, accel, self.config.dt)
                _ = float(self.state.pos[0, 0])
        self.updates += 1

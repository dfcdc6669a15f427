"""Blocked all-pairs force summation as a Pallas TPU kernel.

This is the TPU-native replacement for the economics of the reference's
"exact loop over a leaf's particles" (reference src/main.rs:355-362) scaled to
the whole system: a dense O(N²) interaction sweep tiled through VMEM.

Design (flash-attention-style tiling):

- grid = (Ni/TILE_I, Nj/TILE_J); the i (target) axis is parallel, the j
  (source) axis is an accumulation ("arbitrary") axis revisiting the same
  output block, so Pallas double-buffers the j-tile DMAs behind the VPU work.
- targets i live on sublanes as (TILE_I, 1) columns; sources j live on lanes
  as (1, TILE_J) rows; the (TILE_I, TILE_J) interaction tile is pure VPU
  elementwise work using the exact reference force law (ops/force.pair_accel),
  reduced over lanes into an f32 accumulator.
- zero-mass padding particles contribute exactly 0 (force numerator is
  diff*mass, src/main.rs:252), and self-pairs are masked by the is_normal
  guard — so no special-casing of the diagonal tiles is needed.
- targets and sources may be different arrays (``src_pos``/``src_mass``),
  which is what the multi-chip ring exchange (parallel/ring.py) uses to
  interact the local shard with each visiting tile.

Measured on v5e (N=262144, fp32): 1.99e11 pairwise interactions/sec with
rcp="newton"; 2.18e11 at N=1M. North-star target: 1e11 (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_simulation_tpu.ops.force import FLT_MIN_NORMAL, pair_accel

# Rough VPU op count per pairwise interaction (incl. the fp32 divide).
FLOPS_PER_PAIR = 22

# L1-norm clamp floor for the "+clamp" guard modes. Any two distinct f32
# world-scale coordinates (|x| ≳ 1e-6) differ by ≥ one ulp ≈ 6e-14·|x|,
# so a physically-representable pair separation is either exactly 0 or
# ≥ ~1e-19; 1e-12 sits far above that while keeping the clamped
# denominator ≥ 1e-12·softening2 = 1e-15, whose reciprocal (1e15) times
# the largest reference mass (7.5e7) stays finite in f32.
L1_CLAMP = 1e-12

from nbody_simulation_tpu.config import RCP_MODES  # canonical mode list


def mono_tile(dx, dy, mj, softening2: float, rcp: str):
    """Monopole force contributions (cx, cy) for displacement tiles.

    The exact reference law (src/main.rs:234-253) on a (TI,TJ) tile; shared
    by the all-pairs kernel and the Barnes-Hut grouped sweep
    (ops/traversal.py).

    ``rcp`` selects the reciprocal ("exact" | "newton" | "approx") and,
    with a "+clamp" suffix, how the reference's is_normal guard
    (src/main.rs:240-243) is expressed:

    - default ("mask"): two compares + a select zero the masked lanes —
      self-pairs, subnormal separations, and inf/NaN all contribute 0,
      exactly like the reference's silent skip;
    - "+clamp": ``max(s, L1_CLAMP)`` replaces the 4-op mask with one VPU op.
      Bitwise-identical output for every representable input whose pair
      separations are exactly 0 (self/coincident pairs: dx·w = 0·finite = 0)
      or ≥ L1_CLAMP (the clamp is the identity there) — i.e. all finite
      world-scale states. The differences: a separation in (0, 1e-12)
      (unreachable for f32 coordinates above ~1e-6 magnitude) yields a
      clamped-weaker force instead of the skip, and non-finite positions
      PROPAGATE as NaN instead of being silently frozen — opt-in via
      SimConfig(rcp=...) or bench, where inputs are finite by construction.
    """
    if rcp == "exact":
        return pair_accel(dx, dy, mj, softening2)
    base, _, guard = rcp.partition("+")
    s = jnp.abs(dx) + jnp.abs(dy)
    d2 = jnp.maximum(dx * dx + dy * dy, jnp.float32(softening2))
    if guard == "clamp":
        den = jnp.maximum(s, jnp.float32(L1_CLAMP)) * d2
        r = pl.reciprocal(den, approx=True)
        if base == "newton":
            r = r * (jnp.float32(2.0) - den * r)
    else:
        # Same law, but the division is an approximate VPU reciprocal,
        # optionally sharpened by one Newton step r*(2 - den*r) (~1 ulp).
        # The is_normal guard is two compares: s <= FLT_MAX is false for
        # both inf and NaN, so this matches jnp.isfinite exactly; masked
        # lanes may carry inf/NaN through the reciprocal — the final where
        # kills them (cheaper than sanitizing the denominator first).
        normal = (s >= FLT_MIN_NORMAL) & (s <= jnp.float32(3.4028235e38))
        den = s * d2
        r = pl.reciprocal(den, approx=True)
        if base == "newton":
            r = r * (jnp.float32(2.0) - den * r)
        r = jnp.where(normal, r, jnp.float32(0.0))
    w = mj * r
    return dx * w, dy * w


def _sym_r(dx, dy, softening2: float, rcp: str):
    """The shared pair kernel k(d) = 1/(‖d‖₁·max(‖d‖₂², ε)) of a tile.

    Newton's third law for the reference law (src/main.rs:234-253): with
    t = d·k(d), a_i += m_j·t and a_j −= m_i·t share everything except the
    final mass product, so the expensive part (abs/sum/clamp/reciprocal,
    ~11 VPU ops) is evaluated once per UNORDERED pair. Masked lanes
    (self-pairs; non-finite under the mask guard) return k = 0.

    "exact" computes the IEEE division (the interpret/CPU path — Mosaic's
    approximate reciprocal has no interpreter lowering); the deviation from
    ``pair_accel``'s numerator-first order is ≤2 ulp.
    """
    base, _, guard = rcp.partition("+")
    s = jnp.abs(dx) + jnp.abs(dy)
    d2 = jnp.maximum(dx * dx + dy * dy, jnp.float32(softening2))
    if guard == "clamp":
        den = jnp.maximum(s, jnp.float32(L1_CLAMP)) * d2
        if base == "exact":
            return jnp.float32(1.0) / den
        r = pl.reciprocal(den, approx=True)
        if base == "newton":
            r = r * (jnp.float32(2.0) - den * r)
        return r
    normal = (s >= FLT_MIN_NORMAL) & (s <= jnp.float32(3.4028235e38))
    den = s * d2
    if base == "exact":
        # Masked lanes get a denominator of 1 so no inf/NaN flows through
        # the where on backends that trap-check (mirrors pair_accel).
        r = jnp.float32(1.0) / jnp.where(normal, den, jnp.float32(1.0))
    else:
        r = pl.reciprocal(den, approx=True)
        if base == "newton":
            r = r * (jnp.float32(2.0) - den * r)
    return jnp.where(normal, r, jnp.float32(0.0))


def _allpairs_sym_kernel(xi_ref, yi_ref, mi_ref, xj_ref, yj_ref, mj_ref,
                         axi0_ref, ayi0_ref, axj0_ref, ayj0_ref,
                         axi_ref, ayi_ref, axj_ref, ayj_ref,
                         softening2: float, rcp: str, nt: int,
                         kk: int | None, strips: int):
    """One tournament-schedule step: tile pair (i, (i+k) mod nt).

    Grid = (nt//2 + 1, nt): round k pairs tile i with tile (i+k) mod nt —
    every unordered tile pair exactly once (k=0 is the diagonal; for even
    nt, round nt/2 generates each pair twice, so its second half i ≥ nt/2
    is masked off). The four accumulators are aliased input/outputs
    (read-modify-write through HBM): each acc block is revisited only once
    per round — ≥ nt−1 grid steps apart. Under depth-2 double buffering the
    prefetch of step s begins during step s−1 while the writeback of step
    s' can extend into step s'+1, so the no-race argument needs
    nt−1 ≥ 3; ``allpairs_accel_sym`` routes nt < 4 through the per-round
    path (each block visited once per call — no revisit at all).

    ``kk``: None on the TPU fast path (k = grid dim 0). With ``kk`` static
    the call covers one tournament round on a (nt,) grid and accumulators
    thread functionally between calls — used for nt < 4 (above) and for
    interpret mode, which does NOT emulate aliased read-modify-write
    across grid steps (revisited accumulator blocks read stale zeros —
    observed, not hypothetical). Same kernel body either way.
    """
    if kk is None:
        k = pl.program_id(0)
        i = pl.program_id(1)
    else:
        k = jnp.int32(kk)
        i = pl.program_id(0)
    # Pass through unconditionally: aliased outputs must be rewritten on
    # every step (masked steps included), else the writeback clobbers the
    # accumulator block with uninitialized VMEM.
    axi_ref[:] = axi0_ref[:]
    ayi_ref[:] = ayi0_ref[:]
    axj_ref[:] = axj0_ref[:]
    ayj_ref[:] = ayj0_ref[:]

    def body():
        # The (TS,TS) tile is processed as ``strips`` sublane strips with
        # eager reductions: a whole-tile body keeps dx/dy/r + four product
        # tiles live at once (~19 tile temporaries — measured 19 MB scoped
        # VMEM at TS=512, over the 16 MB limit), while strips bound the
        # live set to ~5 strip-sized temporaries.
        ts = xi_ref.shape[0]
        rs = ts // strips
        # k=0: the i-side already covers the full diagonal tile — a j-side
        # pass would double it. The guard is a scalar 0/1 folded into the
        # (rs,1) mass COLUMN (one cheap mul) instead of a pl.when per
        # strip: per-strip conditionals break Mosaic's tile pipelining
        # (the measured sweep-kernel dead end, docs/PERFORMANCE.md).
        sj = jnp.where(k != 0, jnp.float32(1.0), jnp.float32(0.0))
        for st in range(strips):
            sl = slice(st * rs, (st + 1) * rs)
            dx = xj_ref[:] - xi_ref[sl, :]   # (1,TS) - (rs,1) -> (rs,TS)
            dy = yj_ref[:] - yi_ref[sl, :]
            r = _sym_r(dx, dy, softening2, rcp)
            wi = mj_ref[:] * r
            axi_ref[sl, :] += jnp.sum(dx * wi, axis=1, keepdims=True)
            ayi_ref[sl, :] += jnp.sum(dy * wi, axis=1, keepdims=True)
            wj = (mi_ref[sl, :] * sj) * r
            axj_ref[:] -= jnp.sum(dx * wj, axis=0, keepdims=True)
            ayj_ref[:] -= jnp.sum(dy * wj, axis=0, keepdims=True)

    if nt % 2 == 0:
        pl.when((k != nt // 2) | (i < nt // 2))(body)
    else:
        body()


@functools.partial(
    jax.jit,
    static_argnames=("softening2", "tile", "interpret", "rcp", "strips"))
def allpairs_accel_sym(pos: jax.Array, mass: jax.Array,
                       softening2: float = 1e-3, tile: int = 1024,
                       interpret: bool = False,
                       rcp: str = "newton", strips: int = 4) -> jax.Array:
    """Self-interaction all-pairs acceleration via the symmetric kernel.

    Same law and result as ``allpairs_accel(pos, mass)`` for finite inputs
    (summation order differs — fp32-level deviation only), but each
    unordered pair is evaluated once and applied to both particles
    (Newton's third law), sharing the reciprocal pipeline between the two
    directions. A/B measurements vs the ordered kernel: docs/PERFORMANCE.md
    (round-4 table; benchmarks/probe_sym.py).
    Self-pairs only (no src_pos/src_mass): symmetry needs targets ≡ sources.

    Non-finite-input divergence from the ordered kernel: accumulators are
    initialized as pos·0, so a NaN/inf POSITION NaN-poisons that particle's
    own output row even under the default mask guard (the ordered kernel
    returns exactly 0 there, the reference's silent is_normal freeze).
    Inputs are finite by construction everywhere this is called; the
    engine's nan_check guards uphold that invariant.
    """
    n = pos.shape[0]
    tile = min(tile, n)
    if n % tile:
        raise ValueError(f"N={n} not divisible by tile {tile}")
    strips = max(1, min(strips, tile // 8))   # strips must keep rs ≥ 8 rows
    if tile % strips:
        raise ValueError(f"tile={tile} not divisible by strips {strips}")
    if rcp not in RCP_MODES:
        raise ValueError(f"rcp must be one of {RCP_MODES}, got {rcp!r}")
    if interpret or jax.default_backend() == "cpu":
        interpret = True
        rcp = "exact"

    nt = n // tile
    x_col = pos[:, 0:1]
    y_col = pos[:, 1:2]
    m_col = mass.reshape(n, 1)
    x_row = pos[:, 0].reshape(1, n)
    y_row = pos[:, 1].reshape(1, n)
    m_row = mass.reshape(1, n)
    # Distinct zero accumulators: mul-by-zero is not folded/CSE'd for
    # floats (NaN·0 ≠ 0), so these stay four separate buffers and XLA's
    # donation machinery never sees one buffer behind two aliased operands.
    acc = (x_col * jnp.float32(0.0), y_col * jnp.float32(0.0),
           x_row * jnp.float32(0.0), y_row * jnp.float32(0.0))
    out_shape = [
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
    ]
    rounds = nt // 2 + 1

    def specs(kk):
        def jmap(k, i):
            jj = i + k
            return jnp.where(jj >= nt, jj - nt, jj)
        if kk is None:
            col = pl.BlockSpec((tile, 1), lambda k, i: (i, 0),
                               memory_space=pltpu.VMEM)
            row = pl.BlockSpec((1, tile), lambda k, i: (0, jmap(k, i)),
                               memory_space=pltpu.VMEM)
        else:
            col = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
            row = pl.BlockSpec((1, tile), lambda i: (0, jmap(kk, i)),
                               memory_space=pltpu.VMEM)
        return ([col, col, col, row, row, row, col, col, row, row],
                [col, col, row, row])

    def call(kk, grid, acc):
        kernel = functools.partial(
            _allpairs_sym_kernel, softening2=softening2, rcp=rcp, nt=nt,
            kk=kk, strips=strips)
        in_specs, out_specs = specs(kk)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * len(grid),
            ),
            cost_estimate=pl.CostEstimate(
                flops=(FLOPS_PER_PAIR * n * n) // (2 * (1 if kk is None
                                                        else rounds)),
                bytes_accessed=8 * n * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(x_col, y_col, m_col, x_row, y_row, m_row, *acc)

    if interpret or nt < 4:
        # One pallas_call per tournament round, accumulators threaded
        # functionally. Two reasons to take this path (see
        # _allpairs_sym_kernel): the interpreter does not emulate aliased
        # read-modify-write across grid steps, and on TPU the flattened
        # grid's revisit distance nt−1 only out-runs the depth-2
        # prefetch/writeback overlap when nt ≥ 4.
        for kk in range(rounds):
            acc = call(kk, (nt,), acc)
        axi, ayi, axj, ayj = acc
    else:
        axi, ayi, axj, ayj = call(None, (rounds, nt), acc)

    ax = axi[:, 0] + axj[0, :]
    ay = ayi[:, 0] + ayj[0, :]
    return jnp.stack([ax, ay], axis=1)


def _allpairs_sym_pair_kernel(xi_ref, yi_ref, mi_ref, xj_ref, yj_ref, mj_ref,
                              axi0_ref, ayi0_ref, axj0_ref, ayj0_ref,
                              axi_ref, ayi_ref, axj_ref, ayj_ref,
                              softening2: float, rcp: str, nt: int,
                              kk: int | None, strips: int):
    """One cross-shard tournament step: LOCAL tile i vs VISITING tile
    (i+k) mod nt — every unordered (local, visiting) tile pair exactly
    once, BOTH sides accumulated (Newton's third law across shards).

    The source≠target sibling of ``_allpairs_sym_kernel``: no diagonal
    (k=0 is a full round — local tile 0 vs visiting tile 0 are different
    particles), no duplicate-round masking (the i×j rectangle is walked
    completely in nt rounds), same aliased read-modify-write accumulator
    hazard analysis (revisit distance ≥ nt−1 ⇒ nt ≥ 4 for the flattened
    grid; per-round calls otherwise — and always under interpret, which
    does not emulate aliased RMW across grid steps)."""
    if kk is None:
        k = pl.program_id(0)
        i = pl.program_id(1)
    else:
        k = jnp.int32(kk)
        i = pl.program_id(0)
    del k  # block index maps consume it; the body is round-independent
    axi_ref[:] = axi0_ref[:]
    ayi_ref[:] = ayi0_ref[:]
    axj_ref[:] = axj0_ref[:]
    ayj_ref[:] = ayj0_ref[:]
    ts = xi_ref.shape[0]
    rs = ts // strips
    for st in range(strips):
        sl = slice(st * rs, (st + 1) * rs)
        dx = xj_ref[:] - xi_ref[sl, :]   # (1,TS) - (rs,1) -> (rs,TS)
        dy = yj_ref[:] - yi_ref[sl, :]
        r = _sym_r(dx, dy, softening2, rcp)
        wi = mj_ref[:] * r
        axi_ref[sl, :] += jnp.sum(dx * wi, axis=1, keepdims=True)
        ayi_ref[sl, :] += jnp.sum(dy * wi, axis=1, keepdims=True)
        wj = mi_ref[sl, :] * r
        axj_ref[:] -= jnp.sum(dx * wj, axis=0, keepdims=True)
        ayj_ref[:] -= jnp.sum(dy * wj, axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("softening2", "tile", "interpret", "rcp", "strips"))
def allpairs_accel_sym_pair(pos_i: jax.Array, mass_i: jax.Array,
                            pos_j: jax.Array, mass_j: jax.Array,
                            softening2: float = 1e-3, tile: int = 1024,
                            interpret: bool = False,
                            rcp: str = "newton",
                            strips: int = 4):
    """Third-law CROSS-shard all-pairs: returns ``(acc_i, acc_j)`` — the
    acceleration of the i-side particles due to ALL j-side particles, and
    of the j side due to all of i — with each unordered pair's reciprocal
    pipeline evaluated ONCE (the symmetric-kernel economics of
    ``allpairs_accel_sym``, for a source≠target block).

    This is the compute side of the symmetric ring
    (parallel/ring.ring_allpairs_accel_symring): the j-side partial rides
    the rotating tile home, halving the visiting-stage pair work at the
    cost of one extra ring hop. Shapes: both sides (L, 2)/(L,) with the
    same L, divisible by ``tile``.
    """
    n = pos_i.shape[0]
    assert pos_j.shape[0] == n, (pos_i.shape, pos_j.shape)
    tile = min(tile, n)
    if n % tile:
        raise ValueError(f"N={n} not divisible by tile {tile}")
    strips = max(1, min(strips, tile // 8))
    if tile % strips:
        raise ValueError(f"tile={tile} not divisible by strips {strips}")
    if rcp not in RCP_MODES:
        raise ValueError(f"rcp must be one of {RCP_MODES}, got {rcp!r}")
    if interpret or jax.default_backend() == "cpu":
        interpret = True
        rcp = "exact"

    nt = n // tile
    xi_col, yi_col = pos_i[:, 0:1], pos_i[:, 1:2]
    mi_col = mass_i.reshape(n, 1)
    xj_row = pos_j[:, 0].reshape(1, n)
    yj_row = pos_j[:, 1].reshape(1, n)
    mj_row = mass_j.reshape(1, n)
    acc = (xi_col * jnp.float32(0.0), yi_col * jnp.float32(0.0),
           xj_row * jnp.float32(0.0), yj_row * jnp.float32(0.0))
    out_shape = [
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
    ]

    def specs(kk):
        def jmap(k, i):
            jj = i + k
            return jnp.where(jj >= nt, jj - nt, jj)
        if kk is None:
            col = pl.BlockSpec((tile, 1), lambda k, i: (i, 0),
                               memory_space=pltpu.VMEM)
            row = pl.BlockSpec((1, tile), lambda k, i: (0, jmap(k, i)),
                               memory_space=pltpu.VMEM)
        else:
            col = pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
            row = pl.BlockSpec((1, tile), lambda i: (0, jmap(kk, i)),
                               memory_space=pltpu.VMEM)
        return ([col, col, col, row, row, row, col, col, row, row],
                [col, col, row, row])

    def call(kk, grid, acc):
        kernel = functools.partial(
            _allpairs_sym_pair_kernel, softening2=softening2, rcp=rcp,
            nt=nt, kk=kk, strips=strips)
        in_specs, out_specs = specs(kk)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",) * len(grid),
            ),
            cost_estimate=pl.CostEstimate(
                flops=(FLOPS_PER_PAIR * n * n) // (1 if kk is None else nt),
                bytes_accessed=10 * n * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(xi_col, yi_col, mi_col, xj_row, yj_row, mj_row, *acc)

    if interpret or nt < 4:
        for kk in range(nt):
            acc = call(kk, (nt,), acc)
        axi, ayi, axj, ayj = acc
    else:
        axi, ayi, axj, ayj = call(None, (nt, nt), acc)

    acc_i = jnp.stack([axi[:, 0], ayi[:, 0]], axis=1)
    acc_j = jnp.stack([axj[0, :], ayj[0, :]], axis=1)
    return acc_i, acc_j


def _allpairs_kernel(xi_ref, yi_ref, xj_ref, yj_ref, mj_ref,
                     ax_ref, ay_ref, softening2: float, rcp: str):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        ax_ref[:] = jnp.zeros_like(ax_ref)
        ay_ref[:] = jnp.zeros_like(ay_ref)

    dx = xj_ref[:] - xi_ref[:]          # (1,TJ) - (TI,1) -> (TI,TJ)
    dy = yj_ref[:] - yi_ref[:]
    cx, cy = mono_tile(dx, dy, mj_ref[:], softening2, rcp)
    ax_ref[:] += jnp.sum(cx, axis=1, keepdims=True)
    ay_ref[:] += jnp.sum(cy, axis=1, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("softening2", "tile_i", "tile_j", "interpret", "rcp"),
)
def allpairs_accel(pos: jax.Array, mass: jax.Array,
                   src_pos: jax.Array | None = None,
                   src_mass: jax.Array | None = None,
                   softening2: float = 1e-3,
                   tile_i: int = 512, tile_j: int = 2048,
                   interpret: bool = False, rcp: str = "newton") -> jax.Array:
    """Acceleration of targets ``pos`` due to sources (default: themselves).

    ``pos`` f32[Ni,2], ``mass`` f32[Ni]; optional ``src_pos`` f32[Nj,2],
    ``src_mass`` f32[Nj]. Ni/Nj must be multiples of the tile sizes (use
    ``ParticleState.pad_to``). Returns f32[Ni,2].

    ``rcp`` selects how 1/(s*d2) is computed:
      - "exact": IEEE fp32 division (bitwise-matches the oracle on CPU)
      - "newton" (default): VPU approximate reciprocal + one Newton step —
        measured ≤6e-6 relative deviation from exact, ~1.5x faster
      - "approx": raw approximate reciprocal (≤6e-4 deviation, fastest)
      - "newton+clamp" / "approx+clamp": same reciprocal, with the
        is_normal mask replaced by a 1-op L1 clamp (see mono_tile) —
        bitwise-identical for finite world-scale inputs, fastest guard
    """
    if src_pos is None:
        src_pos = pos
    if src_mass is None:
        src_mass = mass
    ni = pos.shape[0]
    nj = src_pos.shape[0]
    tile_i = min(tile_i, ni)
    tile_j = min(tile_j, nj)
    if ni % tile_i or nj % tile_j:
        raise ValueError(
            f"N=({ni},{nj}) not divisible by tiles ({tile_i},{tile_j})")
    if rcp not in RCP_MODES:
        raise ValueError(f"rcp must be one of {RCP_MODES}, got {rcp!r}")
    if interpret or jax.default_backend() == "cpu":
        interpret = True  # Mosaic only targets TPU; CPU runs interpreted
        rcp = "exact"     # pl.reciprocal(approx) has no interpreter lowering

    x_col = pos[:, 0:1]                       # (Ni, 1) — target layout
    y_col = pos[:, 1:2]
    x_row = src_pos[:, 0].reshape(1, nj)      # (1, Nj) — source layout
    y_row = src_pos[:, 1].reshape(1, nj)
    m_row = src_mass.reshape(1, nj)

    grid = (ni // tile_i, nj // tile_j)
    kernel = functools.partial(_allpairs_kernel, softening2=softening2,
                               rcp=rcp)

    ax, ay = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ni, 1), jnp.float32),
            jax.ShapeDtypeStruct((ni, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=FLOPS_PER_PAIR * ni * nj,
            bytes_accessed=3 * nj * 4 * (ni // tile_i) + 4 * ni * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_col, y_col, x_row, y_row, m_row)

    return jnp.concatenate([ax, ay], axis=1)

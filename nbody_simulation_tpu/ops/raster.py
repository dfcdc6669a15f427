"""On-device framebuffer raster — the reference splat loop, made commutative.

The reference draws sequentially (reference src/main.rs:41-72): clear; for
each in-bounds particle at pixel (x/80, y/80) — integer scale, src/main.rs:51
— heavy particles (weight > 10) paint solid green with α=0xff; light
particles, when the pixel isn't green-locked (α != 0xff), paint
R=0xff, G=B=0xff−(0x10+min(0xef, sat_u8((|vx|+|vy|)·10))) and bump α by 10
while α ≤ 240.

That loop is order-dependent, but its FINAL framebuffer is not, because only
heavy particles set α=0xff and they always overwrite:

- a pixel hit by ≥1 heavy particle ends (0, 255, 0, 255) regardless of order;
- otherwise, with k light hits, every hit executes, so α = min(10k, 250) and
  the color comes from the LAST light particle in array order.

So the commutative scatter formulation below — heavy-any (scatter-max),
light-count (scatter-add), last-light-index (scatter-max) + one gather —
reproduces the sequential result EXACTLY, pixel for pixel (verified against
the oracle loop in tests/test_raster.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def accumulate_pixels(pos: jax.Array, vel: jax.Array, mass: jax.Array,
                      world_size: float, render_size: int,
                      heavy_weight: float, pack_tint: bool | None = None):
    """The commutative per-pixel reductions + the tint of the last light
    hit: ``(green i32, count i32, last i32, vlast i32)``, each flat
    (npix,). ``last`` is the particle-ARRAY index (-1 = none) — the merge
    key that makes the scatter order-free; the distributed renderer
    (parallel/raster.py) offsets it per shard and merges shards with
    pmax/psum before colorizing.

    TWO scatters total (XLA TPU scatter costs ~6 ms per 1M updates
    regardless of sortedness hints — benchmarks/probe_raster.py round 5;
    the original 3-scatter + npix-gather form measured 39 ms at N=1M,
    this one 20.5):

    - scatter-MAX of one packed key: heavy → 2³⁰ (dominates every light
      key), light → idx·256 + vterm (idx dominates the tint bits, and a
      given idx has one vterm, so the max IS the last light hit);
    - scatter-ADD of the light count.

    Shadowing semantics: at a pixel hit by BOTH heavy and light particles
    the packed max is the heavy key, so ``last``/``vlast`` report -1/0
    there instead of the actual last light hit. That pixel's green flag is
    set on this shard, hence set in any pmax merge containing it, and
    ``colorize_pixels`` ignores light data on green pixels — the FRAME is
    pixel-identical, single-chip and distributed (probe_raster.py asserts
    it; tests/test_raster.py + test_distributed.py gate it).

    The idx·256 packing needs idx < 2²². N beyond that (single-chip 16.7M
    runs) drops the vterm bits from the key and gathers the tint instead
    (the pre-round-5 formulation, one extra npix gather). ``pack_tint``
    overrides the size-based choice (tests exercise both branches at
    small N and assert identical outputs).
    """
    n = pos.shape[0]
    npix = render_size * render_size
    scale = int(world_size) // render_size  # integer scale (src/main.rs:51)

    x, y = pos[:, 0], pos[:, 1]
    # within_bounds (src/main.rs:223-226): NaN fails all comparisons → out.
    in_b = (y < world_size) & (x < world_size) & (y >= 0.0) & (x >= 0.0)
    cx = (x.astype(jnp.uint32) // scale).astype(jnp.int32)
    cy = (y.astype(jnp.uint32) // scale).astype(jnp.int32)
    pix = jnp.where(in_b, cy * render_size + cx, npix)  # npix = drop sentinel

    heavy = mass > jnp.float32(heavy_weight)
    light = ~heavy
    idx = jnp.arange(n, dtype=jnp.int32)

    # Per-particle velocity tint term: 0x10 + min(0xef, sat_u8(speed*10))
    # (src/main.rs:61-63; Rust f32→u8 casts saturate, NaN → 0).
    speed = (jnp.abs(vel[:, 0]) + jnp.abs(vel[:, 1])) * jnp.float32(10.0)
    speed = jnp.where(jnp.isnan(speed), 0.0, speed)
    v8 = jnp.clip(speed, 0.0, 255.0).astype(jnp.int32)
    vterm = jnp.int32(0x10) + jnp.minimum(v8, jnp.int32(0xEF))

    count = (jnp.zeros(npix, jnp.int32)
             .at[pix].add(light.astype(jnp.int32), mode="drop"))
    if pack_tint is None:
        pack_tint = n < (1 << 22)
    if pack_tint:
        if n >= (1 << 22):
            raise ValueError(f"pack_tint needs idx < 2^22, got N={n}")
        key = jnp.where(heavy, jnp.int32(1 << 30), idx * 256 + vterm)
        mx = jnp.full(npix, -1, jnp.int32).at[pix].max(key, mode="drop")
        green = (mx >= (1 << 30)).astype(jnp.int32)
        has_light = (mx >= 0) & (mx < (1 << 30))
        last = jnp.where(has_light, mx // 256, -1)
        vlast = jnp.where(has_light, mx % 256, 0)
    else:
        key = jnp.where(heavy, jnp.int32(1 << 30), idx)
        mx = jnp.full(npix, -1, jnp.int32).at[pix].max(key, mode="drop")
        green = (mx >= (1 << 30)).astype(jnp.int32)
        has_light = (mx >= 0) & (mx < (1 << 30))
        last = jnp.where(has_light, mx, -1)
        vlast = jnp.where(has_light, vterm[jnp.maximum(last, 0)], 0)
    return green, count, last, vlast


def colorize_pixels(green: jax.Array, count: jax.Array, vlast: jax.Array,
                    render_size: int) -> jax.Array:
    """Per-pixel reductions → RGBA u8 frame (the src/main.rs:55-68 rules)."""
    grn = green > 0
    lit = count > 0
    r = jnp.where(grn, 0, jnp.where(lit, 0xFF, 0))
    g = jnp.where(grn, 0xFF, jnp.where(lit, 0xFF - vlast, 0))
    b = jnp.where(grn, 0, jnp.where(lit, 0xFF - vlast, 0))
    a = jnp.where(grn, 0xFF,
                  jnp.where(lit, jnp.minimum(10 * count, 250), 0))
    frame = jnp.stack([r, g, b, a], axis=-1).astype(jnp.uint8)
    return frame.reshape(render_size, render_size, 4)


@functools.partial(jax.jit, static_argnames=("world_size", "render_size",
                                             "heavy_weight"))
def render_frame(pos: jax.Array, vel: jax.Array, mass: jax.Array,
                 world_size: float = 100_000.0, render_size: int = 1250,
                 heavy_weight: float = 10.0) -> jax.Array:
    """RGBA u8 framebuffer of shape (render_size, render_size, 4)."""
    green, count, _, vlast = accumulate_pixels(
        pos, vel, mass, world_size, render_size, heavy_weight)
    return colorize_pixels(green, count, vlast, render_size)


@functools.partial(jax.jit, static_argnames=("cap", "world_size",
                                             "render_size", "heavy_weight"))
def render_frame_sparse(pos: jax.Array, vel: jax.Array, mass: jax.Array,
                        cap: int, world_size: float = 100_000.0,
                        render_size: int = 1250,
                        heavy_weight: float = 10.0):
    """Sparse frame: (idx i32[cap], rgba u32[cap]) of lit pixels only.

    At most ``cap`` pixels can be lit (one particle lights one pixel, so
    cap ≥ the real particle count is exact). The host reconstructs with
    ``sparse_to_frame``. This keeps the device→host transfer proportional to
    the LIT pixels instead of the framebuffer — the HBM-bandwidth rule of
    minimizing host transfers (a 1250² RGBA frame is 6.25 MB; the reference
    galaxy lights ~80k pixels ≈ 0.6 MB sparse).
    """
    frame = render_frame(pos, vel, mass, world_size=world_size,
                         render_size=render_size, heavy_weight=heavy_weight)
    npix = render_size * render_size
    flat = frame.reshape(npix, 4).astype(jnp.uint32)
    packed = (flat[:, 0] | (flat[:, 1] << 8) | (flat[:, 2] << 16)
              | (flat[:, 3] << 24))
    lit = flat[:, 3] > 0
    (idx,) = jnp.nonzero(lit, size=cap, fill_value=npix)
    vals = jnp.where(idx < npix, packed[jnp.minimum(idx, npix - 1)], 0)
    return idx.astype(jnp.int32), vals


def sparse_to_frame(idx, vals, render_size: int = 1250):
    """Host-side reconstruction of the dense RGBA frame (native C++ stage
    with a NumPy fallback — runtime/frame.py)."""
    import numpy as np

    from nbody_simulation_tpu.runtime.frame import reconstruct
    return reconstruct(np.asarray(idx), np.asarray(vals), render_size)

"""NumPy oracles mirroring the reference semantics operation-for-operation.

These are the ground truth for the test suite (SURVEY.md §4): scalar fp32
NumPy arithmetic matches IEEE f32 exactly, so on CPU the JAX kernels must
agree bitwise per pair, and within accumulation-order tolerance for sums.

- ``pair_accel_oracle``   — reference src/main.rs:234-253 (calculate_gravity)
- ``direct_accel_oracle`` — exact per-pair fp32 contributions accumulated in
  float64 (the "truth" both the Rust build and the TPU build are fp32
  perturbations of)
- ``euler_oracle``        — reference src/main.rs:419-423
- ``draw_oracle``         — the exact sequential splat loop, src/main.rs:41-72
"""

from __future__ import annotations

import numpy as np

FLT_MIN_NORMAL = np.float32(1.17549435e-38)


def pair_accel_oracle(p1: np.ndarray, p2: np.ndarray, mass2: float,
                      softening2: float = 1e-3) -> np.ndarray:
    """Single-pair acceleration, scalar fp32, exact reference op order."""
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    m = np.float32(mass2)
    dx = np.float32(p2[0] - p1[0])
    dy = np.float32(p2[1] - p1[1])
    s = np.float32(np.abs(dx) + np.abs(dy))
    # f32::is_normal: finite, nonzero, not subnormal (s >= 0 always here).
    if not np.isfinite(s) or s < FLT_MIN_NORMAL:
        return np.zeros(2, np.float32)
    d2 = np.float32(dx * dx + dy * dy)
    if d2 < np.float32(softening2):
        d2 = np.float32(softening2)
    den = np.float32(s * d2)
    return np.array([np.float32(dx * m) / den, np.float32(dy * m) / den],
                    np.float32)


def direct_accel_oracle(pos: np.ndarray, mass: np.ndarray,
                        softening2: float = 1e-3,
                        accumulate_f64: bool = True) -> np.ndarray:
    """All-pairs acceleration. Per-pair terms are exact fp32 (vectorized
    NumPy f32 ops are IEEE-identical to the scalar loop); accumulation is
    float64 by default to serve as order-independent truth."""
    pos = np.asarray(pos, np.float32)
    mass = np.asarray(mass, np.float32)
    n = pos.shape[0]
    acc_dtype = np.float64 if accumulate_f64 else np.float32
    out = np.zeros((n, 2), acc_dtype)
    x, y = pos[:, 0], pos[:, 1]
    for i in range(n):
        dx = x - x[i]
        dy = y - y[i]
        s = np.abs(dx) + np.abs(dy)
        normal = np.isfinite(s) & (s >= FLT_MIN_NORMAL)
        d2 = np.maximum(dx * dx + dy * dy, np.float32(softening2))
        den = np.where(normal, s * d2, np.float32(1.0))
        ax = np.where(normal, (dx * mass) / den, np.float32(0.0))
        ay = np.where(normal, (dy * mass) / den, np.float32(0.0))
        out[i, 0] = ax.astype(acc_dtype).sum()
        out[i, 1] = ay.astype(acc_dtype).sum()
    return out


def euler_oracle(pos, vel, accel, dt):
    """Semi-implicit Euler, fp32 (src/main.rs:419-423)."""
    pos = np.asarray(pos, np.float32).copy()
    vel = np.asarray(vel, np.float32).copy()
    accel = np.asarray(accel, np.float32)
    dt = np.float32(dt)
    vel += accel * dt
    pos += vel * dt
    return pos, vel


def draw_oracle(pos: np.ndarray, vel: np.ndarray, mass: np.ndarray,
                world_size: float = 100_000.0, render_size: int = 1250,
                heavy_weight: float = 10.0) -> np.ndarray:
    """The exact sequential splat loop (src/main.rs:41-72).

    Returns an RGBA u8 framebuffer of shape (render_size, render_size, 4).
    Order-dependent by construction — iterates particles in array order.
    """
    frame = np.zeros((render_size, render_size, 4), np.uint8)
    scale = int(world_size) // render_size  # integer division, src/main.rs:51
    ws = np.float32(world_size)
    for i in range(pos.shape[0]):
        px, py = np.float32(pos[i, 0]), np.float32(pos[i, 1])
        # within_bounds, src/main.rs:223-226
        if not (py < ws and px < ws and py >= 0.0 and px >= 0.0):
            continue
        cx = int(np.uint32(px) // scale)
        cy = int(np.uint32(py) // scale)
        if mass[i] > heavy_weight:
            frame[cy, cx] = (0x00, 0xFF, 0x00, 0xFF)
        elif frame[cy, cx, 3] != 0xFF:
            speed = np.float32((abs(np.float32(vel[i, 0]))
                                + abs(np.float32(vel[i, 1]))) * np.float32(10.0))
            # Rust `as u8` on f32 saturates to [0, 255].
            v8 = int(min(max(speed, 0.0), 255.0))
            velocity = 0x10 + min(v8, 0xEF)
            frame[cy, cx, 0] = 0xFF
            frame[cy, cx, 1] = 0xFF - velocity
            frame[cy, cx, 2] = 0xFF - velocity
            if frame[cy, cx, 3] <= 240:
                frame[cy, cx, 3] += 10
    return frame

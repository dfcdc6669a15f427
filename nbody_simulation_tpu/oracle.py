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


class _RefNode:
    """One node of the reference's BVH (src/bvh_tree.rs:24-35)."""
    __slots__ = ("offset", "size", "idx", "left", "right", "com", "mass")

    def __init__(self):
        self.idx = None      # leaf: member indices
        self.left = self.right = None


def bvh_build_oracle(pos: np.ndarray, mass: np.ndarray,
                     leaf_size: int = 64) -> _RefNode:
    """The reference's BVH construction, op-for-op (src/bvh_tree.rs:57-96)
    plus its summarize pass (src/bvh_tree.rs:98-158), over index arrays.

    Faithful quirks: the bounds fold starts max at (0,0) (:59), the mean
    split partitions by ``coord > mean`` choosing the better-balancing axis
    (:69-77, ties split on y), recursion stops at 64 points (:37), a LEAF's
    COM is the unweighted mean of positions (:98-116) while its mass is the
    weight sum (:118-131), and internal COMs are mass-weighted (:148-155).
    """
    pos = np.asarray(pos, np.float32)
    massi = np.asarray(mass, np.int64)

    def make_leaf(idx):  # src/bvh_tree.rs:40-54
        node = _RefNode()
        p = pos[idx]
        mn = p.min(axis=0) if len(idx) else np.array([3.4e38, 3.4e38], np.float32)
        mx = np.maximum(p.max(axis=0), 0.0) if len(idx) else np.zeros(2, np.float32)
        node.offset, node.size = mn, mx - mn
        node.idx = idx
        node.com = (p.sum(axis=0, dtype=np.float32) / np.float32(len(idx))
                    if len(idx) else np.zeros(2, np.float32))
        node.mass = int(massi[idx].sum())
        return node

    def build(idx):  # src/bvh_tree.rs:57-96
        p = pos[idx]
        mn = p.min(axis=0)
        mx = np.maximum(p.max(axis=0), 0.0)   # max fold starts at (0,0)
        mean = (p.sum(axis=0, dtype=np.float32) / np.float32(len(idx)))
        half = len(idx) // 2
        hori = abs(half - int((p[:, 0] > mean[0]).sum()))
        vert = abs(half - int((p[:, 1] > mean[1]).sum()))
        if vert > hori:
            pred = p[:, 0] > mean[0]
        else:
            pred = p[:, 1] > mean[1]
        left_idx, right_idx = idx[pred], idx[~pred]
        node = _RefNode()
        node.offset, node.size = mn, mx - mn
        node.left = (build(left_idx) if len(left_idx) > leaf_size
                     else make_leaf(left_idx))
        node.right = (build(right_idx) if len(right_idx) > leaf_size
                      else make_leaf(right_idx))
        # summarize (src/bvh_tree.rs:133-158)
        node.mass = node.left.mass + node.right.mass
        node.com = ((node.left.com * np.float32(node.left.mass)
                     + node.right.com * np.float32(node.right.mass))
                    / np.float32(node.mass))
        return node

    idx = np.arange(pos.shape[0])
    return build(idx) if len(idx) > leaf_size else make_leaf(idx)


def bvh_walk_oracle(tree: _RefNode, pos: np.ndarray, mass: np.ndarray,
                    target: np.ndarray, theta: float,
                    softening2: float = 1e-3) -> np.ndarray:
    """The reference's per-particle recursive walk (src/main.rs:348-386):
    accept a node's COM iff the particle is strictly outside its AABB and
    max(w,h)² < d2(particle, com)·θ²; leaves run the exact pair loop.

    fp32 accumulation in walk order, like the Rust loop.
    """
    pos = np.asarray(pos, np.float32)
    mass = np.asarray(mass, np.float32)
    t = np.asarray(target, np.float32)
    th2 = np.float32(theta) * np.float32(theta)
    acc = np.zeros(2, np.float32)

    def pair(px, py, m):
        nonlocal acc
        dx = np.float32(px - t[0])
        dy = np.float32(py - t[1])
        s = np.float32(abs(dx) + abs(dy))
        if not np.isfinite(s) or s < FLT_MIN_NORMAL:
            return
        d2 = max(np.float32(dx * dx + dy * dy), np.float32(softening2))
        den = np.float32(s * d2)
        acc = acc + np.array([dx * m / den, dy * m / den], np.float32)

    stack = [tree]
    while stack:
        node = stack.pop()
        if node.idx is not None:                    # leaf: exact loop
            # Vectorized f32 (identical per-pair terms; summation order
            # differs from the scalar loop only at the ~1ulp level).
            p = pos[node.idx]
            m = mass[node.idx]
            dx = p[:, 0] - t[0]
            dy = p[:, 1] - t[1]
            s = np.abs(dx) + np.abs(dy)
            normal = np.isfinite(s) & (s >= FLT_MIN_NORMAL)
            d2 = np.maximum(dx * dx + dy * dy, np.float32(softening2))
            den = np.where(normal, s * d2, np.float32(1.0))
            acc = acc + np.array(
                [np.where(normal, dx * m / den, np.float32(0.0)).sum(dtype=np.float32),
                 np.where(normal, dy * m / den, np.float32(0.0)).sum(dtype=np.float32)],
                np.float32)
            continue
        o, sz, c = node.offset, node.size, node.com
        contains = (t[1] > o[1] and t[0] > o[0]
                    and t[0] < o[0] + sz[0] and t[1] < o[1] + sz[1])
        s2 = np.float32(max(sz[0], sz[1])) ** 2
        d2 = np.float32((t[0] - c[0]) ** 2 + (t[1] - c[1]) ** 2)
        if (not contains) and s2 < d2 * th2:
            pair(c[0], c[1], np.float32(node.mass))
        else:
            stack.append(node.right)
            stack.append(node.left)
    return acc


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

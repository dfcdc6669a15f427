"""Scenario generators (host-side, NumPy, seeded).

``galaxy`` reproduces the reference's World::new exactly (reference
src/main.rs:275-346):

- heavy body 1: w=75,000,000 at (35000,35000) moving (200,250)
  (src/main.rs:282-286)
- heavy body 2: w=750,000 at (60000,60000) at rest (src/main.rs:287-291)
- an annulus disc around body 2: the (HEIGHT/14 - 1)² lattice of points
  (14x, 14y), kept when 5e5 < d² < 1.5e7 with probabilistic density falloff
  ``U[0, (1.5e7 - d²) + 1) > 6e6``, given tangential orbital velocity
  ``rotate_right(r) * sqrt(sqrt(750000)/d²)`` (src/main.rs:316-332)
- 100,000 bodies on a center-biased disc of radius 25000 around
  (50000,50000) with center-biased unit-disc velocities
  (src/main.rs:255-269, 333-342)

Expected total ≈ 151,382 particles (2 + ~51,380 annulus + 100,000; the
reference prints the count at startup, src/main.rs:343).

``uniform_disc`` and ``plummer`` cover BASELINE.json configs 1-2.
"""

from __future__ import annotations

import numpy as np

from nbody_simulation_tpu.state import ParticleState

TAU = 2.0 * np.pi


def _rand_disc(rng: np.random.Generator, n: int) -> np.ndarray:
    """The reference's rand_disc (src/main.rs:255-258): (cosθ, sinθ)·r with
    r ~ U[0,1) — note NO sqrt, so samples are center-biased."""
    theta = rng.random(n, dtype=np.float32) * np.float32(TAU)
    r = rng.random(n, dtype=np.float32)
    return np.stack([np.cos(theta) * r, np.sin(theta) * r], axis=-1).astype(np.float32)


def _rotate_right(v: np.ndarray) -> np.ndarray:
    """(x, y) -> (y, -x) (src/main.rs:271-273)."""
    return np.stack([v[..., 1], -v[..., 0]], axis=-1)


def galaxy(seed: int = 0, world_size: float = 100_000.0,
           n_random: int = 100_000) -> ParticleState:
    """The reference's exact startup scenario."""
    rng = np.random.default_rng(seed)
    height = int(world_size)

    pos, vel, mass = [], [], []
    circle2 = np.array([60_000.0, 60_000.0], np.float32)

    # Two heavy bodies (src/main.rs:282-291).
    pos.append(np.array([[35_000.0, 35_000.0]], np.float32))
    vel.append(np.array([[200.0, 250.0]], np.float32))
    mass.append(np.array([75_000_000.0], np.float32))
    pos.append(circle2[None])
    vel.append(np.array([[0.0, 0.0]], np.float32))
    mass.append(np.array([750_000.0], np.float32))

    # Annulus lattice around body 2 (src/main.rs:316-332). The lattice spans
    # x,y in 0..(height/14 - 1) but only points within sqrt(1.5e7) of circle2
    # can pass the distance test — restrict to that index window.
    c1lenr2 = np.float32(15_000_000.0)
    grid_n = height // 14 - 1  # exclusive upper bound of the Rust 0..k range
    r_max = np.sqrt(float(c1lenr2))
    lo = max(0, int((circle2[0] - r_max) / 14.0) - 1)
    hi = min(grid_n, int((circle2[0] + r_max) / 14.0) + 2)
    idx = np.arange(lo, hi, dtype=np.float32)
    gx, gy = np.meshgrid(idx * np.float32(14.0), idx * np.float32(14.0),
                         indexing="ij")
    gpos = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)
    diff = gpos - circle2
    d2 = (diff[:, 0] * diff[:, 0] + diff[:, 1] * diff[:, 1]).astype(np.float32)
    in_ring = (d2 < c1lenr2) & (d2 > np.float32(500_000.0))
    # rng.gen_range(0f32..(c1lenr2 - d2) + 1.0) > 6e6  (src/main.rs:321)
    upper = (c1lenr2 - d2) + np.float32(1.0)
    draw = rng.random(d2.shape[0], dtype=np.float32) * upper
    keep = in_ring & (draw > np.float32(6_000_000.0))
    kpos = gpos[keep]
    kd2 = d2[keep]
    scale = np.sqrt(np.sqrt(np.float32(750_000.0)) / kd2).astype(np.float32)
    kvel = _rotate_right(kpos - circle2) * scale[:, None]
    pos.append(kpos)
    vel.append(kvel.astype(np.float32))
    mass.append(np.ones(kpos.shape[0], np.float32))

    # Center-biased random disc (src/main.rs:333-342).
    offset = np.array([50_000.0, 50_000.0], np.float32)
    rpos = _rand_disc(rng, n_random) * np.float32(25_000.0) + offset
    rvel = _rand_disc(rng, n_random)
    pos.append(rpos)
    vel.append(rvel)
    mass.append(np.ones(n_random, np.float32))

    return ParticleState.create(
        np.concatenate(pos), np.concatenate(vel), np.concatenate(mass))


def collision(seed: int = 0, n_per_galaxy: int = 50_000) -> ParticleState:
    """Two galaxy discs on a collision course — a scenario family the
    reference doesn't ship but its engine invites (heavy core + tangential
    disc, twice, approaching)."""
    rng = np.random.default_rng(seed)
    pos, vel, mass = [], [], []
    for center, v0, w in [((30_000.0, 30_000.0), (60.0, 45.0), 5_000_000.0),
                          ((70_000.0, 70_000.0), (-60.0, -45.0), 5_000_000.0)]:
        c = np.array(center, np.float32)
        pos.append(c[None])
        vel.append(np.array([v0], np.float32))
        mass.append(np.array([w], np.float32))
        theta = rng.random(n_per_galaxy, dtype=np.float32) * np.float32(TAU)
        r = (np.sqrt(rng.random(n_per_galaxy, dtype=np.float32))
             * np.float32(12_000.0) + np.float32(500.0))
        p = np.stack([np.cos(theta) * r, np.sin(theta) * r], -1) + c
        d2 = ((p - c) ** 2).sum(-1).astype(np.float32)
        scale = np.sqrt(np.sqrt(np.float32(w)) / d2).astype(np.float32)
        v = _rotate_right(p - c) * scale[:, None] + np.asarray(v0, np.float32)
        pos.append(p.astype(np.float32))
        vel.append(v.astype(np.float32))
        mass.append(np.ones(n_per_galaxy, np.float32))
    return ParticleState.create(
        np.concatenate(pos), np.concatenate(vel), np.concatenate(mass))


def uniform_disc(n: int, seed: int = 0, radius: float = 25_000.0,
                 center=(50_000.0, 50_000.0)) -> ParticleState:
    """N unit-mass bodies uniform on a disc with small random velocities
    (BASELINE.json config 1 workload shape)."""
    rng = np.random.default_rng(seed)
    theta = rng.random(n, dtype=np.float32) * np.float32(TAU)
    r = np.sqrt(rng.random(n, dtype=np.float32)) * np.float32(radius)
    pos = np.stack([np.cos(theta) * r + center[0],
                    np.sin(theta) * r + center[1]], axis=-1).astype(np.float32)
    vel = _rand_disc(rng, n)
    return ParticleState.create(pos, vel, np.ones(n, np.float32))


def _chunk_bounds(n: int, pid: int, nproc: int) -> tuple[int, int]:
    """Row range [lo, hi) of process ``pid``'s chunk of ``n`` rows —
    delegates to THE shared convention (parallel/multihost.chunk_bounds),
    which sharded-checkpoint reassembly also uses."""
    from nbody_simulation_tpu.parallel.multihost import chunk_bounds
    return chunk_bounds(n, pid, nproc)


def galaxy_chunk(pid: int, nproc: int, seed: int = 0,
                 world_size: float = 100_000.0,
                 n_random: int = 100_000) -> ParticleState:
    """Process ``pid``'s chunk of the galaxy scenario (multi-host init).

    The union over all ``nproc`` chunks is the reference scenario: the two
    heavy bodies (process 0) and the annulus are EXACTLY the single-process
    particles (the annulus keep-draw is a deterministic function of
    ``seed`` over the O(√N)-sized lattice, so each process evaluates the
    full lattice mask — KBs — and keeps only its band), while the
    ``n_random`` disc bodies are split evenly with per-process derived
    seeds (same distribution; per-process host memory stays O(N/nproc),
    which is the point — reference src/main.rs:275-346 builds the whole
    thing in one Vec).

    ``nproc == 1`` returns ``galaxy(seed, ...)`` bitwise.
    """
    if nproc == 1:
        return galaxy(seed=seed, world_size=world_size, n_random=n_random)
    full = galaxy(seed=seed, world_size=world_size, n_random=0)
    n_struct = full.n  # 2 heavy + annulus — O(√world) rows, cheap everywhere
    lo, hi = _chunk_bounds(n_struct, pid, nproc)
    pos = [np.asarray(full.pos[lo:hi])]
    vel = [np.asarray(full.vel[lo:hi])]
    mass = [np.asarray(full.mass[lo:hi])]
    dlo, dhi = _chunk_bounds(n_random, pid, nproc)
    if dhi > dlo:
        rng = np.random.default_rng(np.random.SeedSequence([seed, 977, pid]))
        offset = np.array([50_000.0, 50_000.0], np.float32)
        rpos = _rand_disc(rng, dhi - dlo) * np.float32(25_000.0) + offset
        pos.append(rpos)
        vel.append(_rand_disc(rng, dhi - dlo))
        mass.append(np.ones(dhi - dlo, np.float32))
    return ParticleState.create(
        np.concatenate(pos), np.concatenate(vel), np.concatenate(mass))


def scenario_chunk(name: str, pid: int, nproc: int, seed: int = 0,
                   exact: bool = False, **kw) -> ParticleState:
    """Process ``pid``'s chunk of a named scenario for multi-host init.

    ``exact=False`` (production): each process generates only its rows with
    a derived per-process seed — O(N/nproc) host memory, union has the same
    distribution as the single-process scenario but a different RNG
    realization. ``exact=True`` (testing/parity): each process generates
    the FULL scenario and slices its row band — O(N) transient host memory,
    union bitwise equal to the single-process particle set regardless of
    ``nproc``.
    """
    if name == "galaxy":
        if exact and nproc > 1:
            # Honor the bitwise process-count-invariance contract: build
            # the FULL galaxy (O(N) transient host memory, like the other
            # exact branches) and slice this process's band. The streaming
            # galaxy_chunk draws its disc bodies from per-process seeds,
            # which is a different RNG realization per nproc.
            full = galaxy(seed=seed, **kw)
            lo, hi = _chunk_bounds(full.n, pid, nproc)
            return ParticleState.create(np.asarray(full.pos[lo:hi]),
                                        np.asarray(full.vel[lo:hi]),
                                        np.asarray(full.mass[lo:hi]))
        return galaxy_chunk(pid, nproc, seed=seed, **kw)
    gen = {"uniform": uniform_disc, "plummer": plummer,
           "collision": collision}[name]
    # collision's two heavy cores are structural — streaming per-process
    # seeds would duplicate them nproc times, so it always takes the
    # exact-slice path.
    if exact or nproc == 1 or name == "collision":
        full = gen(seed=seed, **kw)
        lo, hi = _chunk_bounds(full.n, pid, nproc)
        return ParticleState.create(np.asarray(full.pos[lo:hi]),
                                    np.asarray(full.vel[lo:hi]),
                                    np.asarray(full.mass[lo:hi]))
    pseed = np.random.SeedSequence([seed, 7919, pid]).generate_state(1)[0]
    n = kw.pop("n")
    lo, hi = _chunk_bounds(n, pid, nproc)
    return gen(hi - lo, seed=int(pseed), **kw)


def plummer(n: int, seed: int = 0, scale_radius: float = 5_000.0,
            center=(50_000.0, 50_000.0), total_mass: float | None = None,
            world_size: float = 100_000.0) -> ParticleState:
    """Plummer-like 2D cluster (BASELINE.json config 2 workload shape).

    The halo is clipped to 10 scale radii AND to the world bounds (particles
    outside [0, world)² would be dropped by the renderer and clamped by the
    Morton quantizer)."""
    rng = np.random.default_rng(seed)
    # Inverse-CDF sampling of the Plummer radial profile, projected to 2D.
    u = rng.random(n, dtype=np.float32)
    r = scale_radius / np.sqrt(np.maximum(u ** (-2.0 / 3.0) - 1.0, 1e-9))
    r_max = min(10.0 * scale_radius,
                center[0], center[1],
                world_size - center[0] - 1.0, world_size - center[1] - 1.0)
    r = np.minimum(r, r_max).astype(np.float32)
    theta = rng.random(n, dtype=np.float32) * np.float32(TAU)
    pos = np.stack([np.cos(theta) * r + center[0],
                    np.sin(theta) * r + center[1]], axis=-1).astype(np.float32)
    vel = _rand_disc(rng, n) * np.float32(0.1)
    m = np.float32((total_mass or n) / n)
    return ParticleState.create(pos, vel, np.full(n, m, np.float32))

"""Host-side track construction: waypoint polylines baked to device arrays.

Replaces the reference's CARLA HD-map plumbing: `compute_route_waypoints`
(reference: CarlaEnv/planner.py:12-126) produced a list of
`(carla.Waypoint, RoadOption)` pairs at 1 m resolution by walking Town07's
road graph; here we synthesize equivalent geometry in numpy at startup and
ship only padded float32 arrays to the device (`TrackData`).

Two generators:

- `make_lap_track`: a closed country-road loop standing in for the Town07
  outskirts lap (reference: carla_lap_env.py:188-189, plan
  [STRAIGHT] + [RIGHT]*2 + [STRAIGHT]*5 at 1 m resolution, ~1 km around).
  Built as a smooth Fourier-perturbed circle so the loop closes exactly and
  new track shapes are one seed away (domain randomization).
- `make_segment_track`: explicit straight/arc segment programs, for tests
  and custom circuits.

This runs once on the host; nothing here is in the compiled step path.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import numpy as np

import jax.numpy as jnp

from carla_ppo_tpu.envs.types import PROP_STRIDE, RoadOption, SegClass, TrackData

# Curvature (1/m) above which a waypoint is tagged as a turn.
_TURN_CURVATURE = 1.0 / 40.0
# Default lane half-width; CARLA Town07 lanes are ~3.5 m wide.
DEFAULT_HALF_WIDTH = 1.75


def _resample_polyline(
    points: np.ndarray, resolution: float, closed: bool
) -> np.ndarray:
    """Resample a dense polyline at uniform arc-length `resolution`."""
    if closed:
        points = np.vstack([points, points[:1]])
    seg = np.diff(points, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = s[-1]
    n = int(np.floor(total / resolution))
    targets = np.arange(n) * resolution
    x = np.interp(targets, s, points[:, 0])
    y = np.interp(targets, s, points[:, 1])
    return np.stack([x, y], axis=1)


def _forward_vectors(pos: np.ndarray, closed: bool) -> np.ndarray:
    nxt = np.roll(pos, -1, axis=0) if closed else np.vstack([pos[1:], pos[-1:]])
    prv = np.roll(pos, 1, axis=0) if closed else np.vstack([pos[:1], pos[:-1]])
    fwd = nxt - prv
    norm = np.linalg.norm(fwd, axis=1, keepdims=True)
    return fwd / np.maximum(norm, 1e-9)


def _curvature(pos: np.ndarray, fwd: np.ndarray, closed: bool) -> np.ndarray:
    """Signed curvature (positive = left turn) from heading differences."""
    yaw = np.arctan2(fwd[:, 1], fwd[:, 0])
    dyaw = np.diff(yaw, append=yaw[:1] if closed else yaw[-1:])
    dyaw = (dyaw + np.pi) % (2 * np.pi) - np.pi
    ds = np.linalg.norm(
        (np.roll(pos, -1, axis=0) if closed else np.vstack([pos[1:], pos[-1:]]))
        - pos,
        axis=1,
    )
    return dyaw / np.maximum(ds, 1e-9)


def _maneuvers_from_curvature(kappa: np.ndarray) -> np.ndarray:
    m = np.full(kappa.shape, int(RoadOption.LANEFOLLOW), dtype=np.int32)
    m[kappa > _TURN_CURVATURE] = int(RoadOption.LEFT)
    m[kappa < -_TURN_CURVATURE] = int(RoadOption.RIGHT)
    return m


def _pad_to(arr: np.ndarray, capacity: int, fill) -> np.ndarray:
    if arr.shape[0] > capacity:
        raise ValueError(f"track length {arr.shape[0]} exceeds capacity {capacity}")
    pad = capacity - arr.shape[0]
    if pad == 0:
        return arr
    pad_block = np.broadcast_to(
        np.asarray(fill, dtype=arr.dtype), (pad,) + arr.shape[1:]
    )
    return np.concatenate([arr, pad_block], axis=0)


def track_from_polyline(
    pos: np.ndarray,
    closed: bool,
    resolution: float = 1.0,
    half_width: float = DEFAULT_HALF_WIDTH,
    capacity: int | None = None,
    maneuver: np.ndarray | None = None,
) -> TrackData:
    """Bake a (dense) centerline polyline into a device TrackData."""
    pos = _resample_polyline(np.asarray(pos, np.float64), resolution, closed)
    fwd = _forward_vectors(pos, closed)
    if maneuver is None:
        maneuver = _maneuvers_from_curvature(_curvature(pos, fwd, closed))
    n = pos.shape[0]
    if capacity is None:
        capacity = n
    widths = np.full((n,), half_width, np.float32)
    n_slots = capacity // PROP_STRIDE
    # Pad with the last live waypoint so out-of-range gathers stay on-track.
    return TrackData(
        pos=jnp.asarray(_pad_to(pos.astype(np.float32), capacity, pos[-1])),
        fwd=jnp.asarray(_pad_to(fwd.astype(np.float32), capacity, fwd[-1])),
        maneuver=jnp.asarray(_pad_to(maneuver, capacity, maneuver[-1])),
        left_width=jnp.asarray(_pad_to(widths, capacity, half_width)),
        right_width=jnp.asarray(_pad_to(widths, capacity, half_width)),
        length=jnp.int32(n),
        is_loop=jnp.bool_(closed),
        # Empty prop tables; fill with bake_props for a scene-rich world.
        prop_class=jnp.full((n_slots, 2), int(SegClass.NONE), jnp.int32),
        prop_lateral=jnp.zeros((n_slots, 2), jnp.float32),
        prop_height=jnp.zeros((n_slots, 2), jnp.float32),
        prop_halfwidth=jnp.zeros((n_slots, 2), jnp.float32),
    )


def make_lap_track(
    seed: int = 0,
    mean_radius: float = 160.0,
    n_harmonics: int = 4,
    max_extra_curvature: float = 0.045,
    resolution: float = 1.0,
    half_width: float = DEFAULT_HALF_WIDTH,
    capacity: int | None = None,
    props: bool = False,
) -> TrackData:
    """Closed loop: Fourier-perturbed circle, ~2*pi*mean_radius meters around.

    seed=0 yields the canonical lap circuit (the "Town07 outskirts" stand-in,
    ~1 km like the reference's ~1000-waypoint lap, mixing straights with
    ~20-40 m-radius turns); other seeds give domain-randomized circuits with
    the same statistics.

    Harmonic amplitudes are sized from the small-perturbation curvature of
    r(t) = R + a*cos(k*t), namely kappa ~= 1/R + a*(k^2-1)*cos(k*t)/R^2, so
    `max_extra_curvature` directly bounds how tight the turns get.
    """
    rng = np.random.default_rng(seed)
    theta = np.linspace(0.0, 2 * np.pi, 8192, endpoint=False)
    radius = np.full_like(theta, mean_radius)
    ks = rng.choice(np.arange(3, 9), size=n_harmonics, replace=False)
    for k in ks:
        kappa_k = max_extra_curvature / n_harmonics * rng.uniform(0.6, 1.4)
        amp = kappa_k * mean_radius**2 / (k**2 - 1)
        phase = rng.uniform(0, 2 * np.pi)
        radius += amp * np.cos(k * theta + phase)
    pts = np.stack([radius * np.cos(theta), radius * np.sin(theta)], axis=1)
    track = track_from_polyline(
        pts, closed=True, resolution=resolution, half_width=half_width,
        capacity=capacity,
    )
    # `props=True` dresses the roadside with the full 13-class scene
    # (buildings/fences/poles/signs/pedestrians/parked vehicles).
    return bake_props(track, seed=seed) if props else track


def _smooth_noise(rng: np.random.Generator, n: int, scale: int) -> np.ndarray:
    """[0,1] noise with ~`scale`-slot correlation length (zone shaping)."""
    coarse = rng.uniform(size=max(n // scale + 2, 2))
    x = np.arange(n) / scale
    return np.interp(x, np.arange(coarse.size), coarse)


def bake_props(
    track: TrackData, seed: int = 0, urban_fraction: float = 0.45
) -> TrackData:
    """Dress the roadside with CARLA-style scene props (host-side, numpy).

    The reference's camera sees Town07's full 13-class world - buildings,
    fences, poles, walls, traffic signs, pedestrians, parked vehicles
    (reference: vae/vae_plots.py:49-71 palette; CarlaEnv/collect_data.py:157-163
    dual camera) - not just road/sidewalk/vegetation. This fills the track's
    prop tables procedurally: smooth "urban" zones get building facades,
    walls, poles, signs, pedestrians and street-parked vehicles; rural zones
    get fence runs and poles. Rendering happens in ops/rasterizer's billboard
    pass; geometry is (class, lateral, height, half-width) per slot/side.
    """
    rng = np.random.default_rng(seed ^ 0x5EED)
    n_slots = track.prop_slots
    live = int(track.length) // PROP_STRIDE
    wp_idx = np.minimum(np.arange(n_slots) * PROP_STRIDE, int(track.length) - 1)
    half_w = np.asarray(track.left_width)[wp_idx]  # [S]

    # Zone shaping: one urban field per side (a town usually builds up on
    # both sides at once), one fence field per side independently.
    urban = _smooth_noise(rng, n_slots, 24) < urban_fraction
    cls = np.full((n_slots, 2), int(SegClass.NONE), np.int32)
    lat = np.zeros((n_slots, 2), np.float32)
    hgt = np.zeros((n_slots, 2), np.float32)
    hwd = np.zeros((n_slots, 2), np.float32)

    for side in range(2):
        sign = 1.0 if side == 0 else -1.0
        fence_zone = _smooth_noise(rng, n_slots, 16) < 0.5
        r = rng.uniform(size=n_slots)
        # Per-slot category; probabilities differ by zone.
        #                 urban                      rural
        # buildings .42 / walls .10 / poles .08  |  fences (zone) / poles .05
        # signs .05 / pedestrians .08 / parked vehicles .10 / empty rest
        u = urban
        building = u & (r < 0.42)
        wall = u & (r >= 0.42) & (r < 0.52)
        pole = (u & (r >= 0.52) & (r < 0.60)) | (~u & (r >= 0.90) & (r < 0.95))
        sign_p = (u & (r >= 0.60) & (r < 0.65)) | (~u & (r >= 0.95) & (r < 0.97))
        ped = u & (r >= 0.65) & (r < 0.73)
        parked = u & (r >= 0.73) & (r < 0.83)
        fence = ~u & fence_zone & (r < 0.85)

        def put(mask, c, lat_lo, lat_hi, h_lo, h_hi, w_lo, w_hi):
            k = int(mask.sum())
            cls[mask, side] = int(c)
            lat[mask, side] = sign * (
                half_w[mask] + rng.uniform(lat_lo, lat_hi, size=k)
            )
            hgt[mask, side] = rng.uniform(h_lo, h_hi, size=k)
            hwd[mask, side] = rng.uniform(w_lo, w_hi, size=k)

        put(building, SegClass.BUILDINGS, 5.0, 11.0, 5.0, 11.0, 2.5, 4.0)
        put(wall, SegClass.WALLS, 3.0, 4.5, 1.8, 2.6, 2.0, 2.0)
        put(pole, SegClass.POLES, 0.5, 0.8, 3.5, 5.0, 0.07, 0.10)
        put(sign_p, SegClass.TRAFFICSIGNS, 0.6, 0.9, 2.0, 2.4, 0.30, 0.40)
        put(ped, SegClass.PEDESTRIANS, 0.8, 1.6, 1.6, 1.9, 0.20, 0.28)
        put(parked, SegClass.VEHICLES, 1.1, 1.4, 1.4, 1.6, 0.9, 1.1)
        put(fence, SegClass.FENCES, 2.1, 2.4, 0.9, 1.3, 2.0, 2.0)

    # Dead (padding) slots stay empty.
    cls[live:] = int(SegClass.NONE)
    return track.replace(
        prop_class=jnp.asarray(cls),
        prop_lateral=jnp.asarray(lat),
        prop_height=jnp.asarray(hgt),
        prop_halfwidth=jnp.asarray(hwd),
    )


@dataclasses.dataclass
class Straight:
    length: float


@dataclasses.dataclass
class Arc:
    angle_deg: float  # positive = left turn
    radius: float


def make_segment_track(
    segments: Sequence[Straight | Arc],
    start: Iterable[float] = (0.0, 0.0),
    start_yaw: float = 0.0,
    closed: bool = False,
    resolution: float = 1.0,
    half_width: float = DEFAULT_HALF_WIDTH,
    capacity: int | None = None,
) -> TrackData:
    """Explicit straight/arc program -> TrackData (mainly for tests)."""
    pts = [np.asarray(start, np.float64)]
    yaw = float(start_yaw)
    step = resolution / 4.0  # dense; resampled later
    for seg in segments:
        p = pts[-1]
        if isinstance(seg, Straight):
            n = max(int(np.ceil(seg.length / step)), 1)
            d = np.array([np.cos(yaw), np.sin(yaw)])
            for i in range(1, n + 1):
                pts.append(p + d * (seg.length * i / n))
        else:
            ang = np.deg2rad(seg.angle_deg)
            n = max(int(np.ceil(abs(ang) * seg.radius / step)), 1)
            sign = np.sign(ang) if ang != 0 else 1.0
            center = p + seg.radius * np.array(
                [np.cos(yaw + sign * np.pi / 2), np.sin(yaw + sign * np.pi / 2)]
            )
            a0 = np.arctan2(p[1] - center[1], p[0] - center[0])
            for i in range(1, n + 1):
                a = a0 + ang * i / n
                pts.append(center + seg.radius * np.array([np.cos(a), np.sin(a)]))
            yaw += ang
    return track_from_polyline(
        np.asarray(pts), closed=closed, resolution=resolution,
        half_width=half_width, capacity=capacity,
    )

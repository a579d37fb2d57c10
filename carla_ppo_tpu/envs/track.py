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

from carla_ppo_tpu.envs.types import RoadOption, TrackData

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
    # Pad with the last live waypoint so out-of-range gathers stay on-track.
    return TrackData(
        pos=jnp.asarray(_pad_to(pos.astype(np.float32), capacity, pos[-1])),
        fwd=jnp.asarray(_pad_to(fwd.astype(np.float32), capacity, fwd[-1])),
        maneuver=jnp.asarray(_pad_to(maneuver, capacity, maneuver[-1])),
        left_width=jnp.asarray(_pad_to(widths, capacity, half_width)),
        right_width=jnp.asarray(_pad_to(widths, capacity, half_width)),
        length=jnp.int32(n),
        is_loop=jnp.bool_(closed),
    )


def make_lap_track(
    seed: int = 0,
    mean_radius: float = 160.0,
    n_harmonics: int = 4,
    max_extra_curvature: float = 0.045,
    resolution: float = 1.0,
    half_width: float = DEFAULT_HALF_WIDTH,
    capacity: int | None = None,
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
    return track_from_polyline(
        pts, closed=True, resolution=resolution, half_width=half_width,
        capacity=capacity,
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

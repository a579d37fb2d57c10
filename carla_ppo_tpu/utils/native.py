"""ctypes bindings for the native host-side runtime (native/carla_ppo_native.cc).

Provides the C++ fast paths for track baking, A* routing, and the golden-model
CPU rasterizer. Loading is lazy; if the shared library is missing we attempt
one `make -C native` and otherwise raise - callers that want a pure-Python
fallback check `available()` first (envs/track.py and envs/route_planner.py
keep numpy implementations as references).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcarla_ppo_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None

    lib.bake_track.restype = ctypes.c_int64
    lib.bake_track.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.route_astar.restype = ctypes.c_int64
    lib.route_astar.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.render_semantic_cpu.restype = None
    lib.render_semantic_cpu.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def bake_track(
    points: np.ndarray, resolution: float, closed: bool, max_out: int = 1 << 16
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(pos [n,2] f32, fwd [n,2] f32, maneuver [n] i32) at uniform arc length."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pts = np.ascontiguousarray(points, np.float64)
    out_xy = np.empty((max_out, 2), np.float64)
    out_fwd = np.empty((max_out, 2), np.float64)
    out_man = np.empty((max_out,), np.int32)
    n = lib.bake_track(
        _ptr(pts, ctypes.c_double), len(pts), resolution, int(closed),
        _ptr(out_xy, ctypes.c_double), _ptr(out_fwd, ctypes.c_double),
        _ptr(out_man, ctypes.c_int32), max_out,
    )
    if n < 0:
        raise ValueError("bake_track: output buffer too small")
    return (
        out_xy[:n].astype(np.float32),
        out_fwd[:n].astype(np.float32),
        out_man[:n].copy(),
    )


def route_astar(
    nodes_xy: np.ndarray, edges: np.ndarray, start: int, goal: int
) -> np.ndarray:
    """Shortest node path [m] int32; raises if unreachable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    nodes = np.ascontiguousarray(nodes_xy, np.float64)
    e = np.ascontiguousarray(edges, np.int32)
    out = np.empty((len(nodes) + 1,), np.int32)
    n = lib.route_astar(
        _ptr(nodes, ctypes.c_double), len(nodes), _ptr(e, ctypes.c_int32),
        len(e), start, goal, _ptr(out, ctypes.c_int32), len(out),
    )
    if n < 0:
        raise ValueError(f"route_astar: no path {start} -> {goal}")
    return out[:n].copy()


def render_semantic_cpu(state, params, cam=None) -> np.ndarray:
    """Golden-model frame [H, W] int32 for one EnvState (float64 math)."""
    from carla_ppo_tpu.ops.rasterizer import CameraConfig, RoadStyle

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cam = cam or CameraConfig()
    style = RoadStyle()
    track = params.track
    track_pos = np.ascontiguousarray(np.asarray(track.pos), np.float32)
    track_fwd = np.ascontiguousarray(np.asarray(track.fwd), np.float32)
    left_width = np.ascontiguousarray(np.asarray(track.left_width), np.float32)
    out = np.empty((cam.height * cam.width,), np.int32)
    lib.render_semantic_cpu(
        float(state.vehicle.pos[0]), float(state.vehicle.pos[1]),
        float(state.vehicle.yaw), int(state.waypoint_idx),
        _ptr(track_pos, ctypes.c_float), _ptr(track_fwd, ctypes.c_float),
        _ptr(left_width, ctypes.c_float), int(track.length),
        int(bool(track.is_loop)),
        cam.height, cam.width, cam.fov_deg, cam.mount_forward,
        cam.mount_height, cam.pitch_deg,
        cam.window, cam.window_behind,
        style.edge_line_width, style.center_line_half_width,
        style.center_dash_period, style.center_dash_duty,
        style.shoulder_width, style.sidewalk_width,
        _ptr(out, ctypes.c_int32),
    )
    return out.reshape(cam.height, cam.width)

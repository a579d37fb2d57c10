"""Pallas TPU kernel: fused semantic-camera rasterizer (alternative backend).

Fuses the whole raycast -> nearest-centerline -> classify pipeline per
(env, pixel-tile): the K-waypoint window sits in VMEM, the [TILE, K] distance
block lives only in VMEM, and a single int32 class tile leaves the kernel.

Scope: the GROUND pass (roads/lines/shoulder/sidewalk/vegetation/sky) only —
the same work as rasterizer._ground_pass. The billboard pass (props, NPC
vehicles) is a cheap [P, N] composite that stays in XLA either way; to get a
full scene-rich frame from these kernels, run rasterizer.billboard_pass over
the kernel output exactly as render_semantic does over _ground_pass.
LIMITATION: these kernels classify with a single symmetric half_width per
track, while the XLA renderer draws asymmetric left/right widths (dual-lane
route tracks) and centers the dashed line at (lw-rw)/2 — on dual-lane roads
the two paths diverge (tests/test_rasterizer_pallas.py carries an xfail
route-track parity test documenting it). Passing per-waypoint widths through
the VMEM window table would close it; not done while the kernels are
non-production (see status below).

Mosaic-friendly layout (see pallas_guide "Tiling Constraints" and "Common
Pitfalls"): every per-pixel tensor keeps a native (SUB, LANE) = (16, 128)
vector shape end to end - no 1D reshapes (Mosaic rejects such shape casts);
argmin on 3D vectors does not legalize, so the nearest index is extracted
with a min + equality mask + int-min; the nearest waypoint's data is fetched
with a masked reduction instead of a gather.

STATUS / perf notes (round 1 measurements on v5e, B=1024, both kernels ~97%
pixel-identical to the XLA reference - remaining disagreements are
single-pixel class-band boundaries from fma association):

- XLA reference: 19.6 ms / 1024 frames.
- v1 kernel (3D broadcast, all-VPU): 148 ms - ~18 elementwise passes over
  [SUB, LANE, K].
- v2 kernel (pixels-on-sublanes column layout, MXU matmuls for the distance
  cross-term and the one-hot payload fetch): 78 ms.

Why XLA wins and the kernels cannot close the gap in current Mosaic: the
pipeline needs per-pixel scalar math (raycast, Frenet tail, classification)
in a PACKED (8, 128) pixel layout, but the K-axis matmul/reduction work in a
(P-on-sublanes, K-on-lanes) layout. XLA's layout assignment inserts cheap
relayouts between the two; Mosaic rejects those shape casts, so a kernel must
pick one layout: packed pixels => no MXU for the cross term (v1); column
pixels => every scalar op wastes 127/128 lanes (v2, where the ~30-op
raycast+classify tail costs more than the K-axis work it saves). The
production renderer therefore remains ops/rasterizer.render_batch (XLA), and
these kernels stay as validated alternative backends. If Mosaic grows a
packed<->column relayout primitive (or tpu.iota-style per-lane pixel
addressing into MXU operands), revisit with: static ray-constant inputs
(px = cam + a*cos(yaw) + b*sin(yaw) with per-pixel static a, b), kernel
emitting (lat, s, d2min) only, classification fused downstream in XLA.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from carla_ppo_tpu.envs.observations import wp_gather
from carla_ppo_tpu.envs.types import EnvParams, EnvState, SegClass
from carla_ppo_tpu.ops.rasterizer import CameraConfig, RoadStyle, _window_indices

TILE = 2048  # pixels per program = (SUB, LANE) = (16, 128)
SUB = TILE // 128
LANE = 128


def _raster_kernel(
    pose_ref,  # [1, 1, 8] f32: x, y, yaw, idx0, half_width, pad
    window_ref,  # [1, K, 4] f32: wx, wy, fx, fy
    out_ref,  # [1, 1, SUB, LANE] int32
    *,
    cam: CameraConfig,
    style: RoadStyle,
):
    H, W, f = cam.height, cam.width, cam.focal
    K = window_ref.shape[1]

    tile_idx = pl.program_id(1)

    x = pose_ref[0, 0, 0]
    y = pose_ref[0, 0, 1]
    yaw = pose_ref[0, 0, 2]
    idx0 = pose_ref[0, 0, 3]
    half_width = pose_ref[0, 0, 4]

    # Flat pixel index of each element of the (SUB, LANE) tile.
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    flat = tile_idx * TILE + r * LANE + c
    u = jnp.mod(flat, W).astype(jnp.float32) + 0.5
    v = (flat // W).astype(jnp.float32) + 0.5

    lateral = (u - W / 2.0) / f
    pitch = math.tan(math.radians(cam.pitch_deg))
    vert = (H / 2.0 - v) / f + pitch

    sky = vert >= -1e-6
    t = cam.mount_height / jnp.where(sky, 1.0, -vert)

    cos_y = jnp.cos(yaw)
    sin_y = jnp.sin(yaw)
    cam_x = x + cos_y * cam.mount_forward
    cam_y = y + sin_y * cam.mount_forward
    # Ray direction = fwd + right * lateral; right = (sin, -cos).
    dx = cos_y + sin_y * lateral
    dy = sin_y - cos_y * lateral
    px = cam_x + t * dx  # [SUB, LANE]
    py = cam_y + t * dy

    wx = window_ref[0, :, 0]  # [K]
    wy = window_ref[0, :, 1]
    fx = window_ref[0, :, 2]
    fy = window_ref[0, :, 3]

    # Squared distances [SUB, LANE, K] via 3D broadcasting (VPU), then a
    # min reduction over the window axis. Mosaic cannot legalize argmin on 3D
    # vectors, so the index is extracted with an equality mask + int min
    # (first match wins, like argmin's tie-breaking).
    ddx = px[:, :, None] - wx[None, None, :]
    ddy = py[:, :, None] - wy[None, None, :]
    d2 = ddx * ddx + ddy * ddy
    d2_min = jnp.min(d2, axis=-1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE, K), 2)
    nearest = jnp.min(
        jnp.where(d2 == d2_min[:, :, None], kk, K), axis=-1
    )  # [SUB, LANE] int32
    nearest_dist = jnp.sqrt(jnp.maximum(d2_min, 0.0))

    # Masked-reduction "gather" of the nearest waypoint's data (no gathers on
    # TPU): onehot [SUB, LANE, K] * column -> sum over K.
    onehot = (kk == nearest[:, :, None]).astype(jnp.float32)
    n_px = jnp.sum(onehot * wx[None, None, :], axis=-1)
    n_py = jnp.sum(onehot * wy[None, None, :], axis=-1)
    n_fx = jnp.sum(onehot * fx[None, None, :], axis=-1)
    n_fy = jnp.sum(onehot * fy[None, None, :], axis=-1)

    rel_x = px - n_px
    rel_y = py - n_py
    lat = n_fx * rel_y - n_fy * rel_x  # signed lateral offset
    along = rel_x * n_fx + rel_y * n_fy
    s = idx0 + nearest.astype(jnp.float32) + along

    # Classification ladder (parity with rasterizer.classify).
    alat = jnp.abs(lat)
    on_road = alat <= half_width
    edge_line = jnp.abs(alat - half_width) <= style.edge_line_width / 2.0
    dash_on = jnp.mod(s, style.center_dash_period) < (
        style.center_dash_period * style.center_dash_duty
    )
    center_line = jnp.logical_and(alat <= style.center_line_half_width, dash_on)
    shoulder = jnp.logical_and(
        alat > half_width, alat <= half_width + style.shoulder_width
    )
    side0 = half_width + style.shoulder_width
    sidewalk = jnp.logical_and(
        alat > side0, alat <= side0 + style.sidewalk_width
    )
    corridor = nearest_dist <= side0 + style.sidewalk_width + 25.0

    cls = jnp.full((SUB, LANE), int(SegClass.VEGETATION), jnp.int32)
    cls = jnp.where(sidewalk, int(SegClass.SIDEWALKS), cls)
    cls = jnp.where(shoulder, int(SegClass.OTHER), cls)
    cls = jnp.where(on_road, int(SegClass.ROADS), cls)
    cls = jnp.where(
        jnp.logical_and(on_road, center_line), int(SegClass.ROADLINES), cls
    )
    cls = jnp.where(edge_line, int(SegClass.ROADLINES), cls)
    cls = jnp.where(~corridor, int(SegClass.VEGETATION), cls)
    cls = jnp.where(sky, int(SegClass.NONE), cls)
    out_ref[0, 0, :, :] = cls


@functools.partial(jax.jit, static_argnames=("cam", "style", "interpret"))
def render_batch_pallas(
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
    interpret: bool = False,
) -> Array:
    """[B, H, W] int32 seg frames for a vmapped env batch, fused in Pallas.

    Window gathering (dynamic track indexing) stays in XLA where gathers are
    supported; the per-pixel hot loop runs in the kernel.
    """
    track = params.track

    def gather_window(state):
        idxs = _window_indices(state.waypoint_idx, cam)
        wp_pos = wp_gather(track.pos, idxs, track.length, track.is_loop)
        wp_fwd = wp_gather(track.fwd, idxs, track.length, track.is_loop)
        half_width = wp_gather(
            track.left_width, state.waypoint_idx, track.length, track.is_loop
        )
        window = jnp.concatenate([wp_pos, wp_fwd], axis=1)  # [K, 4]
        pose = jnp.stack(
            [
                state.vehicle.pos[0],
                state.vehicle.pos[1],
                state.vehicle.yaw,
                (state.waypoint_idx - cam.window_behind).astype(jnp.float32),
                half_width,
                0.0,
                0.0,
                0.0,
            ]
        )
        return pose, window

    poses, windows = jax.vmap(gather_window)(states)  # [B, 8], [B, K, 4]
    poses = poses[:, None, :]  # [B, 1, 8] (tiling-friendly trailing dims)
    B = poses.shape[0]
    H, W = cam.height, cam.width
    P = H * W
    n_tiles = -(-P // TILE)  # ceil; the last tile's overhang is sliced off
    K = windows.shape[1]

    kernel = functools.partial(_raster_kernel, cam=cam, style=style)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, SUB, LANE), jnp.int32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, K, 4), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, SUB, LANE),
            lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(poses, windows)
    return out.reshape(B, n_tiles * TILE)[:, :P].reshape(B, H, W)


# ---------------------------------------------------------------------------
# Kernel v2: column-layout pixels + MXU matmuls (the optimization-plan kernel)
# ---------------------------------------------------------------------------

TILE2 = 512  # pixels per program; pixel axis lives on SUBLANES


def _raster_kernel_v2(
    pose_ref,  # [1, 1, 8] f32: cam_x_loc, cam_y_loc, yaw, idx0, half_width
    win_rows_ref,  # [1, 8, K] f32 rows: wx, wy, fx, fy, |w|^2 (LOCAL coords)
    win_cols_ref,  # [1, K, 8] f32 cols: wx, wy, fx, fy (LOCAL coords)
    out_ref,  # [1, 1, TILE2, 1] int32
    *,
    cam: CameraConfig,
    style: RoadStyle,
):
    H, W, f = cam.height, cam.width, cam.focal
    K = win_cols_ref.shape[1]
    tile_idx = pl.program_id(1)

    cam_x = pose_ref[0, 0, 0]
    cam_y = pose_ref[0, 0, 1]
    yaw = pose_ref[0, 0, 2]
    idx0 = pose_ref[0, 0, 3]
    half_width = pose_ref[0, 0, 4]

    # Pixel coordinates in a (TILE2, 2) column layout: column 0 holds world-x,
    # column 1 world-y of each pixel's ground point (both columns compute the
    # full expression; a final select picks the component).
    col2 = jax.lax.broadcasted_iota(jnp.int32, (TILE2, 2), 1)
    pix = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE2, 2), 0)
        + tile_idx * TILE2
    )
    u = jnp.mod(pix, W).astype(jnp.float32) + 0.5
    v = (pix // W).astype(jnp.float32) + 0.5
    lateral = (u - W / 2.0) / f
    pitch = math.tan(math.radians(cam.pitch_deg))
    vert = (H / 2.0 - v) / f + pitch
    sky2 = vert >= -1e-6
    t = cam.mount_height / jnp.where(sky2, 1.0, -vert)
    cos_y = jnp.cos(yaw)
    sin_y = jnp.sin(yaw)
    dx = cos_y + sin_y * lateral
    dy = sin_y - cos_y * lateral
    px = cam_x + t * dx
    py = cam_y + t * dy
    pts = jnp.where(col2 == 0, px, py)  # [TILE2, 2] local ground points

    # d2 = |p|^2 - 2 p.w + |w|^2 with the cross term on the MXU; coordinates
    # are window-recentered so the f32 expansion is accurate.
    cross = jnp.dot(
        pts, win_rows_ref[0, 0:2, :], preferred_element_type=jnp.float32
    )  # [TILE2, K]
    p2 = jnp.sum(pts * pts, axis=1, keepdims=True)
    d2 = p2 - 2.0 * cross + win_rows_ref[0, 4:5, :]

    d2_min = jnp.min(d2, axis=1, keepdims=True)  # [TILE2, 1]
    kk = jax.lax.broadcasted_iota(jnp.int32, (TILE2, K), 1)
    nearest = jnp.min(jnp.where(d2 == d2_min, kk, K), axis=1, keepdims=True)
    onehot = (kk == nearest).astype(jnp.float32)
    # Payload fetch as a [TILE2, K] x [K, 8] MXU matmul.
    near = jnp.dot(
        onehot, win_cols_ref[0], preferred_element_type=jnp.float32
    )  # [TILE2, 8]

    rel_x = pts[:, 0:1] - near[:, 0:1]
    rel_y = pts[:, 1:2] - near[:, 1:2]
    n_fx = near[:, 2:3]
    n_fy = near[:, 3:4]
    lat = n_fx * rel_y - n_fy * rel_x
    along = rel_x * n_fx + rel_y * n_fy
    s = idx0 + nearest.astype(jnp.float32) + along
    nearest_dist = jnp.sqrt(jnp.maximum(d2_min, 0.0))
    sky = sky2[:, 0:1]

    alat = jnp.abs(lat)
    on_road = alat <= half_width
    edge_line = jnp.abs(alat - half_width) <= style.edge_line_width / 2.0
    dash_on = jnp.mod(s, style.center_dash_period) < (
        style.center_dash_period * style.center_dash_duty
    )
    center_line = jnp.logical_and(alat <= style.center_line_half_width, dash_on)
    shoulder = jnp.logical_and(
        alat > half_width, alat <= half_width + style.shoulder_width
    )
    side0 = half_width + style.shoulder_width
    sidewalk = jnp.logical_and(
        alat > side0, alat <= side0 + style.sidewalk_width
    )
    corridor = nearest_dist <= side0 + style.sidewalk_width + 25.0

    cls = jnp.full((TILE2, 1), int(SegClass.VEGETATION), jnp.int32)
    cls = jnp.where(sidewalk, int(SegClass.SIDEWALKS), cls)
    cls = jnp.where(shoulder, int(SegClass.OTHER), cls)
    cls = jnp.where(on_road, int(SegClass.ROADS), cls)
    cls = jnp.where(
        jnp.logical_and(on_road, center_line), int(SegClass.ROADLINES), cls
    )
    cls = jnp.where(edge_line, int(SegClass.ROADLINES), cls)
    cls = jnp.where(~corridor, int(SegClass.VEGETATION), cls)
    cls = jnp.where(sky, int(SegClass.NONE), cls)
    out_ref[0, 0, :, :] = cls


@functools.partial(jax.jit, static_argnames=("cam", "style", "interpret"))
def render_batch_pallas_v2(
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
    interpret: bool = False,
) -> Array:
    """[B, H, W] frames via the MXU-matmul kernel (see module docstring)."""
    track = params.track

    def gather(state):
        idxs = _window_indices(state.waypoint_idx, cam)
        wp_pos = wp_gather(track.pos, idxs, track.length, track.is_loop)
        wp_fwd = wp_gather(track.fwd, idxs, track.length, track.is_loop)
        half_width = wp_gather(
            track.left_width, state.waypoint_idx, track.length, track.is_loop
        )
        origin = wp_pos[0]
        w_loc = wp_pos - origin
        w2 = jnp.sum(w_loc * w_loc, axis=1)
        K = w_loc.shape[0]
        zeros = jnp.zeros((K,), jnp.float32)
        win_rows = jnp.stack(
            [w_loc[:, 0], w_loc[:, 1], wp_fwd[:, 0], wp_fwd[:, 1], w2,
             zeros, zeros, zeros]
        )  # [8, K]
        win_cols = win_rows.T  # [K, 8]
        fwd = jnp.stack([jnp.cos(state.vehicle.yaw), jnp.sin(state.vehicle.yaw)])
        cam_xy = state.vehicle.pos + fwd * cam.mount_forward - origin
        pose = jnp.stack(
            [
                cam_xy[0], cam_xy[1], state.vehicle.yaw,
                (state.waypoint_idx - cam.window_behind).astype(jnp.float32),
                half_width, 0.0, 0.0, 0.0,
            ]
        )
        return pose, win_rows, win_cols

    poses, win_rows, win_cols = jax.vmap(gather)(states)
    poses = poses[:, None, :]
    B = poses.shape[0]
    H, W = cam.height, cam.width
    P = H * W
    assert P % TILE2 == 0, (P, TILE2)
    n_tiles = P // TILE2
    K = win_cols.shape[1]

    kernel = functools.partial(_raster_kernel_v2, cam=cam, style=style)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, TILE2, 1), jnp.int32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 8), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE2, 1), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(poses, win_rows, win_cols)
    return out.reshape(B, H, W)

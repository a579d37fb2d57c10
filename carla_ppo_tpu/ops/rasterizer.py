"""On-device semantic-segmentation camera: the CARLA renderer, TPU-style.

Replaces the reference's `sensor.camera.semantic_segmentation` stream from the
external UE4 server (reference: CarlaEnv/collect_data.py:157-163, and the RGB
dashcam at carla_lap_env.py:175-178, dashboard transform x=1.6 z=1.7 from
wrappers.py:46-49). Emits 80x160 frames whose classes follow CARLA 0.9.x's
13-class palette (reference: vae/vae_plots.py:49-71), so the VAE pipeline
(red-channel /12 preprocessing, train_vae.py:26-29) carries over unchanged.

TPU-first formulation - no scanline loops, no branches:

1. Every pixel casts a ray through a pinhole camera (90 deg horizontal FOV)
   and intersects the ground plane -> a [P, 2] matrix of world points
   (P = H*W pixels), plus a sky mask for rays above the horizon.
2. Nearest-centerline search over a K-waypoint window around the vehicle is
   a single [P, K] squared-distance computation whose cross term -2 p.w is a
   [P, 2] x [2, K] MATMUL -> MXU work, followed by a VPU min/argmin.
3. The nearest waypoint's (pos, fwd) are fetched with a one-hot [P, K] x
   [K, 6] matmul (again MXU) instead of a gather - TPUs hate gathers.
4. Signed lateral offset = cross(fwd_i, p - pos_i) and longitudinal s =
   index + dot(fwd_i, p - pos_i) give road-local (Frenet) coordinates; the
   class image is a pile of jnp.where threshold tests on those.

Measured cost: ~12 ms for 1024 full frames on one v5e chip (~10.5 ms net of
the axon per-dispatch floor), after four layout-driven optimizations - see
the round-2 notes on _window_table, ground_points (structure-of-arrays),
frenet_coords (transposed payload fetch), and billboard_pass (packed min).
A fused Pallas variant lives in `ops/rasterizer_pallas.py`.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from carla_ppo_tpu.envs.observations import wp_gather
from carla_ppo_tpu.envs.types import (
    PROP_STRIDE,
    EnvParams,
    EnvState,
    SegClass,
    TrackData,
)

# The billboard pass packs the class id into the low 4 mantissa bits of a
# positive-f32 depth so nearest-candidate + class resolve in one int32 min
# (see billboard_pass). That trick only holds while every class id fits in
# 4 bits; fail LOUDLY at import if a 16th class is ever added rather than
# silently corrupting both the depth compare and the decoded class.
assert max(SegClass) < 16, "billboard depth/class packing assumes 4-bit class ids"


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Dashboard camera intrinsics/extrinsics (reference: wrappers.py:46-49,
    CARLA camera defaults: fov=90)."""

    height: int = 80
    width: int = 160
    fov_deg: float = 90.0
    # Mount point relative to the vehicle origin: 1.6 m ahead, 1.7 m up.
    mount_forward: float = 1.6
    mount_height: float = 1.7
    pitch_deg: float = 0.0
    # How many track waypoints the renderer considers (static window).
    window: int = 128
    # Window placement: a few waypoints behind, the rest ahead.
    window_behind: int = 16
    # Render roadside props + NPC vehicles as depth-tested billboards over
    # the ground pass (no-op when the track's prop tables are empty and
    # num_npcs is 0).
    render_props: bool = True
    # Per-row-stripe window narrowing: pixel rows near the image bottom see
    # only nearby road, so their nearest-waypoint search can use a much
    # smaller K (and sky rows skip the search entirely). Pure optimization -
    # classes only differ where a track folds back within a stripe's depth.
    row_stripes: bool = True

    @property
    def focal(self) -> float:
        import math

        return (self.width / 2.0) / math.tan(math.radians(self.fov_deg) / 2.0)


@dataclasses.dataclass(frozen=True)
class RoadStyle:
    """Widths (m) of the painted/paved bands around the centerline."""

    edge_line_width: float = 0.15
    center_line_half_width: float = 0.08
    center_dash_period: float = 4.0
    center_dash_duty: float = 0.5
    # Gravel shoulder between the road edge and the sidewalk (class OTHER).
    shoulder_width: float = 0.4
    sidewalk_width: float = 2.0
    # Beyond the sidewalk: vegetation; verticals come from the billboard pass.


def _pixel_rays(
    cam: CameraConfig, row_lo: int = 0, row_hi: int | None = None
) -> Tuple[Array, Array]:
    """Static per-pixel ray components in the camera frame for a row range.

    Returns (lateral [P], vertical [P]) such that a ray is
    fwd * 1 + right * lateral + up * vertical (unnormalized pinhole).
    """
    H, W, f = cam.height, cam.width, cam.focal
    row_hi = cam.height if row_hi is None else row_hi
    R = row_hi - row_lo
    u = jax.lax.broadcasted_iota(jnp.float32, (R, W), 1) + 0.5
    v = jax.lax.broadcasted_iota(jnp.float32, (R, W), 0) + 0.5 + row_lo
    lateral = (u - W / 2.0) / f
    pitch = jnp.deg2rad(jnp.float32(cam.pitch_deg))
    vertical = (H / 2.0 - v) / f + jnp.tan(pitch)
    return lateral.reshape(-1), vertical.reshape(-1)


def _row_geometry(cam: CameraConfig):
    """Static (numpy) per-row vertical ray component, sky flag, ground depth.

    Every pixel in a row shares its vertical component, so sky membership and
    the ground-intersection ray parameter t are row-level constants - this is
    what lets whole rows skip the nearest-waypoint search.
    """
    import math

    import numpy as np

    v = np.arange(cam.height) + 0.5
    vert = (cam.height / 2.0 - v) / cam.focal + math.tan(
        math.radians(cam.pitch_deg)
    )
    sky = vert >= -1e-6
    with np.errstate(divide="ignore"):
        t = np.where(sky, np.inf, cam.mount_height / np.maximum(-vert, 1e-12))
    return vert, sky, t


def _row_stripes(cam: CameraConfig, margin: float = 12.0):
    """Static stripe plan: (n_sky_rows, [(row_lo, row_hi, K), ...]).

    Rows are grouped by the smallest waypoint-window length K whose
    ahead-span (K - window_behind) covers the row's ground depth plus a
    margin (camera mount offset + curvature slack). Bottom rows get K=32,
    mid rows K=64, horizon rows the full window.

    Stripe breaks only land on rows divisible by 4: 4 rows x W=160 px =
    640 = 5x128 lanes, so every stripe's FLAT pixel offset (row_lo * W) is
    128-lane aligned - the property that lets the Pallas v5 kernel emit
    frames in natural [H*W] order with aligned vector stores and the XLA
    billboard composite run without a stripe->image relayout. Delaying a
    break keeps the LARGER window for the rows in between (t decreases
    monotonically with row), so those rows only gain candidates - their
    output moves toward (never away from) the unstriped full-window
    render.
    """
    _, sky, t = _row_geometry(cam)
    n_sky = int(sky.sum())  # contiguous prefix: vert decreases with row
    if not cam.row_stripes:
        return n_sky, [(n_sky, cam.height, cam.window)]
    # Multiples of 8 (the TPU sublane width: K rides the sublane dim of the
    # kernel's [K, Ppad] blocks) from 24 up to the full window. Round 4: the
    # coarse {32, 64, window} ladder left the 32-row mid band on K=64 when
    # most of its rows need < 40 waypoints - the finer ladder cuts the
    # kernel's dominant 11*K*Ppad term ~23% (4.97M -> 3.84M VPU ops/env)
    # with the SAME coverage rule (k - behind >= depth + margin), and the
    # XLA path shares the plan so pallas-vs-XLA parity is unchanged.
    choices = sorted(
        {k for k in range(24, cam.window + 1, 8)} | {cam.window}
    )
    stripes = []
    lo, cur_k = n_sky, None
    for row in range(n_sky, cam.height):
        need = t[row] + margin
        k = next(
            (k for k in choices if k - cam.window_behind >= need), cam.window
        )
        if cur_k is None:
            cur_k = k
        elif k != cur_k and row % 4 == 0:
            stripes.append((lo, row, cur_k))
            lo, cur_k = row, k
    if cur_k is not None:
        stripes.append((lo, cam.height, cur_k))
    return n_sky, stripes


def ground_points(
    pos: Array,
    yaw: Array,
    cam: CameraConfig,
    row_lo: int = 0,
    row_hi: int | None = None,
) -> Tuple[Array, Array, Array, Array]:
    """Cast pixel rays (optionally of a row range) to the ground plane.

    Returns (px [P], py [P] world coords, sky_mask [P], depth [P] meters).
    Coordinates come back as separate x/y arrays (structure-of-arrays): a
    [P, 2] layout puts 2 on the TPU lane dimension and pads 126/128 lanes;
    two [P] arrays keep every elementwise op fully vectorized.
    """
    lat, vert = _pixel_rays(cam, row_lo, row_hi)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)  # fwd = (cy, sy); right = (sy, -cy)
    cam_x = pos[0] + cy * cam.mount_forward
    cam_y = pos[1] + sy * cam.mount_forward

    sky = vert >= -1e-6
    t = cam.mount_height / jnp.where(sky, 1.0, -vert)  # ray parameter
    px = cam_x + t * (cy + sy * lat)
    py = cam_y + t * (sy - cy * lat)
    return px, py, sky, t


def frenet_coords(
    px: Array,
    py: Array,
    wp_pos: Array,
    wp_fwd: Array,
    wp_index0: Array,
    wp_extras: Array | None = None,
) -> Tuple[Array, Array, Array] | Tuple[Array, Array, Array, Array]:
    """Road-local coordinates of world points via nearest-waypoint search.

    Args:
      px / py: [P] world point coordinates (structure-of-arrays; see
        ground_points for why).
      wp_pos / wp_fwd: [K, 2] waypoint window (positions, unit forwards).
      wp_index0: [] global index of window slot 0 (for the s coordinate).
      wp_extras: optional [K, E] per-waypoint payload (e.g. road widths) to
        fetch alongside pos/fwd - rides the same one-hot matmul.

    Returns (signed_lateral [P], s [P] meters along route, nearest_dist [P])
    plus (extras [E, P] - component-major, see the transposed fetch below)
    when wp_extras is given.
    """
    # Squared distances [P, K]: recenter to the window's first waypoint, then
    # expand |p|^2 - 2 p.w + |w|^2. The recentering is what makes the
    # expansion safe in f32: at world coordinates of a few hundred meters it
    # cancels catastrophically and boundary pixels pick the wrong waypoint;
    # with local coordinates (|p| ~ 100 m within the window) the error is
    # < 1e-3 m^2. The [P, K] pipeline (cross term, d2, argmin, one-hot)
    # fuses into a single VMEM pass - nothing [P, K]-shaped reaches HBM.
    ox, oy = wp_pos[0, 0], wp_pos[0, 1]
    plx, ply = px - ox, py - oy  # [P]
    wlx, wly = wp_pos[:, 0] - ox, wp_pos[:, 1] - oy  # [K]
    cross = plx[:, None] * wlx[None, :] + ply[:, None] * wly[None, :]  # [P,K]
    d2 = (
        (plx * plx + ply * ply)[:, None]
        - 2.0 * cross
        + (wlx * wlx + wly * wly)[None, :]
    )
    nearest = jnp.argmin(d2, axis=1)  # [P]

    # One-hot matmul gather of the nearest waypoint's data, TRANSPOSED:
    # [4+E, K] x [K, P] -> [4+E, P]. The straight [P,K]x[K,4+E] form puts
    # the 4+E payload columns on the MXU lane dimension (padded to 128,
    # ~20x wasted FLOPs - measured ~3 ms of the ground pass); transposed,
    # P rides the lanes and the pad is only 4+E -> 8 sublanes.
    K = wp_pos.shape[0]
    onehot_t = (
        jax.lax.broadcasted_iota(jnp.int32, (K, nearest.shape[0]), 0)
        == nearest[None, :]
    ).astype(px.dtype)  # [K, P]
    cols = [wp_pos, wp_fwd] + ([wp_extras] if wp_extras is not None else [])
    table = jnp.concatenate(cols, axis=1)  # [K, 4 + E]
    near = table.T @ onehot_t  # [4 + E, P]
    n_px, n_py = near[0], near[1]
    n_fx, n_fy = near[2], near[3]

    rel_x, rel_y = px - n_px, py - n_py
    lateral = n_fx * rel_y - n_fy * rel_x  # cross z
    along = rel_x * n_fx + rel_y * n_fy
    s = (wp_index0 + nearest).astype(px.dtype) + along
    # |p|^2 - 2p.w + |w|^2 can dip slightly negative in f32; clamp before sqrt.
    d2_min = jnp.maximum(jnp.min(d2, axis=1), 0.0)
    nearest_dist = jnp.sqrt(d2_min)
    if wp_extras is not None:
        return lateral, s, nearest_dist, near[4:]
    return lateral, s, nearest_dist


def classify(
    lateral: Array,
    s: Array,
    nearest_dist: Array,
    left_width: Array,
    sky: Array,
    style: RoadStyle,
    right_width: Array | None = None,
) -> Array:
    """Frenet coordinates -> CARLA 13-class ids, [P] int32.

    Widths may be asymmetric (per pixel, from the nearest waypoint): a
    dual-lane carriageway extends the paved road on the side of the other
    lane, and the dashed line marks the ROAD center (= the lane boundary on
    dual-lane roads), not the driven-lane center. With `right_width` omitted
    the road is symmetric about the centerline (left_width each side)."""
    rw = left_width if right_width is None else right_width
    # Signed band tests: + lateral = left of the forward direction.
    on_road = jnp.logical_and(lateral >= -rw, lateral <= left_width)
    edge_line = jnp.logical_or(
        jnp.abs(lateral - left_width) <= style.edge_line_width / 2.0,
        jnp.abs(lateral + rw) <= style.edge_line_width / 2.0,
    )
    dash_on = jnp.mod(s, style.center_dash_period) < (
        style.center_dash_period * style.center_dash_duty
    )
    road_center = (left_width - rw) / 2.0
    center_line = jnp.logical_and(
        jnp.abs(lateral - road_center) <= style.center_line_half_width, dash_on
    )
    # Off-road distance from the nearer edge.
    off = jnp.maximum(lateral - left_width, -rw - lateral)
    shoulder = jnp.logical_and(off > 0.0, off <= style.shoulder_width)
    sidewalk = jnp.logical_and(
        off > style.shoulder_width,
        off <= style.shoulder_width + style.sidewalk_width,
    )
    # Points whose nearest waypoint is far away are off the road corridor
    # entirely (window exhausted / behind the camera): vegetation.
    widest = jnp.maximum(left_width, rw)
    corridor = (
        nearest_dist
        <= widest + style.shoulder_width + style.sidewalk_width + 25.0
    )

    cls = jnp.full(lateral.shape, int(SegClass.VEGETATION), jnp.int32)
    cls = jnp.where(sidewalk, int(SegClass.SIDEWALKS), cls)
    cls = jnp.where(shoulder, int(SegClass.OTHER), cls)
    cls = jnp.where(on_road, int(SegClass.ROADS), cls)
    cls = jnp.where(
        jnp.logical_and(on_road, center_line), int(SegClass.ROADLINES), cls
    )
    cls = jnp.where(edge_line, int(SegClass.ROADLINES), cls)
    cls = jnp.where(~corridor, int(SegClass.VEGETATION), cls)
    cls = jnp.where(sky, int(SegClass.NONE), cls)
    return cls


def _window_indices(idx0: Array, cam: CameraConfig) -> Array:
    return idx0 - cam.window_behind + jnp.arange(cam.window, dtype=jnp.int32)


def _window_table(track: TrackData) -> Array:
    """Combined per-waypoint table, [capacity, 6] f32: pos.xy, fwd.xy,
    left_width, right_width.

    The window fetch is ONE row gather from this table instead of four
    separate gathers of the individual track arrays - TPU gathers pay
    roughly per row, so fusing the payload into wider rows halves the
    window-fetch cost (measured: 4.3 -> 1.7 ms for 1024 x 128-waypoint
    windows; a vmapped dynamic_slice is even slower because batching turns
    it back into a gather). Env-independent: XLA hoists the build out of
    the env vmap for a shared track.
    """
    return jnp.concatenate(
        [
            track.pos,
            track.fwd,
            track.left_width[:, None],
            track.right_width[:, None],
        ],
        axis=1,
    )


def _ground_pass(
    state: EnvState,
    params: EnvParams,
    cam: CameraConfig,
    style: RoadStyle,
) -> Tuple[Array, Array, Array]:
    """Shared ground rasterization: (cls [H, W], depth [H, W], sky [H, W]).

    Runs the Frenet nearest-waypoint search per ROW STRIPE: sky rows are
    filled directly, bottom rows search a K=32 waypoint window, mid rows
    K=64, horizon rows the full window - ~4.5x less MXU work than running
    every pixel against the full window.
    """
    track = params.track
    idxs = _window_indices(state.waypoint_idx, cam)
    win = wp_gather(_window_table(track), idxs, track.length, track.is_loop)
    wp_pos, wp_fwd = win[:, 0:2], win[:, 2:4]
    # Per-waypoint widths ride the one-hot payload fetch so asymmetric
    # (dual-lane) roads render correctly per pixel.
    wp_widths = win[:, 4:6]  # [K, 2]
    idx0 = (state.waypoint_idx - cam.window_behind).astype(jnp.float32)

    W = cam.width
    n_sky, stripes = _row_stripes(cam)
    cls_blocks, depth_blocks, sky_blocks = [], [], []
    if n_sky:
        P_sky = n_sky * W
        cls_blocks.append(jnp.full((P_sky,), int(SegClass.NONE), jnp.int32))
        depth_blocks.append(jnp.full((P_sky,), jnp.inf, jnp.float32))
        sky_blocks.append(jnp.ones((P_sky,), bool))
    for row_lo, row_hi, K in stripes:
        px, py, sky, t = ground_points(
            state.vehicle.pos, state.vehicle.yaw, cam, row_lo, row_hi
        )
        lateral, s, nearest_dist, widths = frenet_coords(
            px, py, wp_pos[:K], wp_fwd[:K], idx0, wp_extras=wp_widths[:K]
        )
        cls_blocks.append(
            classify(
                lateral, s, nearest_dist, widths[0], sky, style,
                right_width=widths[1],
            )
        )
        depth_blocks.append(jnp.where(sky, jnp.inf, t))
        sky_blocks.append(sky)
    cls = jnp.concatenate(cls_blocks).reshape(cam.height, W)
    depth = jnp.concatenate(depth_blocks).reshape(cam.height, W)
    sky = jnp.concatenate(sky_blocks).reshape(cam.height, W)
    return cls, depth, sky


def _visible_props(
    state: EnvState, params: EnvParams, cam: CameraConfig
) -> Tuple[Array, Array, Array, Array]:
    """Collect the billboard candidates in the camera's track window.

    Returns (pos [N, 2] world xy, cls [N], height [N], halfwidth [N]) where
    N = 2 * window/PROP_STRIDE roadside props + NUM_NPC_SLOTS vehicles.
    Empty slots carry class NONE.
    """
    track = params.track
    S = cam.window // PROP_STRIDE
    n_slots_live = jnp.maximum(track.length // PROP_STRIDE, 1)
    slot0 = (state.waypoint_idx - cam.window_behind) // PROP_STRIDE

    # Combined per-slot table (anchor pos/fwd via a static-stride slice, then
    # the four prop fields): the visible slot range is ONE row gather instead
    # of six (same rows-are-the-cost reasoning as _window_table).
    n_slots = track.prop_class.shape[0]
    comb = jnp.concatenate(
        [
            track.pos[:: PROP_STRIDE][:n_slots],
            track.fwd[:: PROP_STRIDE][:n_slots],
            track.prop_class.astype(jnp.float32),
            track.prop_lateral,
            track.prop_height,
            track.prop_halfwidth,
        ],
        axis=1,
    )  # [n_slots, 12]
    slots = slot0 + jnp.arange(S, dtype=jnp.int32)
    slot_idx = jnp.where(
        track.is_loop,
        jnp.mod(slots, n_slots_live),
        jnp.clip(slots, 0, n_slots_live - 1),
    )
    win = jnp.take(comb, slot_idx, axis=0)
    wpos, wfwd = win[:, 0:2], win[:, 2:4]
    pcls = win[:, 4:6].astype(jnp.int32)  # class ids are small ints: exact
    plat, phgt, phwd = win[:, 6:8], win[:, 8:10], win[:, 10:12]
    # Left normal: cross(fwd, normal) = +1 (matches frenet lateral sign).
    normal = jnp.stack([-wfwd[:, 1], wfwd[:, 0]], axis=-1)  # [S, 2]
    ppos = wpos[:, None, :] + normal[:, None, :] * plat[..., None]  # [S, 2, 2]

    b_pos = ppos.reshape(-1, 2)
    b_cls = pcls.reshape(-1)
    b_hgt = phgt.reshape(-1)
    b_hwd = phwd.reshape(-1)

    # NPC vehicles: positions from their road coordinates (s, lateral).
    # Statically pruned when params.render_npc_billboards is False (all
    # slots would be class NONE; see EnvParams for the cost reasoning).
    if not params.render_npc_billboards:
        return b_pos, b_cls, b_hgt, b_hwd
    M = state.npc_s.shape[0]
    length_f = track.length.astype(jnp.float32)
    npc_wp = jnp.where(
        track.is_loop,
        jnp.mod(state.npc_s, length_f),
        jnp.clip(state.npc_s, 0.0, length_f - 1.0),
    ).astype(jnp.int32)
    nwpos = wp_gather(track.pos, npc_wp, track.length, track.is_loop)  # [M, 2]
    nwfwd = wp_gather(track.fwd, npc_wp, track.length, track.is_loop)
    n_normal = jnp.stack([-nwfwd[:, 1], nwfwd[:, 0]], axis=-1)
    npos = nwpos + n_normal * state.npc_lateral[:, None]
    active = jnp.arange(M) < params.num_npcs
    ncls = jnp.where(active, int(SegClass.VEHICLES), int(SegClass.NONE))

    b_pos = jnp.concatenate([b_pos, npos])
    b_cls = jnp.concatenate([b_cls, ncls.astype(jnp.int32)])
    b_hgt = jnp.concatenate([b_hgt, jnp.full((M,), 1.5, jnp.float32)])
    b_hwd = jnp.concatenate([b_hwd, jnp.full((M,), 0.95, jnp.float32)])
    return b_pos, b_cls, b_hgt, b_hwd


def _billboard_scalars(
    state: EnvState, params: EnvParams, cam: CameraConfig
) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """Per-candidate screen-space scalars: (u_c, hw_pix, v_top, v_bot,
    key, valid), each [N].

    The shared front half of the billboard test: project every candidate's
    center column, clamped pixel half-width, and row span, and pack
    depth+class into the int32 key (see _billboard_tables for the key
    encoding). Split out so the Pallas composite kernel can consume the
    scalars directly and build its U/V coverage tables in VMEM - the XLA
    path (_billboard_tables) builds them from the same values with the
    same ops, which is what keeps the two composites bit-identical."""
    import math

    b_pos, b_cls, b_hgt, b_hwd = _visible_props(state, params, cam)

    H, W, focal = cam.height, cam.width, cam.focal
    yaw = state.vehicle.yaw
    fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
    right = jnp.stack([jnp.sin(yaw), -jnp.cos(yaw)])
    cam_xy = state.vehicle.pos + fwd * cam.mount_forward
    tanp = math.tan(math.radians(cam.pitch_deg))

    rel = b_pos - cam_xy[None, :]  # [N, 2]
    f = rel @ fwd  # forward distance
    l = rel @ right  # rightward offset
    valid = jnp.logical_and(b_cls != int(SegClass.NONE), f > 0.5)
    f_safe = jnp.maximum(f, 0.5)
    u_c = W / 2.0 + focal * l / f_safe  # [N]
    # Thin verticals (poles, sign posts) must stay sampleable at distance:
    # clamp the projected half-width to half a pixel.
    hw_pix = jnp.maximum(focal * b_hwd / f_safe, 0.5)
    v_bot = H / 2.0 - focal * ((0.0 - cam.mount_height) / f_safe - tanp)
    v_top = H / 2.0 - focal * ((b_hgt - cam.mount_height) / f_safe - tanp)
    key_n = jnp.bitwise_or(
        jnp.bitwise_and(jax.lax.bitcast_convert_type(f_safe, jnp.int32), ~15),
        b_cls,
    )  # [N]
    return u_c, hw_pix, v_top, v_bot, key_n, valid


def _billboard_tables(
    state: EnvState, params: EnvParams, cam: CameraConfig
) -> Tuple[Array, Array]:
    """Packed per-candidate column/row coverage tables (U [N, W], V [N, H]).

    The billboard inside test FACTORIZES: the u-test depends only on the
    pixel column, the v-test only on the row. These two tiny packed tables
    let the composite contract them instead of evaluating the full predicate
    per candidate-pixel:
      U[n, c] = key_n  if candidate n is valid and covers column c
                INT32_MAX otherwise
      V[n, r] = INT32_MIN if candidate n covers row r, INT32_MAX otherwise
      best[r, c] = min_n max(U[n, c], V[n, r])
    max() recovers the conjunction (key_n iff both tests pass), so the
    per-candidate-pixel cost drops from the ~12 VPU ops of the flat
    [N, P] predicate (sub/abs/3 cmps/3 ands/select/pack) to max+min.
    key_n stashes the class id in the low 4 mantissa bits of the depth
    (positive-f32 bit patterns order like the floats, so an int32 min is
    a depth min; the 4-bit steal perturbs depth by < 2^-19 relative),
    giving nearest-candidate AND its class in the one reduction.
    Bit-identical to the flat form: U/V evaluate the same float
    comparisons on the same values, and a no-candidate pixel resolves to
    a key whose depth bits are >= +inf either way (visible stays False).
    """
    u_c, hw_pix, v_top, v_bot, key_n, valid = _billboard_scalars(
        state, params, cam
    )
    H, W = cam.height, cam.width
    u = jnp.arange(W, dtype=jnp.float32) + 0.5  # [W]
    v = jnp.arange(H, dtype=jnp.float32) + 0.5  # [H]
    imax = jnp.int32(2**31 - 1)
    U = jnp.where(
        valid[:, None]
        & (jnp.abs(u[None, :] - u_c[:, None]) <= hw_pix[:, None]),
        key_n[:, None],
        imax,
    )  # [N, W]
    V = jnp.where(
        (v[None, :] >= v_top[:, None]) & (v[None, :] <= v_bot[:, None]),
        jnp.int32(-(2**31)),
        imax,
    )  # [N, H]
    return U, V


def billboard_pass(
    cls: Array,
    depth: Array,
    sky: Array,
    state: EnvState,
    params: EnvParams,
    cam: CameraConfig,
) -> Tuple[Array, Array, Array]:
    """Composite prop/vehicle billboards over the ground image, depth-tested.

    Each candidate is a vertical camera-facing rectangle anchored on the
    ground: project its center column + extent to screen space, test every
    pixel against every candidate via the factorized U/V coverage tables
    (see _billboard_tables), take the nearest passing candidate per pixel,
    and overwrite ground pixels whose ground intersection lies *behind* the
    billboard (sky pixels have infinite ground depth, so buildings correctly
    rise above the horizon).
    """
    H, W = cam.height, cam.width
    U, V = _billboard_tables(state, params, cam)
    best = jnp.min(
        jnp.maximum(U[:, None, :], V[:, :, None]), axis=0
    ).reshape(-1)  # [P]
    best_cls = jnp.bitwise_and(best, 15)
    best_d = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(best, ~15), jnp.float32
    )

    depth_flat = depth.reshape(-1)
    visible = best_d < depth_flat
    new_cls = jnp.where(visible, best_cls, cls.reshape(-1)).reshape(H, W)
    new_depth = jnp.where(visible, best_d, depth_flat).reshape(H, W)
    new_sky = jnp.logical_and(sky.reshape(-1), ~visible).reshape(H, W)
    return new_cls, new_depth, new_sky


def render_semantic(
    state: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
) -> Array:
    """Render one env's seg frame, [H, W] int32 class ids. vmap over envs."""
    cls, depth, sky = _ground_pass(state, params, cam, style)
    if cam.render_props:
        cls, _, _ = billboard_pass(cls, depth, sky, state, params, cam)
    return cls


def render_semantic_with_ground(
    state: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
) -> Tuple[Array, Array]:
    """One env's (rich, ground-only) seg frames, each [H, W] int32.

    The ground-only frame is the DE-PROP target: props and NPC vehicles are
    billboards composited OVER the ground pass, so the plain-scene frame is
    an intermediate of the same render - a second scene render would cost
    the full ground pass again for pixels this already produced
    (benchmarks/train_deprop_vae.py renders its plain targets that way,
    offline; this is the free in-training equivalent)."""
    ground, depth, sky = _ground_pass(state, params, cam, style)
    cls = ground
    if cam.render_props:
        cls, _, _ = billboard_pass(ground, depth, sky, state, params, cam)
    return cls, ground


def seg_to_obs(cls: Array) -> Array:
    """Class-id image -> float [H, W, 1] in [0,1], the exact preprocessing the
    reference applies to CARLA seg frames (train_vae.py:26-29: red/12)."""
    return (cls.astype(jnp.float32) / 12.0)[..., None]


# CARLA 13-class palette, RGB in [0,1] (reference: vae/vae_plots.py:49-71).
SEG_PALETTE = jnp.asarray(
    [
        [0, 0, 0],  # None
        [70, 70, 70],  # Buildings
        [190, 153, 153],  # Fences
        [72, 0, 90],  # Other
        [220, 20, 60],  # Pedestrians
        [153, 153, 153],  # Poles
        [157, 234, 50],  # RoadLines
        [128, 64, 128],  # Roads
        [244, 35, 232],  # Sidewalks
        [107, 142, 35],  # Vegetation
        [0, 0, 255],  # Vehicles
        [102, 102, 156],  # Walls
        [220, 220, 0],  # TrafficSigns
    ],
    dtype=jnp.float32,
) / 255.0


def seg_to_rgb(cls: Array) -> Array:
    """Palette render for viewers/videos, [H, W, 3] float in [0,1].

    One-hot matmul instead of a gather, same trick as frenet_coords."""
    onehot = jax.nn.one_hot(cls, SEG_PALETTE.shape[0], dtype=jnp.float32)
    return onehot @ SEG_PALETTE


def _shade_rgb(
    cls: Array,
    depth: Array,
    sky: Array,
    cam: CameraConfig,
    key: Array | None = None,
) -> Array:
    """Palette + depth-fog + sky-gradient shading, [..., H, W] -> [..., H, W, 3].

    Batch-dimension agnostic: the per-pixel constants ([P]-shaped ray
    verticals) broadcast over any leading env dims."""
    lead = cls.shape[:-2]
    cls = cls.reshape(*lead, -1)
    depth = depth.reshape(*lead, -1)
    sky = sky.reshape(*lead, -1)
    base = jax.nn.one_hot(cls, SEG_PALETTE.shape[0], dtype=jnp.float32) @ SEG_PALETTE

    # Depth fog: fade ground toward a horizon haze color.
    haze = jnp.asarray([0.74, 0.78, 0.82])
    fog = jnp.clip(jnp.where(sky, 0.0, depth) / 250.0, 0.0, 1.0)[..., None]
    ground_rgb = base * (1.0 - fog) + haze * fog

    # Sky: vertical gradient from zenith blue to horizon haze.
    _, vert = _pixel_rays(cam)
    sky_t = jnp.clip(vert / 0.5, 0.0, 1.0)[:, None]
    zenith = jnp.asarray([0.35, 0.52, 0.78])
    sky_rgb = haze * (1.0 - sky_t) + zenith * sky_t

    rgb = jnp.where(sky[..., None], sky_rgb, ground_rgb)

    if key is not None:
        rgb = jnp.clip(
            rgb + 0.02 * jax.random.normal(key, rgb.shape), 0.0, 1.0
        )
    return rgb.reshape(*lead, cam.height, cam.width, 3)


def render_rgb(
    state: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
    key: Array | None = None,
) -> Array:
    """Shaded pseudo-RGB dashboard frame, [H, W, 3] float in [0,1].

    Stands in for the reference's `sensor.camera.rgb` stream (the VAE's
    *source* images; reference: collect_data.py:157-158): palette colors with
    depth fog toward the horizon, a vertical sky gradient, and optional
    per-pixel texture noise (domain randomization) so an RGB->seg VAE has a
    non-trivial mapping to learn.
    """
    cls, depth, sky = _ground_pass(state, params, cam, style)
    if cam.render_props:
        cls, depth, sky = billboard_pass(cls, depth, sky, state, params, cam)
    return _shade_rgb(cls, depth, sky, cam, key)


@partial(jax.jit, static_argnames=("cam", "style"))
def render_rgb_batch(
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
    key: Array | None = None,
) -> Array:
    """[B, H, W, 3] shaded pseudo-RGB frames for a vmapped env batch.

    The batch analog of render_rgb: on TPU, shared-track batches divisible by
    the kernel group run the fused Pallas ground pass (the same dispatch rule
    as render_batch), then the billboard composite and shading run batched in
    XLA. This is what makes `--vae_source rgb` rollouts (the reference's
    deployed observation path, vae_common.py:33-62) render at the same
    per-frame cost as the seg pipeline.

    `key`: optional texture-noise key (one key for the whole batch; the
    vmapped fallback splits it per env, so noise - and only noise - differs
    between the two paths)."""
    if _pallas_ground_eligible(states, params):
        from carla_ppo_tpu.ops.rasterizer_pallas import (
            _stripe_layout_v5,
            render_batch_pallas_v4,
            render_batch_pallas_v5,
        )

        B = states.waypoint_idx.shape[0]
        H, W = cam.height, cam.width
        if _stripe_layout_v5(cam) is not None:
            flat_ground = render_batch_pallas_v5(states, params, cam, style)
            if cam.render_props:
                cls, depth, sky = _composite_billboards_flat(
                    flat_ground, states, params, cam, return_depth_sky=True
                )
            else:
                depth0, sky0 = _static_depth_sky(cam)
                cls = flat_ground
                depth = jnp.broadcast_to(depth0.reshape(-1), (B, H * W))
                sky = jnp.broadcast_to(sky0.reshape(-1), (B, H * W))
            return _shade_rgb(
                cls.reshape(B, H, W),
                depth.reshape(B, H, W),
                sky.reshape(B, H, W),
                cam,
                key,
            )

        ground = render_batch_pallas_v4(states, params, cam, style)
        depth0, sky0 = _static_depth_sky(cam)
        if cam.render_props:
            cls, depth, sky = jax.vmap(
                lambda c, s: billboard_pass(c, depth0, sky0, s, params, cam)
            )(ground, states)
        else:
            cls = ground
            depth = jnp.broadcast_to(depth0, ground.shape)
            sky = jnp.broadcast_to(sky0, ground.shape)
        return _shade_rgb(cls, depth, sky, cam, key)
    if key is None:
        return jax.vmap(lambda s: render_rgb(s, params, cam, style))(states)
    keys = jax.random.split(key, states.waypoint_idx.shape[0])
    return jax.vmap(
        lambda s, k: render_rgb(s, params, cam, style, key=k)
    )(states, keys)


def _composite_billboards_flat(
    flat_cls: Array,
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig,
    tracks=None,
    return_depth_sky: bool = False,
):
    """Billboard composite over FLAT [B, H*W] ground frames (natural pixel
    order, the Pallas v5 kernel's output layout). With return_depth_sky,
    returns (cls, depth, sky) flat triples for RGB shading.

    Lane-perfect analog of vmap(billboard_pass): H*W = 12800 = 100 x 128
    lanes, so the U/V min-max contraction (inputs realized as reshapes of
    broadcasts - index math inside the reduce fusion, nothing [B, N, H*W]-
    shaped is materialized) and the depth/where composite run at full lane
    utilization instead of the [H, W=160] layout's 62.5%. Bit-identical to
    billboard_pass: same packed tables, same max/min/compare arithmetic,
    only the iteration space is reshaped. Ground depth is static per row
    (rigid camera), so the depth test needs nothing from the ground pass.
    """
    H, W = cam.height, cam.width
    B = flat_cls.shape[0]
    if tracks is None:
        U, V = jax.vmap(lambda s: _billboard_tables(s, params, cam))(states)
    else:
        U, V = jax.vmap(
            lambda s, t: _billboard_tables(s, params.replace(track=t), cam)
        )(states, tracks)
    N = U.shape[1]
    u_flat = jnp.broadcast_to(U[:, :, None, :], (B, N, H, W)).reshape(B, N, H * W)
    v_flat = jnp.broadcast_to(V[:, :, :, None], (B, N, H, W)).reshape(B, N, H * W)
    best = jnp.min(jnp.maximum(u_flat, v_flat), axis=1)  # [B, H*W]
    vert, sky_rows, t_rows = _row_geometry(cam)
    depth_row = jnp.asarray(t_rows, jnp.float32)  # [H], inf on sky rows
    depth_flat = jnp.broadcast_to(depth_row[:, None], (H, W)).reshape(H * W)
    best_d = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(best, ~15), jnp.float32
    )
    visible = best_d < depth_flat[None, :]
    cls = jnp.where(visible, jnp.bitwise_and(best, 15), flat_cls)
    if not return_depth_sky:
        return cls
    sky_flat = jnp.broadcast_to(
        jnp.asarray(sky_rows)[:, None], (H, W)
    ).reshape(H * W)
    depth = jnp.where(visible, best_d, depth_flat[None, :])
    sky = jnp.logical_and(sky_flat[None, :], ~visible)
    return cls, depth, sky


def _static_depth_sky(cam: CameraConfig):
    """Static per-pixel (depth [H, W], sky [H, W]) maps.

    Ground depth is a pure function of the pixel row (the camera is rigid),
    so the billboard depth test needs nothing from the ground pass - this is
    what lets the Pallas ground kernel emit class ids only."""
    import numpy as np

    _, sky, t = _row_geometry(cam)
    depth = np.where(sky, np.inf, t)[:, None].repeat(cam.width, axis=1)
    sky2 = sky[:, None].repeat(cam.width, axis=1)
    return jnp.asarray(depth, jnp.float32), jnp.asarray(sky2)


def _pallas_ground_eligible(states: EnvState, params: EnvParams) -> bool:
    """Trace-time check: can the batch use the fused Pallas ground kernel?

    Needs a real TPU backend (Mosaic does not target CPU), a shared
    (non-banked) track, and an env batch divisible by the kernel's
    envs-per-program group."""
    from carla_ppo_tpu.ops import rasterizer_pallas as rp

    B = states.waypoint_idx.shape[0] if states.waypoint_idx.ndim else 0
    return (
        jax.default_backend() not in ("cpu",)
        and params.track.pos.ndim == 2
        and B % rp.GROUP == 0
    )


def _render_batch_pallas_composed(
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig,
    style: RoadStyle,
    interpret: bool = False,
    tracks=None,
) -> Tuple[Array, Array]:
    """Pallas ground pass + (optional) XLA billboard composite.

    Returns (rich, ground): the pre-composite ground pass is the de-prop
    target, so both batch entry points share this one dispatch site.

    Aligned camera geometries take the v5 flat path (natural-order kernel
    output + lane-perfect flat composite, zero relayouts); others fall back
    to v4's stripe packing + per-env billboard_pass. Both are bit-identical
    in class values."""
    from carla_ppo_tpu.ops.rasterizer_pallas import (
        _stripe_layout_v5,
        render_batch_pallas_v4,
        render_batch_pallas_v5,
    )

    B = states.waypoint_idx.shape[0]
    H, W = cam.height, cam.width
    if _stripe_layout_v5(cam) is not None:
        flat_ground = render_batch_pallas_v5(
            states, params, cam, style, interpret, tracks=tracks
        )
        flat = flat_ground
        if cam.render_props:
            flat = _composite_billboards_flat(
                flat_ground, states, params, cam, tracks=tracks
            )
        return flat.reshape(B, H, W), flat_ground.reshape(B, H, W)

    ground = render_batch_pallas_v4(
        states, params, cam, style, interpret, tracks=tracks
    )
    cls = ground
    if cam.render_props:
        depth, sky = _static_depth_sky(cam)
        if tracks is None:
            cls = jax.vmap(
                lambda c, s: billboard_pass(c, depth, sky, s, params, cam)[0]
            )(ground, states)
        else:
            cls = jax.vmap(
                lambda c, s, t: billboard_pass(
                    c, depth, sky, s, params.replace(track=t), cam
                )[0]
            )(ground, states, tracks)
    return cls, ground


@partial(jax.jit, static_argnames=("cam", "style"))
def render_batch(
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
) -> Array:
    """[B, H, W] int32 frames for a vmapped env batch.

    On TPU, shared-track batches divisible by the kernel group run the fused
    Pallas ground pass (ops/rasterizer_pallas.render_batch_pallas_v3d -
    measured 4.85 ms vs 7.34 ms XLA for 1024 ground passes, bit-identical
    output); everything else takes the XLA path."""
    if _pallas_ground_eligible(states, params):
        return _render_batch_pallas_composed(states, params, cam, style)[0]
    return jax.vmap(lambda s: render_semantic(s, params, cam, style))(states)


@partial(jax.jit, static_argnames=("cam", "style"))
def render_batch_with_ground(
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
) -> Tuple[Array, Array]:
    """[B, H, W] (rich, ground-only) frames for a shared-track batch.

    Same dispatch as render_batch; the Pallas path's ground output IS the
    de-prop target, so the extra return costs only the billboard composite
    it already pays (see render_semantic_with_ground)."""
    if _pallas_ground_eligible(states, params):
        return _render_batch_pallas_composed(states, params, cam, style)
    return jax.vmap(
        lambda s: render_semantic_with_ground(s, params, cam, style)
    )(states)


@partial(jax.jit, static_argnames=("cam", "style"))
def render_batch_banked(
    states: EnvState,
    params: EnvParams,
    cam: CameraConfig = CameraConfig(),
    style: RoadStyle = RoadStyle(),
) -> Array:
    """[B, H, W] frames for a batch over BANKED tracks (route/lap_bank):
    `params.track` leaves carry a leading route axis and each env's
    `states.route_id` picks its track.

    The fused Pallas ground kernel is track-agnostic (only its XLA window
    prep reads track data), so banked batches take the same single-dispatch
    path as shared-track ones - the prep just vmaps over per-env track
    slices. CPU/odd batches fall back to the per-env XLA renderer."""
    from carla_ppo_tpu.ops import rasterizer_pallas as rp

    tracks = jax.tree.map(lambda x: x[states.route_id], params.track)
    B = states.waypoint_idx.shape[0]
    if jax.default_backend() not in ("cpu",) and B % rp.GROUP == 0:
        return _render_batch_pallas_composed(
            states, params, cam, style, tracks=tracks
        )[0]
    return jax.vmap(
        lambda s, t: render_semantic(s, params.replace(track=t), cam, style)
    )(states, tracks)

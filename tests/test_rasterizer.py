"""Rasterizer tests: geometry of the pinhole ground projection and class
structure of rendered frames (the on-device CARLA seg camera)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import lap_env, track as track_mod
from carla_ppo_tpu.envs.types import EnvParams, SegClass
from carla_ppo_tpu.ops import rasterizer as R


@pytest.fixture(scope="module")
def straight_params():
    # Long straight road along +x starting at the origin.
    t = track_mod.make_segment_track([track_mod.Straight(400.0)])
    return EnvParams(track=t)


@pytest.fixture(scope="module")
def straight_frame(straight_params):
    s = lap_env.reset(straight_params, jax.random.PRNGKey(0))
    return np.asarray(R.render_semantic(s, straight_params))


def test_frame_shape_and_dtype(straight_frame):
    assert straight_frame.shape == (80, 160)
    assert straight_frame.dtype == np.int32


def test_sky_above_horizon(straight_frame):
    # Pitch 0 -> horizon at the vertical center; everything above is NONE.
    assert (straight_frame[:39] == int(SegClass.NONE)).all()
    assert not (straight_frame[45:] == int(SegClass.NONE)).any()


def test_road_ahead_center(straight_frame):
    # The camera sits on the lane center looking down a straight road:
    # bottom-center pixels must be road or the dashed center line.
    bottom_center = straight_frame[60:, 70:90]
    ok = np.isin(
        bottom_center, [int(SegClass.ROADS), int(SegClass.ROADLINES)]
    )
    assert ok.mean() > 0.95


def test_left_right_symmetry(straight_frame):
    """On a straight road the frame must be (nearly) mirror-symmetric."""
    left = straight_frame[40:, :80]
    right = straight_frame[40:, 80:][:, ::-1]
    assert (left == right).mean() > 0.9


def test_class_bands_in_order(straight_frame):
    """Scanning outward from center on a low row: road -> line -> sidewalk ->
    vegetation (the road corridor structure)."""
    row = straight_frame[70]
    # Distances from image center to first occurrence of each class.
    def first_from_center(cls):
        hits = np.where(row[80:] == cls)[0]
        return hits[0] if len(hits) else 10_000

    d_road = 0  # center is road
    d_line = first_from_center(int(SegClass.ROADLINES))
    d_side = first_from_center(int(SegClass.SIDEWALKS))
    d_veg = first_from_center(int(SegClass.VEGETATION))
    assert row[80] in (int(SegClass.ROADS), int(SegClass.ROADLINES))
    assert d_line < d_side < d_veg


def test_turn_breaks_symmetry(straight_params):
    """Looking into a turn, the road mass shifts toward the turn side."""
    t = track_mod.make_segment_track(
        [track_mod.Straight(10.0), track_mod.Arc(90.0, 25.0)]
    )
    params = EnvParams(track=t)
    s = lap_env.reset(params, jax.random.PRNGKey(0))
    img = np.asarray(R.render_semantic(s, params))
    road = img == int(SegClass.ROADS)
    upper_rows = road[40:60]  # distant rows see the curve
    left_mass = upper_rows[:, :80].sum()
    right_mass = upper_rows[:, 80:].sum()
    assert left_mass > right_mass  # left turn -> more road on the left


def test_ground_points_geometry():
    cam = R.CameraConfig()
    pos = jnp.array([0.0, 0.0])
    px, py, sky, t = R.ground_points(pos, jnp.float32(0.0), cam)
    pts = np.stack([np.asarray(px), np.asarray(py)], axis=-1).reshape(
        80, 160, 2
    )
    sky = np.asarray(sky).reshape(80, 160)
    # Bottom-center pixel: directly ahead, ~camera_fwd + h*f/(v-cy) meters.
    v = 79.5
    depth = cam.mount_height * cam.focal / (v - 40.0)
    np.testing.assert_allclose(
        pts[79, 80][0], cam.mount_forward + depth, rtol=0.05
    )
    assert abs(pts[79, 80][1]) < 0.1
    # Rays above the horizon are sky.
    assert sky[:40].all() and not sky[41:].any()


def test_seg_to_obs_range(straight_frame):
    obs = np.asarray(R.seg_to_obs(jnp.asarray(straight_frame)))
    assert obs.shape == (80, 160, 1)
    assert obs.min() >= 0.0 and obs.max() <= 1.0


def test_seg_to_rgb_palette():
    cls = jnp.asarray([[7, 0], [9, 6]], jnp.int32)
    rgb = np.asarray(R.seg_to_rgb(cls))
    np.testing.assert_allclose(rgb[0, 0], [128 / 255, 64 / 255, 128 / 255], atol=1e-6)
    np.testing.assert_allclose(rgb[0, 1], [0, 0, 0], atol=1e-6)


def test_row_stripes_match_full_window(lap_params):
    """Stripe narrowing is an optimization, not a semantic change: frames
    must (near-)exactly match the single full-window pass."""
    striped_cam = R.CameraConfig(row_stripes=True)
    full_cam = R.CameraConfig(row_stripes=False)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    # Advance along the track so the window isn't at the spawn.
    for _ in range(20):
        states, _ = jax.vmap(
            lambda s, a: lap_env.step(s, a, lap_params)
        )(states, jnp.tile(jnp.array([0.1, 1.0]), (4, 1)))
    a = np.asarray(R.render_batch(states, lap_params, striped_cam))
    b = np.asarray(R.render_batch(states, lap_params, full_cam))
    assert (a == b).mean() > 0.999


def test_row_stripes_match_at_sharpest_curvature(lap_params):
    """Round-4 advisor item 1: the finer per-stripe K ladder removes slack,
    and a single-pose statistical bound could hide boundary misses at high
    curvature. Park the camera exactly AT the track's sharpest bends (where
    a row's nearest waypoint is most likely to fall outside a narrowed
    stripe window) plus a dense pose sweep, and require per-frame striped ==
    full-window agreement at >= 99.9% with a tight global bound."""
    import dataclasses

    trk = lap_params.track
    fwd = np.asarray(trk.fwd)
    N = int(trk.length)
    yaw = np.arctan2(fwd[:N, 1], fwd[:N, 0])
    dyaw = np.abs((np.diff(yaw) + np.pi) % (2 * np.pi) - np.pi)
    sharp = np.argsort(dyaw)[-8:]  # 8 highest-curvature waypoints
    sweep = (np.arange(8) * (N // 8)) % N  # plus an even track sweep
    wps = np.concatenate([sharp, sweep]).astype(np.int32)

    keys = jax.random.split(jax.random.PRNGKey(4), len(wps))
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    pos = jnp.asarray(np.asarray(trk.pos)[wps], jnp.float32)
    yaws = jnp.asarray(yaw[wps], jnp.float32)
    states = dataclasses.replace(
        states,
        waypoint_idx=jnp.asarray(wps),
        vehicle=states.vehicle.replace(pos=pos, yaw=yaws),
    )
    striped = np.asarray(
        R.render_batch(states, lap_params, R.CameraConfig(row_stripes=True))
    )
    full = np.asarray(
        R.render_batch(states, lap_params, R.CameraConfig(row_stripes=False))
    )
    per_frame = (striped == full).reshape(len(wps), -1).mean(axis=1)
    assert per_frame.min() >= 0.999, (
        f"stripe boundary miss at wp={wps[int(per_frame.argmin())]}: "
        f"{per_frame.min():.6f}"
    )
    assert (striped == full).mean() >= 0.9999


def test_render_batch(lap_params):
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    frames = R.render_batch(states, lap_params)
    assert frames.shape == (B, 80, 160)
    frames = np.asarray(frames)
    # Every frame sees road somewhere below the horizon.
    assert all((f == int(SegClass.ROADS)).sum() > 100 for f in frames)


def test_render_with_ground_parity():
    """(rich, ground) from the shared render: rich == render_semantic on the
    same camera; ground == render_semantic with billboards disabled (the
    de-prop target is a true plain-scene frame)."""
    import dataclasses

    import jax

    from carla_ppo_tpu.envs import lap_env, track as track_mod
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.ops import rasterizer

    params = EnvParams(track=track_mod.make_lap_track(seed=0, props=True))
    cam = rasterizer.CameraConfig()
    cam_plain = dataclasses.replace(cam, render_props=False)
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    states = jax.vmap(lambda k: lap_env.reset(params, k))(keys)

    rich, ground = rasterizer.render_batch_with_ground(states, params, cam)
    want_rich = rasterizer.render_batch(states, params, cam)
    want_plain = rasterizer.render_batch(states, params, cam_plain)
    np.testing.assert_array_equal(np.asarray(rich), np.asarray(want_rich))
    np.testing.assert_array_equal(np.asarray(ground), np.asarray(want_plain))
    # Props are actually on screen: the rich frame differs from the target.
    assert (np.asarray(rich) != np.asarray(ground)).any()

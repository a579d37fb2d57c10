"""Track pipeline tests: 1 m resolution, closure, maneuver tags."""

import numpy as np

from carla_ppo_tpu.envs import track as track_mod
from carla_ppo_tpu.envs.types import RoadOption


def test_lap_track_resolution(lap_track):
    n = int(lap_track.length)
    pos = np.asarray(lap_track.pos)[:n]
    seg = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    # Waypoints 1 m apart (reference: carla_lap_env.py:188, resolution=1.0).
    np.testing.assert_allclose(seg, 1.0, atol=0.05)
    # Closure: last waypoint within ~1 m of the first.
    assert np.linalg.norm(pos[-1] - pos[0]) < 2.0
    # Roughly 1 km lap like the reference's Town07 loop.
    assert 600 < n < 2000


def test_lap_track_forward_vectors(lap_track):
    n = int(lap_track.length)
    fwd = np.asarray(lap_track.fwd)[:n]
    np.testing.assert_allclose(np.linalg.norm(fwd, axis=1), 1.0, atol=1e-5)
    # Forward vectors roughly align with the actual direction of travel.
    pos = np.asarray(lap_track.pos)[:n]
    d = np.diff(pos, axis=0)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cos = np.sum(fwd[:-1] * d, axis=1)
    assert cos.min() > 0.95


def test_lap_track_has_turns_and_straights(lap_track):
    n = int(lap_track.length)
    m = np.asarray(lap_track.maneuver)[:n]
    assert (m == int(RoadOption.LANEFOLLOW)).any()
    assert ((m == int(RoadOption.LEFT)) | (m == int(RoadOption.RIGHT))).any()


def test_lap_track_randomization_differs():
    t0 = track_mod.make_lap_track(seed=0)
    t1 = track_mod.make_lap_track(seed=1)
    n = min(int(t0.length), int(t1.length))
    assert not np.allclose(np.asarray(t0.pos)[:n], np.asarray(t1.pos)[:n])


def test_segment_track_straight():
    t = track_mod.make_segment_track([track_mod.Straight(100.0)])
    n = int(t.length)
    pos = np.asarray(t.pos)[:n]
    np.testing.assert_allclose(pos[:, 1], 0.0, atol=1e-6)
    assert 98 <= n <= 101
    m = np.asarray(t.maneuver)[:n]
    assert (m[:-2] == int(RoadOption.LANEFOLLOW)).all()


def test_segment_track_arc_maneuver():
    t = track_mod.make_segment_track(
        [track_mod.Straight(50.0), track_mod.Arc(90.0, 20.0), track_mod.Straight(50.0)]
    )
    n = int(t.length)
    m = np.asarray(t.maneuver)[:n]
    assert (m == int(RoadOption.LEFT)).any()
    assert not (m == int(RoadOption.RIGHT)).any()
    # End heading is +90 degrees.
    fwd_end = np.asarray(t.fwd)[n - 2]
    assert abs(np.arctan2(fwd_end[1], fwd_end[0]) - np.pi / 2) < 0.05


def test_padding_capacity():
    t = track_mod.make_segment_track([track_mod.Straight(50.0)], capacity=256)
    assert t.pos.shape == (256, 2)
    n = int(t.length)
    pos = np.asarray(t.pos)
    # Padding repeats the last live waypoint.
    np.testing.assert_allclose(pos[n:], np.broadcast_to(pos[n - 1], pos[n:].shape))

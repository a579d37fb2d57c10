"""Gym-style parity-class tests (headless pygame)."""

import os

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

import numpy as np
import pytest

from carla_ppo_tpu.envs.gym_api import CarlaLapEnv, CarlaRouteEnv


@pytest.fixture(scope="module")
def env():
    e = CarlaLapEnv(obs_res=(160, 80), encode_state_fn="vector")
    yield e
    e.close()


def test_reset_returns_obs(env):
    obs = env.reset()
    assert obs.shape == (18,)


def test_step_api(env):
    env.reset()
    obs, reward, done, info = env.step(np.array([0.1, 0.8]))
    assert obs.shape == (18,)
    assert isinstance(reward, float)
    assert isinstance(done, bool)
    assert info == {"closed": False}


def test_step_none_ticks_without_acting(env):
    env.reset()
    env.step(np.array([0.5, 0.5]))
    control = np.asarray(env.state.control)
    env.step(None)
    np.testing.assert_allclose(np.asarray(env.state.control), control)


def test_action_smoothing_default(env):
    # Default ctor smoothing is 0.9 like the reference (carla_lap_env.py:51).
    env.reset()
    env.step(np.array([1.0, 1.0]))
    assert abs(float(env.state.control[0]) - 0.1) < 1e-5


def test_raw_pixel_obs_mode():
    e = CarlaLapEnv(obs_res=(160, 80), encode_state_fn=None)
    try:
        obs = e.reset()
        # Raw camera frame, (H, W, 1) in [0,1] - the fixed obs shape.
        assert obs.shape == (80, 160, 1)
        assert 0.0 <= obs.min() and obs.max() <= 1.0
    finally:
        e.close()


def test_render_modes(env):
    env.reset()
    env.step(np.array([0.0, 0.5]))
    arr = env.render("rgb_array")
    assert arr.shape == (720, 1280, 3)
    no_hud = env.render("rgb_array_no_hud")
    assert no_hud.shape[2] == 3
    px = env.render("state_pixels")
    assert px.shape == (80, 160, 1)


def test_custom_encoder(env):
    e = CarlaLapEnv(
        obs_res=(160, 80),
        encode_state_fn=lambda env: np.array([float(env.state.vehicle.speed)]),
    )
    try:
        obs = e.reset()
        assert obs.shape == (1,)
    finally:
        e.close()


@pytest.fixture(scope="module")
def route_env_obj():
    e = CarlaRouteEnv(
        obs_res=(160, 80), encode_state_fn="vector", num_routes=4
    )
    yield e
    e.close()


def test_route_env_api(route_env_obj):
    obs = route_env_obj.reset()
    assert obs.shape == (18,)
    for _ in range(5):
        obs, reward, done, info = route_env_obj.step(np.array([0.0, 1.0]))
    assert np.isfinite(obs).all()
    arr = route_env_obj.render("rgb_array")
    assert arr.shape == (720, 1280, 3)


def test_gymnasium_lap_env_api():
    from carla_ppo_tpu.envs.gymnasium_api import LapEnvGymnasium

    env = LapEnvGymnasium(render_mode="rgb_array")
    obs, info = env.reset(seed=0)
    assert obs.shape == (18,)
    assert "laps_completed" in info
    obs, reward, terminated, truncated, info = env.step(np.array([0.0, 1.0]))
    assert isinstance(reward, float)
    assert not terminated and not truncated
    frame = env.render()
    assert frame.shape == (80, 160, 3) and frame.dtype == np.uint8
    # Gymnasium env checker-ish basics.
    assert env.action_space.contains(np.array([0.5, 0.5], np.float32))
    assert env.observation_space.contains(obs)


def test_gymnasium_route_env_api():
    from carla_ppo_tpu.envs.gymnasium_api import RouteEnvGymnasium

    env = RouteEnvGymnasium(num_routes=4)
    obs, info = env.reset(seed=1)
    assert obs.shape == (18,)
    for _ in range(3):
        obs, reward, terminated, truncated, info = env.step(np.array([0.0, 1.0]))
    assert np.isfinite(obs).all()


def test_gymnasium_env_checker():
    """Gymnasium's official env checker passes on the lap adapter."""
    from gymnasium.utils.env_checker import check_env

    from carla_ppo_tpu.envs.gymnasium_api import LapEnvGymnasium

    env = LapEnvGymnasium(render_mode="rgb_array")
    check_env(env, skip_render_check=False)

"""Gymnasium VectorEnv adapter over the vmapped core."""

import numpy as np
import pytest

import gymnasium

from carla_ppo_tpu.envs.vector_env import LapVectorEnv


@pytest.fixture(scope="module")
def venv():
    return LapVectorEnv(num_envs=8, is_training=False)


def test_spaces_and_reset(venv):
    assert isinstance(venv, gymnasium.vector.VectorEnv)
    assert (
        venv.metadata["autoreset_mode"]
        is gymnasium.vector.AutoresetMode.SAME_STEP
    )
    obs, infos = venv.reset(seed=0)
    assert obs.shape == (8, venv.single_observation_space.shape[0])
    assert venv.observation_space.contains(obs)
    assert infos == {}


def test_step_batch(venv):
    venv.reset(seed=0)
    actions = np.tile(np.array([0.0, 1.0], np.float32), (8, 1))
    obs, rew, term, trunc, infos = venv.step(actions)
    assert obs.shape == (8, venv.single_observation_space.shape[0])
    assert rew.shape == term.shape == trunc.shape == (8,)
    assert not term.any() and not trunc.any()
    assert infos["distance_traveled"].shape == (8,)


def test_same_step_autoreset_final_obs(venv):
    """Zero throttle -> VEHICLE_STOPPED at step 151; the returned obs row is
    the respawned episode's first obs while final_obs carries the terminal."""
    venv.reset(seed=0)
    actions = np.zeros((8, 2), np.float32)
    for t in range(151):
        obs, rew, term, trunc, infos = venv.step(actions)
    assert term.all()
    assert "final_obs" in infos and infos["_final_obs"].all()
    assert infos["final_obs"].shape == obs.shape
    # Respawned: the next step is step 1 of a fresh episode, no termination.
    obs2, _, term2, trunc2, infos2 = venv.step(actions)
    assert not term2.any() and not trunc2.any()
    assert (infos2["step_count"] == 1).all()


def test_reward_sign_matches_single_env(venv):
    """Full-throttle driving earns positive reward in every env."""
    venv.reset(seed=1)
    actions = np.tile(np.array([0.0, 1.0], np.float32), (8, 1))
    total = np.zeros(8)
    for _ in range(30):
        _, rew, _, _, _ = venv.step(actions)
        total += rew
    assert (total > 0).all()


def test_route_vector_env():
    """RouteVectorEnv: same VectorEnv surface over the route family - fresh
    random routes per reset, route chaining/3000 m budget inside step."""
    from carla_ppo_tpu.envs.vector_env import RouteVectorEnv

    venv = RouteVectorEnv(num_envs=4, num_routes=8, is_training=False)
    assert isinstance(venv, gymnasium.vector.VectorEnv)
    obs, _ = venv.reset(seed=3)
    assert obs.shape == (4, venv.single_observation_space.shape[0])
    # Random route draw: not every env starts on the same route.
    rids = np.asarray(venv._states.route_id)
    assert len(set(rids.tolist())) > 1
    actions = np.tile(np.array([0.0, 1.0], np.float32), (4, 1))
    for _ in range(30):
        obs, rew, term, trunc, infos = venv.step(actions)
    assert venv.observation_space.contains(obs)
    assert (infos["distance_traveled"] > 0).all()
    # routes_completed rides the laps_completed info slot (fractional).
    assert (infos["laps_completed"] > 0).all()
    frame = venv.render()
    assert frame.shape[2] == 3

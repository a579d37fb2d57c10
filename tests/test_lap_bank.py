"""Domain-randomized multi-track lap env tests (config 5 machinery)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import lap_bank_env
from carla_ppo_tpu.models.policy import ActorCritic
from carla_ppo_tpu.training import ppo


@pytest.fixture(scope="module")
def bank():
    return lap_bank_env.make_lap_bank(n_tracks=4, base_seed=0, capacity=2048)


@pytest.fixture(scope="module")
def bparams(bank):
    return lap_bank_env.lap_bank_params(
        bank,
        spawn_pos_noise=jnp.float32(0.5),
        spawn_yaw_noise=jnp.float32(0.1),
    )


def test_bank_shapes(bank):
    assert bank.pos.shape == (4, 2048, 2)
    assert bank.length.shape == (4,)
    assert bool(bank.is_loop.all())
    # Tracks actually differ.
    assert not np.allclose(np.asarray(bank.pos[0]), np.asarray(bank.pos[1]))


def test_round_robin_assignment(bparams):
    envs = lap_bank_env.init_env_batch(bparams, 10, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(envs.route_id), [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
    )


def test_spawn_noise_randomizes(bparams):
    e1 = lap_bank_env.reset(bparams, jax.random.PRNGKey(1), track_id=0)
    e2 = lap_bank_env.reset(bparams, jax.random.PRNGKey(2), track_id=0)
    assert not np.allclose(np.asarray(e1.vehicle.pos), np.asarray(e2.vehicle.pos))
    # But still near the track (within the 3 m off-track bound).
    assert float(e1.distance_from_center) < 2.0


def test_step_on_each_track(bparams):
    envs = lap_bank_env.init_env_batch(bparams, 4, jax.random.PRNGKey(0))
    actions = jnp.tile(jnp.array([0.0, 1.0]), (4, 1))
    envs, out = jax.vmap(
        lambda s, a: lap_bank_env.autoreset_step(s, a, bparams)
    )(envs, actions)
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert out.obs.shape[0] == 4


def test_autoreset_keeps_track(bparams):
    """The terminating step re-spawns the env on the SAME bank track."""
    s = lap_bank_env.reset(bparams, jax.random.PRNGKey(0), track_id=2)
    fwd = np.asarray(s.vehicle.forward)
    left = jnp.asarray([-fwd[1], fwd[0]])
    s = s.replace(vehicle=s.vehicle.replace(pos=s.vehicle.pos + 8.0 * left))
    s2, out = lap_bank_env.autoreset_step(s, jnp.array([0.0, 1.0]), bparams)
    assert bool(out.done)
    assert int(s2.route_id) == 2
    assert int(s2.step_count) == 0
    assert not bool(s2.terminal)


def test_evaluate_reports_per_track_laps(bparams):
    """Eval assigns bank tracks round-robin and reports per-track laps."""
    model = ActorCritic()
    config = ppo.PPOConfig(env_kind="lap_bank")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18)))
    n_tracks = bparams.track.pos.shape[0]
    metrics = ppo.evaluate(
        variables, bparams, model, jax.random.PRNGKey(1),
        num_envs=2 * n_tracks, max_steps=16, config=config,
    )
    per_track = metrics["eval/laps_per_track"]
    assert per_track.shape == (n_tracks,)
    assert bool(jnp.all(jnp.isfinite(per_track)))


def test_ppo_trains_on_bank(bparams):
    from carla_ppo_tpu.envs.observations import vector_obs_dim

    model = ActorCritic()
    config = ppo.PPOConfig(
        horizon=8, num_envs=8, num_minibatches=2, env_kind="lap_bank"
    )
    rng = jax.random.PRNGKey(0)
    ts = ppo.create_train_state(model, config, vector_obs_dim(), rng)
    envs = ppo.init_env_batch(bparams, 8, rng, env_kind="lap_bank")
    ts2, envs2, m = ppo.train_iteration(ts, envs, bparams, model, config)
    assert int(ts2.iteration) == 1
    assert all(bool(jnp.isfinite(v)) for v in m.values())

"""Multi-device data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs.observations import vector_obs_dim
from carla_ppo_tpu.models.policy import ActorCritic
from carla_ppo_tpu.parallel import train_dp
from carla_ppo_tpu.parallel.mesh import make_mesh
from carla_ppo_tpu.training import ppo


@pytest.fixture(scope="module")
def setup(request):
    lap_track = request.getfixturevalue("lap_track")
    from carla_ppo_tpu.envs.types import EnvParams

    env_params = EnvParams(track=lap_track)
    model = ActorCritic()
    config = ppo.PPOConfig(horizon=8, num_envs=16, num_minibatches=2)
    rng = jax.random.PRNGKey(0)
    ts = ppo.create_train_state(model, config, vector_obs_dim(), rng)
    envs = ppo.init_env_batch(env_params, config.num_envs, rng)
    return env_params, model, config, ts, envs


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_iteration_runs(setup):
    env_params, model, config, ts, envs = setup
    mesh = make_mesh(8)
    ts = train_dp.replicate(ts, mesh)
    envs = train_dp.shard_env_batch(envs, mesh)
    step = train_dp.make_dp_train_iteration(mesh, model, config, env_params)
    ts2, envs2, metrics = step(ts, envs)
    assert int(ts2.iteration) == 1
    # 16 envs x 8 steps globally.
    assert float(ts2.total_env_steps) == 16 * 8
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k


def test_dp_params_replicated_and_synced(setup):
    env_params, model, config, ts, envs = setup
    mesh = make_mesh(8)
    ts = train_dp.replicate(ts, mesh)
    envs = train_dp.shard_env_batch(envs, mesh)
    step = train_dp.make_dp_train_iteration(mesh, model, config, env_params)
    ts2, _, _ = step(ts, envs)
    # Out-spec P() means params are logically replicated; materialize each
    # device copy and compare bit-for-bit.
    leaf = jax.tree.leaves(ts2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_evaluate_matches_single_device(setup):
    """make_dp_evaluate over the 8-device mesh returns the same metrics as
    single-device ppo.evaluate with the same rng (VERDICT round-3 item 7:
    the dp story must not stop at train_iteration). Discrete outcomes must
    match EXACTLY; float accumulators to last-ULP rounding (XLA vectorizes
    the per-shard width-1 program differently from the width-8 batch - see
    make_dp_evaluate's docstring)."""
    env_params, model, config, ts, envs = setup
    mesh = make_mesh(8)
    rng = jax.random.PRNGKey(42)
    ref = ppo.evaluate(
        ts.params, env_params, model, rng,
        num_envs=8, max_steps=16, config=config,
    )
    dp_eval = train_dp.make_dp_evaluate(
        mesh, model, config, env_params, num_envs=8
    )
    got = dp_eval(ts.params, rng, 16)
    assert set(ref.keys()) == set(got.keys())
    exact = {
        "eval/laps_completed", "eval/episode_steps", "eval/finished",
        "eval/termination_reasons", "eval/overtakes",
    }
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        if k in exact:
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8, err_msg=k)


def test_dp_evaluate_lap_bank_per_track(setup):
    """dp eval on a lap_bank config keeps the round-robin track assignment
    and the per-track laps metric."""
    from carla_ppo_tpu.envs import lap_bank_env

    bank = lap_bank_env.make_lap_bank(n_tracks=2, base_seed=0, capacity=2048)
    env_params = lap_bank_env.lap_bank_params(bank)
    model = ActorCritic()
    config = ppo.PPOConfig(
        horizon=8, num_envs=16, num_minibatches=2, env_kind="lap_bank"
    )
    ts = ppo.create_train_state(
        model, config, vector_obs_dim(), jax.random.PRNGKey(0)
    )
    mesh = make_mesh(8)
    rng = jax.random.PRNGKey(7)
    ref = ppo.evaluate(
        ts.params, env_params, model, rng,
        num_envs=8, max_steps=16, config=config,
    )
    dp_eval = train_dp.make_dp_evaluate(
        mesh, model, config, env_params, num_envs=8
    )
    got = dp_eval(ts.params, rng, 16)
    np.testing.assert_array_equal(
        np.asarray(ref["eval/laps_per_track"]),
        np.asarray(got["eval/laps_per_track"]),
    )


def test_dp_gradient_sync_changes_with_global_batch(setup):
    """The dp update must differ from training on one shard alone (i.e. the
    psum really mixes devices' data)."""
    env_params, model, config, ts, envs = setup
    mesh = make_mesh(8)
    ts_r = train_dp.replicate(ts, mesh)
    envs_r = train_dp.shard_env_batch(envs, mesh)
    step = train_dp.make_dp_train_iteration(mesh, model, config, env_params)
    ts_dp, _, _ = step(ts_r, envs_r)

    # Single-device run on only the first 2 envs (one shard's worth).
    local = jax.tree.map(lambda x: x[:2], envs)
    ts_local, _, _ = ppo.train_iteration(ts, local, env_params, model, config)

    a = jax.tree.leaves(ts_dp.params)[0]
    b = jax.tree.leaves(ts_local.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mean, std, value = out
    assert mean.shape == (1024, 2)
    assert value.shape == (1024,)


def test_dp_latent_iteration_runs(setup):
    """Config 2 (frozen-VAE latent obs) under data parallelism: each shard
    renders + encodes its own envs; grads psum over the mesh."""
    from carla_ppo_tpu.models import vae_common

    env_params, _, _, _, envs = setup
    model = ActorCritic()
    vae = vae_common.build_vae(z_dim=8, model_type="mlp", target_depth=1)
    vae_vars = vae.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *vae.source_shape)),
        jax.random.PRNGKey(1),
        True,
    )
    latent = ppo.LatentObs(vae_model=vae)
    config = ppo.PPOConfig(horizon=2, num_envs=16, num_minibatches=2)
    ts = ppo.create_train_state(
        model, config, latent.obs_dim, jax.random.PRNGKey(0)
    )
    mesh = make_mesh(8)
    ts = train_dp.replicate(ts, mesh)
    envs = train_dp.shard_env_batch(envs, mesh)
    step = train_dp.make_dp_train_iteration(
        mesh, model, config, env_params,
        latent_obs=latent, vae_variables=vae_vars,
    )
    ts2, envs2, metrics = step(ts, envs)
    assert int(ts2.iteration) == 1
    assert float(ts2.total_env_steps) == 16 * 2
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())
    # Params identical across devices after the update.
    leaf = jax.tree.leaves(ts2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_pixel_iteration_runs(setup):
    """Config 4 (end-to-end pixels, joint VAE aux) under data parallelism."""
    from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
    from carla_ppo_tpu.training import pixels

    env_params, _, _, _, envs = setup
    model = PixelActorCritic(z_dim=8)
    config = ppo.PPOConfig(horizon=2, num_envs=16, num_minibatches=2)
    ts = pixels.create_pixel_train_state(model, config, jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    ts = train_dp.replicate(ts, mesh)
    envs = train_dp.shard_env_batch(envs, mesh)
    step = train_dp.make_dp_pixel_train_iteration(
        mesh, model, config, env_params
    )
    ts2, envs2, metrics = step(ts, envs)
    assert int(ts2.iteration) == 1
    assert float(ts2.total_env_steps) == 16 * 2
    assert "train_loss/vae_recon" in metrics
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())
    leaf = jax.tree.leaves(ts2.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_trainer_dp_end_to_end(tmp_path):
    """The Trainer/CLI surface drives the dp path: num_devices=8 shards the
    batch, trains, evals, and checkpoints (VERDICT round-1 item 1)."""
    from carla_ppo_tpu.training.loop import Trainer, TrainerSettings

    settings = TrainerSettings(
        model_name="dp_smoke",
        models_root=str(tmp_path),
        num_iterations=2,
        eval_interval=1,
        eval_envs=2,
        eval_max_steps=8,
        checkpoint_interval=1,
        num_devices=8,
    )
    config = ppo.PPOConfig(horizon=4, num_envs=16, num_minibatches=2)
    tr = Trainer(settings, config)
    try:
        metrics = tr.train()
        assert tr.iteration == 2
        assert np.isfinite(metrics["train_loss/loss"])
        # Params ended replicated across all 8 devices.
        leaf = jax.tree.leaves(tr.train_state.params)[0]
        assert len(leaf.addressable_shards) == 8
    finally:
        tr.close()

    # Resume restores the checkpoint and re-replicates.
    tr2 = Trainer(settings, config)
    try:
        assert tr2.iteration == 2
    finally:
        tr2.close()


def test_trainer_dp_rejects_indivisible_batch(tmp_path):
    from carla_ppo_tpu.training.loop import Trainer, TrainerSettings

    settings = TrainerSettings(
        model_name="dp_bad", models_root=str(tmp_path), num_devices=8
    )
    config = ppo.PPOConfig(horizon=4, num_envs=12, num_minibatches=2)
    with pytest.raises(ValueError, match="divisible"):
        Trainer(settings, config)


def test_dp_with_reward_normalization(setup):
    """normalize_rewards under shard_map: per-env return carries live in the
    sharded EnvState, moments stay replicated via pmean."""
    env_params, model, _, _, envs = setup
    config = ppo.PPOConfig(
        horizon=8, num_envs=16, num_minibatches=2, normalize_rewards=True,
        max_grad_norm=0.5,
    )
    ts = ppo.create_train_state(model, config, vector_obs_dim(), jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    ts = train_dp.replicate(ts, mesh)
    envs = train_dp.shard_env_batch(envs, mesh)
    step = train_dp.make_dp_train_iteration(mesh, model, config, env_params)
    ts2, envs2, metrics = step(ts, envs)
    assert all(bool(jnp.isfinite(v)) for v in metrics.values())
    assert float(ts2.reward_norm.count) > 1.0
    # Moments replicated identically across devices.
    leaf = ts2.reward_norm.var
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_collective_census_matches_gradient_payload(setup):
    """The jaxpr psum census (benchmarks/multichip_model.py) must equal the
    analytic expectation: every gradient leaf is all-reduced once per
    minibatch update (num_epochs x num_minibatches), plus only KB-scale
    scalar/statistic psums on top. This is the arithmetic behind the
    published v5e-8 ICI-time model - if the dp program ever grows an
    accidental extra tensor collective (or drops the gradient psum), this
    pins it."""
    from benchmarks.multichip_model import collective_census

    env_params, model, _, _, envs = setup
    config = ppo.PPOConfig(horizon=4, num_envs=16)  # production 3x4 updates
    ts = ppo.create_train_state(
        model, config, vector_obs_dim(), jax.random.PRNGKey(0)
    )
    mesh = make_mesh(8)
    ts = train_dp.replicate(ts, mesh)
    envs8 = train_dp.shard_env_batch(envs, mesh)
    fn = train_dp.make_dp_train_iteration(mesh, model, config, env_params)

    total_bytes, launches, _ = collective_census(fn, ts, envs8)
    param_bytes = sum(
        int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
        for l in jax.tree.leaves(ts.params)
    )
    updates = config.num_epochs * config.num_minibatches
    grad_payload = updates * param_bytes
    assert total_bytes >= grad_payload, (total_bytes, grad_payload)
    # Non-gradient psums (advantage moments, metric means, KL) are scalars
    # and tiny vectors - bound them at 64 KB/iteration.
    assert total_bytes - grad_payload < 65536, (total_bytes, grad_payload)
    assert launches > updates

"""PPO tests: loss parity with a numpy re-derivation of the reference's TF1
graph (reference: ppo.py:115-132), policy head behavior, and a fused
train_iteration smoke + learning test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.models.policy import (
    ActorCritic,
    gaussian_entropy,
    gaussian_log_prob,
)
from carla_ppo_tpu.training import ppo as ppo_mod


@pytest.fixture(scope="module")
def model():
    return ActorCritic()


@pytest.fixture(scope="module")
def variables(model):
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 18)))


def test_action_mean_within_bounds(model, variables):
    obs = jax.random.normal(jax.random.PRNGKey(1), (64, 18)) * 5
    mean, std, value = model.apply(variables, obs)
    assert mean.shape == (64, 2)
    assert value.shape == (64,)
    # Steer in [-1, 1], throttle in [0, 1] (reference: ppo.py:47 rescaling).
    assert float(mean[:, 0].min()) >= -1.0 and float(mean[:, 0].max()) <= 1.0
    assert float(mean[:, 1].min()) >= 0.0 and float(mean[:, 1].max()) <= 1.0


def test_initial_std(model, variables):
    _, std, _ = model.apply(variables, jnp.zeros((1, 18)))
    np.testing.assert_allclose(np.asarray(std), 1.0, rtol=1e-6)


def test_sample_clipped_and_logprob(model, variables):
    obs = jnp.zeros((256, 18))
    action, logp, value = model.sample(
        variables, obs, jax.random.PRNGKey(2)
    )
    assert float(action[:, 0].min()) >= -1.0
    assert float(action[:, 1].min()) >= 0.0
    mean, std, _ = model.apply(variables, obs)
    want = gaussian_log_prob(action, mean, std)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(want), rtol=1e-5)


def test_greedy_sample_is_mean(model, variables):
    obs = jax.random.normal(jax.random.PRNGKey(3), (8, 18))
    a, _, _ = model.sample(variables, obs, jax.random.PRNGKey(4), greedy=True)
    mean, _, _ = model.apply(variables, obs)
    low = jnp.array([-1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(jnp.clip(mean, low, 1.0)), rtol=1e-6
    )


def test_gaussian_log_prob_matches_scipy():
    from scipy.stats import norm

    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 2)).astype(np.float32)
    mean = rng.normal(size=(16, 2)).astype(np.float32)
    std = np.exp(rng.normal(size=2)).astype(np.float32)
    got = np.asarray(gaussian_log_prob(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(std)))
    want = norm.logpdf(x, mean, std).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gaussian_entropy_matches_scipy():
    from scipy.stats import norm

    std = np.array([0.5, 2.0], np.float32)
    got = float(gaussian_entropy(jnp.asarray(std)))
    want = norm.entropy(0.0, std).sum()
    assert got == pytest.approx(want, rel=1e-4)


def numpy_ppo_loss(logp, logp_old, adv, value, returns, std, eps, vs, es):
    """The reference's loss math (ppo.py:119-132)."""
    ratio = np.exp(logp - logp_old)
    policy_loss = np.mean(np.minimum(ratio * adv, np.clip(ratio, 1 - eps, 1 + eps) * adv))
    value_loss = np.mean((value - returns) ** 2) * vs
    entropy = np.sum(0.5 * np.log(2 * np.pi * np.e * std**2))
    entropy_loss = entropy * es
    return -policy_loss + value_loss - entropy_loss


def test_ppo_loss_parity(model, variables):
    """ppo_loss on a random batch must equal the numpy re-derivation."""
    config = ppo_mod.PPOConfig()
    rng = np.random.default_rng(1)
    n = 64
    obs = rng.normal(size=(n, 18)).astype(np.float32)
    mean, std, value = model.apply(variables, jnp.asarray(obs))
    actions = np.clip(
        np.asarray(mean) + np.asarray(std) * rng.normal(size=(n, 2)),
        [-1, 0], [1, 1],
    ).astype(np.float32)
    logp = np.asarray(
        gaussian_log_prob(jnp.asarray(actions), mean, std)
    )
    logp_old = logp + rng.normal(scale=0.1, size=n).astype(np.float32)
    adv = rng.normal(size=n).astype(np.float32)
    returns = rng.normal(size=n).astype(np.float32)

    batch = {
        "obs": jnp.asarray(obs),
        "actions": jnp.asarray(actions),
        "log_probs": jnp.asarray(logp_old),
        "returns": jnp.asarray(returns),
        "advantages": jnp.asarray(adv),
    }
    loss, metrics = ppo_mod.ppo_loss(variables, model, batch, config)
    want = numpy_ppo_loss(
        logp, logp_old, adv, np.asarray(value), returns, np.asarray(std),
        config.ppo_epsilon, config.value_scale, config.entropy_scale,
    )
    assert float(loss) == pytest.approx(want, rel=1e-4)
    assert float(metrics["train/prob_ratio"]) == pytest.approx(
        float(np.mean(np.exp(logp - logp_old))), rel=1e-4
    )


@pytest.fixture(scope="module")
def small_config():
    return ppo_mod.PPOConfig(horizon=16, num_envs=8, num_minibatches=2)


def test_train_iteration_smoke(lap_params, model, small_config):
    from carla_ppo_tpu.envs.observations import vector_obs_dim

    rng = jax.random.PRNGKey(0)
    ts = ppo_mod.create_train_state(model, small_config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, small_config.num_envs, rng)

    ts2, envs2, metrics = ppo_mod.train_iteration(
        ts, envs, lap_params, model, small_config
    )
    assert int(ts2.iteration) == 1
    assert int(ts2.train_step) == small_config.updates_per_iteration
    assert float(ts2.total_env_steps) == 16 * 8
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"metric {k} not finite"
    # Params actually moved.
    diff = jax.tree.reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, ts.params, ts2.params),
        0.0,
    )
    assert diff > 0


def test_train_iteration_deterministic(lap_params, model, small_config):
    from carla_ppo_tpu.envs.observations import vector_obs_dim

    rng = jax.random.PRNGKey(7)
    ts = ppo_mod.create_train_state(model, small_config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, small_config.num_envs, rng)
    _, _, m1 = ppo_mod.train_iteration(ts, envs, lap_params, model, small_config)
    _, _, m2 = ppo_mod.train_iteration(ts, envs, lap_params, model, small_config)
    assert float(m1["train_loss/loss"]) == float(m2["train_loss/loss"])


def test_rollout_boundary_obs_is_new_episode(lap_params, model, variables):
    """Regression: the trajectory row after a terminal step must hold the NEW
    episode's first observation (reset-within-step), not the finished
    episode's terminal observation paired with the new episode's reward."""
    config = ppo_mod.PPOConfig(horizon=12, num_envs=4)
    params = lap_params.replace(max_episode_steps=jnp.int32(5))
    envs = ppo_mod.init_env_batch(params, 4, jax.random.PRNGKey(0))
    _, traj, _, _ = ppo_mod.rollout(
        model, variables, envs, params, jax.random.PRNGKey(1), 12, config
    )
    dones = np.asarray(traj.dones)
    obs = np.asarray(traj.obs)
    assert dones.sum() > 0
    t_idx, b_idx = np.nonzero(dones[:-1])
    for t, b in zip(t_idx, b_idx):
        # A fresh spawn has zero speed and zero controls (obs features 2:5);
        # the old episode's 5th step cannot (throttle was sampled ~N(0,1)).
        assert abs(obs[t + 1, b, 2]) < 1e-5, (t, b)  # speed feature
        assert abs(obs[t + 1, b, 3]) < 1e-5, (t, b)  # steer control
        assert abs(obs[t + 1, b, 4]) < 1e-5, (t, b)  # throttle control


def test_evaluate_runs(lap_params, model, variables):
    metrics = ppo_mod.evaluate(
        variables, lap_params, model, jax.random.PRNGKey(0), num_envs=2,
        max_steps=200,
    )
    for k, v in metrics.items():
        # Metrics may be arrays (eval/termination_reasons histogram).
        assert bool(jnp.isfinite(v).all()), k
    # An untrained policy at spawn can't finish a 3-lap episode in 200 steps
    # unless it terminates (stopped/off-track) - either way steps <= 200.
    assert float(metrics["eval/episode_steps"]) <= 200


@pytest.mark.slow
def test_learning_improves_reward(lap_params, model):
    """A short CPU training run must beat the random policy's episodic
    reward - the round-1 'does PPO learn at all' check."""
    from carla_ppo_tpu.envs.observations import vector_obs_dim

    config = ppo_mod.PPOConfig(
        horizon=64, num_envs=32, num_minibatches=2, learning_rate=3e-4
    )
    rng = jax.random.PRNGKey(0)
    ts = ppo_mod.create_train_state(model, config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, config.num_envs, rng)

    first_rewards, last_rewards = [], []
    for i in range(30):
        ts, envs, metrics = ppo_mod.train_iteration(
            ts, envs, lap_params, model, config
        )
        mean_r = float(metrics["train_loss/loss"])  # ensure finite chain
        assert np.isfinite(mean_r)
        r = float(metrics["train/reward"])
        if i < 5:
            first_rewards.append(r)
        if i >= 25:
            last_rewards.append(r)
    assert np.mean(last_rewards) > np.mean(first_rewards)


def test_checkpoint_structure_invariant_to_flags(lap_params, model, tmp_path):
    """Checkpoints must load under a default-config template regardless of
    max_grad_norm / normalize_rewards at train time (eval/inspect tools build
    templates from default configs)."""
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.utils.checkpoint import Checkpointer

    rng = jax.random.PRNGKey(0)
    flagged = ppo_mod.PPOConfig(
        horizon=8, num_envs=4, num_minibatches=2,
        max_grad_norm=0.5, normalize_rewards=True,
    )
    ts = ppo_mod.create_train_state(model, flagged, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, 4, rng)
    ts, envs, m = ppo_mod.train_iteration(ts, envs, lap_params, model, flagged)
    assert bool(jnp.isfinite(m["train_loss/loss"]))
    # Reward scaling actually ran: moments moved off their init.
    assert float(ts.reward_norm.count) > 1.0

    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(1, ts)
    default_cfg = ppo_mod.PPOConfig(horizon=8, num_envs=16, num_minibatches=2)
    template = ppo_mod.create_train_state(
        model, default_cfg, vector_obs_dim(), rng
    )
    restored = ck.restore_latest(template)
    assert restored is not None
    assert int(restored.iteration) == 1
    ck.close()


def test_grad_clipping_bounds_update(lap_params, model):
    """With a tiny max_grad_norm the parameter step must shrink."""
    from carla_ppo_tpu.envs.observations import vector_obs_dim

    rng = jax.random.PRNGKey(0)

    def step_size(cfg):
        ts = ppo_mod.create_train_state(model, cfg, vector_obs_dim(), rng)
        envs = ppo_mod.init_env_batch(lap_params, 4, rng)
        ts2, _, _ = ppo_mod.train_iteration(ts, envs, lap_params, model, cfg)
        return float(
            sum(
                jnp.abs(a - b).sum()
                for a, b in zip(
                    jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params)
                )
            )
        )

    free = step_size(ppo_mod.PPOConfig(horizon=8, num_envs=4, num_minibatches=2))
    clipped = step_size(
        ppo_mod.PPOConfig(
            horizon=8, num_envs=4, num_minibatches=2, max_grad_norm=1e-4
        )
    )
    assert clipped < free


def test_mixed_precision_rollout_model(lap_params, model, small_config):
    """policy_dtype 'mixed': a bfloat16 behavior-policy twin drives the
    rollout while the f32 model takes the updates. The stored log-probs are
    the bf16 net's, so the first-epoch ratios sit near (not exactly at) 1 -
    exact importance sampling over the precision gap."""
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.models.policy import ActorCritic

    rollout_model = ActorCritic(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ts = ppo_mod.create_train_state(model, small_config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, small_config.num_envs, rng)

    ts2, envs2, metrics = ppo_mod.train_iteration(
        ts, envs, lap_params, model, small_config,
        rollout_model=rollout_model,
    )
    assert int(ts2.iteration) == 1
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), f"metric {k} not finite"
    # The precision gap is small: mean ratio within a few percent of 1.
    assert abs(float(metrics["train/prob_ratio"]) - 1.0) < 0.05


def test_kl_guard_freezes_after_first_update(lap_params, model, small_config):
    """kl_target trust region (post-solve collapse fix): with a vanishingly
    small target, minibatch 1 applies (its pre-update approx_kl is exactly 0,
    params == behavior policy) and every later minibatch is skipped - the
    final params must equal a single-minibatch update, and the skip fraction
    must be (K-1)/K."""
    import dataclasses as _dc

    from carla_ppo_tpu.envs.observations import vector_obs_dim

    rng = jax.random.PRNGKey(3)
    ts = ppo_mod.create_train_state(model, small_config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, small_config.num_envs, rng)

    guarded = _dc.replace(small_config, kl_target=1e-12)
    ts_g, _, m_g = ppo_mod.train_iteration(ts, envs, lap_params, model, guarded)

    one_mb = _dc.replace(small_config, num_epochs=1, num_minibatches=1,
                         kl_target=1e-12)
    # Same data order: one epoch, one minibatch consumes the whole batch in
    # permutation order, which differs from the 2-minibatch split - so
    # compare against the guarded run's own invariance instead: params after
    # the guard froze must not change when epochs are added.
    more_epochs = _dc.replace(small_config, num_epochs=small_config.num_epochs + 2,
                              kl_target=1e-12)
    ts_g2, _, _ = ppo_mod.train_iteration(ts, envs, lap_params, model, more_epochs)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts_g.params, ts_g2.params,
    )
    k = guarded.updates_per_iteration
    np.testing.assert_allclose(
        float(m_g["train/update_skipped"]), (k - 1) / k, atol=1e-6
    )
    del one_mb


def test_kl_guard_off_by_default_is_unchanged(lap_params, model, small_config):
    """kl_target=0 must produce bit-identical results to the pre-guard path
    (checkpoint/behavior compat), and a huge target must never skip."""
    import dataclasses as _dc

    from carla_ppo_tpu.envs.observations import vector_obs_dim

    rng = jax.random.PRNGKey(4)
    ts = ppo_mod.create_train_state(model, small_config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, small_config.num_envs, rng)

    ts_off, _, m_off = ppo_mod.train_iteration(
        ts, envs, lap_params, model, small_config
    )
    assert "train/update_skipped" not in m_off
    huge = _dc.replace(small_config, kl_target=1e9)
    ts_huge, _, m_huge = ppo_mod.train_iteration(ts, envs, lap_params, model, huge)
    assert float(m_huge["train/update_skipped"]) == 0.0
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts_off.params, ts_huge.params,
    )


def test_adv_snr_gate_freezes_whole_iteration(lap_params, model, small_config):
    """adv_snr_min (post-solve drift fix beyond kl_target): with an absurdly
    high threshold every iteration is noise-dominated by definition, so NO
    update applies - params and opt_state come back bit-identical - and the
    gate's metrics report the freeze."""
    import dataclasses as _dc

    from carla_ppo_tpu.envs.observations import vector_obs_dim

    rng = jax.random.PRNGKey(5)
    ts = ppo_mod.create_train_state(model, small_config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, small_config.num_envs, rng)

    gated = _dc.replace(small_config, adv_snr_min=1e9)
    ts_g, _, m = ppo_mod.train_iteration(ts, envs, lap_params, model, gated)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts.params, ts_g.params,
    )
    assert float(m["train/update_skipped"]) == 1.0
    assert float(m["train/adv_snr"]) < 1e9
    # Counters still advance: the iteration happened, it just applied nothing.
    assert int(ts_g.iteration) == 1

    # A vanishing threshold never freezes and matches the ungated path
    # bit-for-bit (the gate only seeds the same freeze machinery kl_target
    # uses; with neither triggered the select is keep=True everywhere).
    tiny = _dc.replace(small_config, adv_snr_min=1e-30)
    ts_t, _, m_t = ppo_mod.train_iteration(ts, envs, lap_params, model, tiny)
    ts_off, _, _ = ppo_mod.train_iteration(ts, envs, lap_params, model, small_config)
    assert float(m_t["train/update_skipped"]) == 0.0
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts_off.params, ts_t.params,
    )


def test_freeze_arg_holds_params(lap_params, model, small_config):
    """The dynamic `freeze` arg (solve-aware freeze plumbing): True applies
    no update at all; False is bit-identical to not passing it."""
    from carla_ppo_tpu.envs.observations import vector_obs_dim

    rng = jax.random.PRNGKey(6)
    ts = ppo_mod.create_train_state(model, small_config, vector_obs_dim(), rng)
    envs = ppo_mod.init_env_batch(lap_params, small_config.num_envs, rng)

    ts_f, _, m_f = ppo_mod.train_iteration(
        ts, envs, lap_params, model, small_config, freeze=jnp.bool_(True)
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts.params, ts_f.params,
    )
    assert float(m_f["train/update_skipped"]) == 1.0
    assert int(ts_f.iteration) == 1  # the iteration still happened

    ts_live, _, _ = ppo_mod.train_iteration(
        ts, envs, lap_params, model, small_config, freeze=jnp.bool_(False)
    )
    ts_off, _, _ = ppo_mod.train_iteration(ts, envs, lap_params, model, small_config)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts_off.params, ts_live.params,
    )


def test_evaluate_termination_reason_histogram(lap_params, model, variables):
    """eval/termination_reasons counts one episode per env by cause;
    budget survivors land on RUNNING, so the RUNNING mass complements the
    finished fraction exactly."""
    from carla_ppo_tpu.envs.types import TerminationReason

    m = ppo_mod.evaluate(
        variables, lap_params, model, jax.random.PRNGKey(1),
        num_envs=4, max_steps=400,
    )
    hist = np.asarray(m["eval/termination_reasons"])
    assert hist.shape == (len(TerminationReason),)
    assert hist.sum() == 4.0
    finished = float(m["eval/finished"]) * 4.0
    assert hist[int(TerminationReason.RUNNING)] == 4.0 - finished

"""End-to-end pixel pipeline tests (config 4: joint VAE+PPO)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import track
from carla_ppo_tpu.envs.types import EnvParams
from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
from carla_ppo_tpu.training import pixels, ppo


@pytest.fixture(scope="module")
def model():
    return PixelActorCritic()


@pytest.fixture(scope="module")
def setup(model, lap_params):
    config = ppo.PPOConfig(horizon=4, num_envs=4, num_minibatches=2)
    rng = jax.random.PRNGKey(0)
    ts = pixels.create_pixel_train_state(model, config, rng)
    envs = ppo.init_env_batch(lap_params, 4, rng)
    return config, ts, envs


def test_policy_value_no_decoder(model, setup):
    config, ts, envs = setup
    frames = jnp.zeros((2, 80, 160, 1))
    meas = jnp.zeros((2, 3))
    mean, std, value = model.apply(
        ts.params, frames, meas, method=model.policy_value
    )
    assert mean.shape == (2, 2)
    assert float(mean[0, 0]) >= -1.0 and float(mean[0, 1]) >= 0.0
    np.testing.assert_allclose(np.asarray(std), 1.0, rtol=1e-5)


def test_full_call_returns_recon(model, setup):
    config, ts, envs = setup
    frames = jax.random.uniform(jax.random.PRNGKey(1), (2, 80, 160, 1))
    meas = jnp.zeros((2, 3))
    mean, std, value, aux = model.apply(
        ts.params, frames, meas, jax.random.PRNGKey(2)
    )
    assert aux["recon_logits"].shape == (2, 80 * 160)
    assert aux["z_mean"].shape == (2, 64)


def test_act_clips(model, setup):
    config, ts, envs = setup
    frames = jnp.zeros((8, 80, 160, 1))
    meas = jnp.zeros((8, 3))
    a, logp, v = model.act(ts.params, frames, meas, jax.random.PRNGKey(3))
    assert float(a[:, 0].min()) >= -1.0 and float(a[:, 1].min()) >= 0.0
    assert logp.shape == (8,)


def test_pixel_train_iteration(model, setup, lap_params):
    config, ts, envs = setup
    ts2, envs2, m = pixels.pixel_train_iteration(
        ts, envs, lap_params, model, config
    )
    assert int(ts2.iteration) == 1
    for k, v in m.items():
        assert bool(jnp.isfinite(v)), k
    assert "train_loss/vae_recon" in m
    # Frames stored as uint8 class ids (memory layout contract).
    _, traj, _, _ = pixels.pixel_rollout(
        model, ts.params, envs, lap_params, jax.random.PRNGKey(0), config,
        pixels.PixelConfig(),
    )
    assert traj.frames.dtype == jnp.uint8
    assert int(traj.frames.max()) <= 12


def test_pixel_no_decoder_mode(lap_params):
    model = PixelActorCritic(with_decoder=False)
    config = ppo.PPOConfig(horizon=4, num_envs=4, num_minibatches=2)
    rng = jax.random.PRNGKey(0)
    ts = pixels.create_pixel_train_state(model, config, rng)
    envs = ppo.init_env_batch(lap_params, 4, rng)
    ts2, _, m = pixels.pixel_train_iteration(ts, envs, lap_params, model, config)
    assert "train_loss/vae_recon" not in m
    assert bool(jnp.isfinite(m["train_loss/loss"]))


def test_warm_start_from_vae():
    """Encoder/z-heads/decoder transplant from a trained VAE: channel-adapted
    first conv, exact copies elsewhere, policy trunks untouched."""
    import numpy as np

    from carla_ppo_tpu.models import vae_common
    from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
    from carla_ppo_tpu.training import pixels, ppo

    model = PixelActorCritic()
    ts = pixels.create_pixel_train_state(model, ppo.PPOConfig(), jax.random.PRNGKey(0))
    vae = vae_common.build_vae(64, "cnn", 3)  # RGB->seg like the shipped one
    vv = vae.init(
        jax.random.PRNGKey(7), jnp.zeros((1, 80, 160, 3)), jax.random.PRNGKey(8), True
    )
    ts2 = pixels.warm_start_from_vae(ts, vv)
    p, v = ts2.params["params"], vv["params"]
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["conv1"]["kernel"]),
        np.asarray(v["encoder"]["conv1"]["kernel"]).sum(2, keepdims=True),
    )
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["conv3"]["kernel"]),
        np.asarray(v["encoder"]["conv3"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(p["z_mean"]["kernel"]), np.asarray(v["mean"]["kernel"])
    )
    # Policy trunk untouched by the transplant.
    np.testing.assert_array_equal(
        np.asarray(p["pi"]["dense_0"]["kernel"]),
        np.asarray(ts.params["params"]["pi"]["dense_0"]["kernel"]),
    )


def test_pixel_evaluate_greedy():
    """pixels.evaluate: greedy chunked eval terminates, latches snapshots,
    and reports the reference metric set (mirror of ppo.evaluate)."""
    model = PixelActorCritic()
    config = ppo.PPOConfig(num_envs=2, horizon=4)
    pix = pixels.PixelConfig()
    env_params = EnvParams(track=track.make_lap_track(seed=0, props=True))
    ts = pixels.create_pixel_train_state(model, config, jax.random.PRNGKey(0))
    ev = pixels.evaluate(
        ts.params, env_params, model, jax.random.PRNGKey(1),
        num_envs=2, max_steps=300, config=config, pix=pix, chunk=64,
    )
    # A fresh agent stalls: the low-speed terminator fires within budget.
    assert float(ev["eval/finished"]) == 1.0
    assert 0.0 < float(ev["eval/episode_steps"]) <= 300.0
    assert float(ev["eval/distance_traveled"]) >= 0.0
    for k in ("eval/reward", "eval/laps_completed", "eval/average_speed"):
        assert k in ev
    # Dynamic max_steps: a different budget must not trigger a recompile
    # (hash of the jitted fn's static args is identical) - just run it.
    ev2 = pixels.evaluate(
        ts.params, env_params, model, jax.random.PRNGKey(1),
        num_envs=2, max_steps=200, config=config, pix=pix, chunk=64,
    )
    assert float(ev2["eval/episode_steps"]) <= 200.0


def test_pixel_kl_guard(model, setup, lap_params):
    """Pixel-path KL guard (post-solve collapse fix): a vanishing kl_target
    freezes params after the first minibatch; the skip fraction is (K-1)/K
    and the frozen params are invariant to extra epochs."""
    import dataclasses as _dc

    import numpy as np

    config, ts, envs = setup
    guarded = _dc.replace(config, kl_target=1e-12)
    ts_g, _, m_g = pixels.pixel_train_iteration(
        ts, envs, lap_params, model, guarded
    )
    k = guarded.updates_per_iteration
    np.testing.assert_allclose(
        float(m_g["train/update_skipped"]), (k - 1) / k, atol=1e-6
    )
    more = _dc.replace(config, num_epochs=config.num_epochs + 1,
                       kl_target=1e-12)
    ts_g2, _, _ = pixels.pixel_train_iteration(
        ts, envs, lap_params, model, more
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        ts_g.params, ts_g2.params,
    )


def test_pixel_deprop_aux(model):
    """deprop_aux: the iteration runs, stores plain targets, and the VAE
    recon loss measures against the de-prop scene (differs from the
    input-reconstruction loss on a propped track)."""
    from carla_ppo_tpu.envs import track as track_mod
    from carla_ppo_tpu.envs.types import EnvParams

    params = EnvParams(track=track_mod.make_lap_track(seed=0, props=True))
    config = ppo.PPOConfig(horizon=4, num_envs=4, num_minibatches=2)
    rng = jax.random.PRNGKey(0)
    envs = ppo.init_env_batch(params, 4, rng)

    def run(deprop):
        pix = pixels.PixelConfig(deprop_aux=deprop)
        ts = pixels.create_pixel_train_state(model, config, rng, pix)
        _, _, m = pixels.pixel_train_iteration(
            ts, envs, params, model, config, pix
        )
        return {k: float(v) for k, v in m.items()}

    m_plain = run(False)
    m_deprop = run(True)
    assert np.isfinite(m_deprop["train_loss/loss"])
    # Same policy trajectory (the rollout ignores the target stream)...
    assert m_deprop["train/prob_ratio"] == pytest.approx(
        m_plain["train/prob_ratio"], rel=1e-4
    )
    # ...but a different reconstruction target.
    assert m_deprop["train_loss/vae_recon"] != pytest.approx(
        m_plain["train_loss/vae_recon"], rel=1e-6
    )

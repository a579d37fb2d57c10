"""Headline benchmark: PPO training env-steps/sec at 1024 vectorized envs.

Measures the FULL fused pipeline (rollout + GAE + 3x4 minibatch Adam updates,
vector observations) on whatever devices are attached, and prints ONE JSON
line. Baseline: the reference runs one CARLA env at 30 FPS with batch-of-1
sess.run round-trips => ~30 env-steps/sec (BASELINE.md "Simulation rate").

The line's `extra` dict additionally tracks the perception pipelines so the
headline can't silently regress on them: frozen-VAE latent training steps/s
and the semantic-camera render time for 1024 frames.
"""

from __future__ import annotations

import json
import time

import jax


def main() -> None:
    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo

    NUM_ENVS = 1024
    HORIZON = 128
    BASELINE_STEPS_PER_SEC = 30.0  # reference: one CARLA env @ 30 FPS

    model = ActorCritic()
    config = ppo.PPOConfig(num_envs=NUM_ENVS, horizon=HORIZON)
    env_params = EnvParams(track=track.make_lap_track(seed=0))

    rng = jax.random.PRNGKey(0)
    train_state = ppo.create_train_state(model, config, vector_obs_dim(), rng)
    env_states = ppo.init_env_batch(env_params, NUM_ENVS, rng)

    def run(n_iters, train_state, env_states):
        for _ in range(n_iters):
            train_state, env_states, metrics = ppo.train_iteration(
                train_state, env_states, env_params, model, config
            )
        jax.block_until_ready(train_state.params)
        return train_state, env_states

    # Warmup / compile.
    train_state, env_states = run(2, train_state, env_states)

    n_iters = 20
    t0 = time.perf_counter()
    train_state, env_states = run(n_iters, train_state, env_states)
    dt = time.perf_counter() - t0
    steps_per_sec = NUM_ENVS * HORIZON * n_iters / dt

    # --- secondary tracked metrics: latent training + render cost ---
    from carla_ppo_tpu.models import vae_common
    from carla_ppo_tpu.ops import rasterizer as R

    import jax.numpy as jnp

    # The recommended perception-config recipe: bfloat16 compute for the
    # frozen encoder + policy trunks (params stay f32; quality validated by
    # the bf16 lap solve - see README).
    model_l = ActorCritic(dtype=jnp.bfloat16)
    vae = vae_common.build_vae(
        64, "cnn", 1, source_shape=(80, 160, 1), dtype=jnp.bfloat16
    )
    vae_vars = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 1)), jax.random.PRNGKey(1), True
    )
    latent = ppo.LatentObs(vae_model=vae, source="seg")
    ts_l = ppo.create_train_state(model_l, config, latent.obs_dim, rng)
    env_l = ppo.init_env_batch(env_params, NUM_ENVS, rng)

    def run_latent(n, ts, envs):
        for _ in range(n):
            ts, envs, _ = ppo.train_iteration(
                ts, envs, env_params, model_l, config,
                latent_obs=latent, vae_variables=vae_vars,
            )
        jax.block_until_ready(ts.params)
        return ts, envs

    ts_l, env_l = run_latent(1, ts_l, env_l)  # compile
    t0 = time.perf_counter()
    ts_l, env_l = run_latent(3, ts_l, env_l)
    latent_sps = NUM_ENVS * HORIZON * 3 / (time.perf_counter() - t0)

    frames = R.render_batch(env_l, env_params)
    jax.block_until_ready(frames)
    t0 = time.perf_counter()
    for _ in range(5):
        frames = R.render_batch(env_l, env_params)
    jax.block_until_ready(frames)
    render_ms = (time.perf_counter() - t0) / 5 * 1e3

    print(
        json.dumps(
            {
                "metric": "ppo_train_env_steps_per_sec_1024envs",
                "value": round(steps_per_sec, 1),
                "unit": "env_steps/sec",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 1),
                "extra": {
                    "latent_train_steps_per_sec": round(latent_sps, 1),
                    "seg_render_ms_1024_frames": round(render_ms, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

"""Benchmark sweep: throughput of every major pipeline at several batch sizes.

Prints one JSON line per (pipeline, batch) to stdout; run on real TPU
hardware. `bench.py` at the repo root remains the single-headline benchmark.

Usage: python benchmarks/sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python benchmarks/sweep.py` puts benchmarks/ on sys.path, not the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# block_until_ready does not actually wait on the axon remote platform
# (returns in ~16 us for multi-ms programs - round-3 measurement), so all
# timing goes through the host-fetch-synchronized helper.
from carla_ppo_tpu.utils.profiling import timeit_device as timeit  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--batches", type=str, default=None,
                        help="comma list of env-batch sizes (overrides --quick)")
    parser.add_argument("--only", type=str, default=None,
                        choices=["env", "vector", "render", "latent",
                                 "pixel", "dp"],
                        help="run a single pipeline leg")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16", "mixed"],
                        help="policy compute dtype for the ppo_train_vector "
                             "leg; 'mixed' = bfloat16 rollout twin + float32 "
                             "update (the train CLI default)")
    args = parser.parse_args()

    from carla_ppo_tpu.envs import lap_env, track
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.ops import rasterizer as R
    from carla_ppo_tpu.training import ppo

    env_params = EnvParams(track=track.make_lap_track(seed=0))
    model = ActorCritic()
    # The vector leg's compute dtype: "mixed" keeps the update model float32
    # and hands train_iteration a bfloat16 twin as the rollout behavior
    # policy (exact importance sampling; see ppo.train_iteration docstring).
    if args.dtype == "mixed":
        vec_model, vec_rollout_model = model, ActorCritic(dtype=jnp.bfloat16)
    else:
        vec_model = ActorCritic(dtype=jnp.dtype(args.dtype))
        vec_rollout_model = None
    if args.batches:
        batches = [int(b) for b in args.batches.split(",")]
    else:
        batches = [256, 1024] if args.quick else [256, 1024, 4096, 8192]
    results = []

    def report(name, batch, unit_count, seconds, unit="env_steps/sec"):
        rec = {
            "metric": name,
            "batch": batch,
            "value": round(unit_count / seconds, 1),
            "unit": unit,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    in_loop_legs = args.only in (None, "env", "vector", "render")
    for B in batches if in_loop_legs else []:
        rng = jax.random.PRNGKey(0)
        envs = ppo.init_env_batch(env_params, B, rng)

        # 1. env-only stepping (random actions), jitted scan of 128.
        T = 128

        @jax.jit
        def env_only(envs, key):
            def body(c, k):
                s = c
                a = jax.random.uniform(
                    k, (B, 2), minval=jnp.array([-1.0, 0.0]), maxval=1.0
                )
                s, out = jax.vmap(
                    lambda st, ac: lap_env.autoreset_step(st, ac, env_params)
                )(s, a)
                return s, out.reward.sum()

            return jax.lax.scan(body, envs, jax.random.split(key, T))

        if args.only in (None, "env"):
            dt = timeit(env_only, envs, rng)
            report("env_step_only", B, B * T, dt)

        # 2. full PPO iteration, vector obs.
        if args.only in (None, "vector"):
            config = ppo.PPOConfig(num_envs=B, horizon=T)
            ts = ppo.create_train_state(
                vec_model, config, vector_obs_dim(), rng
            )

            def train_it(ts, envs):
                return ppo.train_iteration(
                    ts, envs, env_params, vec_model, config,
                    rollout_model=vec_rollout_model,
                )

            dt = timeit(train_it, ts, envs, iters=5)
            report(f"ppo_train_vector_{args.dtype}", B, B * T, dt)

        # 3. semantic camera render (reduced to a scalar on-device so the
        # sync fetch is not a 13 MB frame transfer).
        if args.only in (None, "render"):
            render = jax.jit(
                lambda e: R.render_batch(e, env_params).sum(dtype=jnp.int32)
            )
            dt = timeit(render, envs)
            report("seg_render", B, B, dt, unit="frames/sec")

    # Legs 4/5 honor --batches (last value) instead of silently pinning 1024
    # (round-3 advisor finding).
    tail_B = batches[-1] if args.batches else (256 if args.quick else 1024)

    # 4. latent-obs training.
    if args.only in (None, "latent"):
        B, T = tail_B, 128
        from carla_ppo_tpu.models import vae_common

        vae = vae_common.build_vae(64, "cnn", 1, source_shape=(80, 160, 1))
        vae_vars = vae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 1)),
            jax.random.PRNGKey(1), True,
        )
        latent = ppo.LatentObs(vae_model=vae, source="seg")
        config = ppo.PPOConfig(num_envs=B, horizon=T)
        rng = jax.random.PRNGKey(0)
        ts = ppo.create_train_state(model, config, latent.obs_dim, rng)
        envs = ppo.init_env_batch(env_params, B, rng)

        def train_latent(ts, envs):
            return ppo.train_iteration(
                ts, envs, env_params, model, config,
                latent_obs=latent, vae_variables=vae_vars,
            )

        dt = timeit(train_latent, ts, envs, iters=3)
        report("ppo_train_latent_frozen_vae", B, B * T, dt)

    # 4b. pixel training (config 4 - the flagship beyond-reference pipeline;
    # round-4 verdict: the one pipeline with no pinned throughput anywhere,
    # so it could regress silently). Rich scene, joint-VAE aux on, the
    # turnkey recipe's program shape.
    if args.only in (None, "pixel"):
        from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
        from carla_ppo_tpu.training import pixels as pixels_mod

        B, T = tail_B, 128
        rng = jax.random.PRNGKey(0)
        rich_params = EnvParams(
            track=track.make_lap_track(seed=0, props=True),
            render_npc_billboards=False,
        )
        # 16 minibatches is a MEMORY constraint at B=1024: the joint-VAE
        # update materializes conv activations for the whole minibatch and
        # <=8-minibatch programs exceed the 15.75 GB chip (see bench.py's
        # pixel leg).
        config = ppo.PPOConfig(num_envs=B, horizon=T, num_minibatches=16)
        pix = pixels_mod.PixelConfig()
        pmodel = PixelActorCritic(initial_std=0.5)
        ts = pixels_mod.create_pixel_train_state(pmodel, config, rng, pix)
        envs = ppo.init_env_batch(rich_params, B, rng)

        def train_pixel(ts, envs):
            return pixels_mod.pixel_train_iteration(
                ts, envs, rich_params, pmodel, config, pix
            )

        dt = timeit(train_pixel, ts, envs, iters=2)
        report("ppo_train_pixels_joint_vae", B, B * T, dt)

    # 5. shard_map dp machinery overhead on a 1-device mesh: the same
    # iteration routed through parallel/train_dp (shard_map + psum + the
    # per-device key fold). On one chip psum is a no-op, so the delta vs
    # ppo_train_vector is pure dp-path overhead; an n-chip projection is
    # n * per-chip-throughput * (1 - overhead) - the gradient all-reduce
    # itself moves ~1.6 MB of params over ICI per minibatch, <1 ms/iter
    # at v5e ICI bandwidth.
    if args.only in (None, "dp"):
        from carla_ppo_tpu.parallel import train_dp
        from carla_ppo_tpu.parallel.mesh import make_mesh

        B, T = tail_B, 128
        rng = jax.random.PRNGKey(0)
        config = ppo.PPOConfig(num_envs=B, horizon=T)
        mesh = make_mesh(1)
        ts = ppo.create_train_state(model, config, vector_obs_dim(), rng)
        envs = ppo.init_env_batch(env_params, B, rng)
        ts = train_dp.replicate(ts, mesh)
        envs = train_dp.shard_env_batch(envs, mesh)
        dp_step = train_dp.make_dp_train_iteration(mesh, model, config, env_params)

        dt = timeit(dp_step, ts, envs, iters=5)
        report("ppo_train_vector_dp1", B, B * T, dt)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()

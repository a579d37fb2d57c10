"""Phase-level profile of one PPO training iteration at several batch sizes.

Answers "where do the milliseconds go as the env batch grows" (round-1
finding: ppo_train_vector peaks at 1024 envs and REGRESSES at 8192 while
env-only stepping keeps scaling). Times, per batch size:

  rollout      - scan(policy sample + env step) over the horizon
  gae+prep     - GAE, advantage normalization, reshape to the flat buffer
  perm         - the 3 epoch permutations alone
  gather       - one epoch's worth of minibatch row gathers alone
  update       - the full epochs x minibatches loss/grad/adam loop
  full         - train_iteration end to end (cross-check)

Usage: python benchmarks/profile_update.py [--batches 1024,8192]
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


# block_until_ready does not actually wait on the axon remote platform
# (returns in ~16 us for multi-ms programs - round-3 measurement), so all
# timing goes through the host-fetch-synchronized helper (the per-leg sync
# fetches the smallest output leaf; every leg here has a <= [B]-sized leaf,
# so the transfer bias is microseconds amortized over the iters).
from carla_ppo_tpu.utils.profiling import timeit_device as timeit  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=str, default="1024,4096,8192")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo

    env_params = EnvParams(track=track.make_lap_track(seed=0))
    model = ActorCritic(dtype=jnp.dtype(args.dtype))
    T = 128
    D = vector_obs_dim()

    for B in batches:
        rng = jax.random.PRNGKey(0)
        config = ppo.PPOConfig(num_envs=B, horizon=T)
        ts = ppo.create_train_state(model, config, D, rng)
        envs = ppo.init_env_batch(env_params, B, rng)
        n = T * B

        # --- rollout only ---
        @jax.jit
        def rollout_only(ts, envs):
            return ppo.rollout(
                model, ts.params, envs, env_params, ts.rng, T, config
            )

        t_roll = timeit(rollout_only, ts, envs, iters=args.iters)

        envs2, traj, bootstrap, _ = rollout_only(ts, envs)

        # --- gae + buffer prep ---
        from carla_ppo_tpu.ops import gae

        @jax.jit
        def gae_prep(traj, bootstrap):
            adv = gae.compute_gae(
                traj.rewards, traj.values, bootstrap, traj.dones,
                config.discount_factor, config.gae_lambda,
            )
            ret = adv + traj.values
            adv = gae.normalize_advantages(adv)
            return {
                "obs": traj.obs.reshape(n, -1),
                "actions": traj.actions.reshape(n, -1),
                "log_probs": traj.log_probs.reshape(n),
                "returns": ret.reshape(n),
                "advantages": adv.reshape(n),
            }

        # Timed variant reduces to a scalar on-device (round-3 advisor
        # finding: gae_prep's smallest leaf is [B*T] and perms returns a
        # [epochs, B*T] int32 - fetching either over the remote-RPC hop
        # biases sub-ms legs; same methodology as profile_render/sweep).
        @jax.jit
        def gae_prep_scalar(traj, bootstrap):
            d = gae_prep(traj, bootstrap)
            return d["returns"].sum() + d["advantages"].sum()

        t_gae = timeit(gae_prep_scalar, traj, bootstrap, iters=args.iters)
        data = gae_prep(traj, bootstrap)

        # --- permutations alone ---
        @jax.jit
        def perms(key):
            ks = jax.random.split(key, config.num_epochs)
            return jax.vmap(lambda k: jax.random.permutation(k, n))(ks)

        @jax.jit
        def perms_scalar(key):
            return perms(key).sum(dtype=jnp.int32)

        t_perm = timeit(perms_scalar, rng, iters=args.iters)

        # --- one epoch of minibatch gathers alone ---
        perm = jax.random.permutation(rng, n).reshape(config.num_minibatches, -1)

        @jax.jit
        def gathers(data, perm):
            def mb(_, idx):
                batch = jax.tree.map(lambda x: x[idx], data)
                return None, batch["obs"].sum() + batch["advantages"].sum()

            _, s = jax.lax.scan(mb, None, perm)
            return s

        t_gather = timeit(gathers, data, perm, iters=args.iters)

        # --- full update loop (epochs x minibatches) on fixed data ---
        tx = ppo.make_optimizer(config)

        @jax.jit
        def update_only(params, opt_state, data, key):
            def mb_step(carry, idx):
                params, opt_state = carry
                batch = jax.tree.map(lambda x: x[idx], data)
                (_, m), grads = jax.value_and_grad(
                    ppo.ppo_loss, has_aux=True
                )(params, model, batch, config)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), m["train_loss/loss"]

            def epoch(carry, k):
                p = jax.random.permutation(k, n).reshape(
                    config.num_minibatches, -1
                )
                return jax.lax.scan(mb_step, carry, p)

            keys = jax.random.split(key, config.num_epochs)
            (params, opt_state), losses = jax.lax.scan(
                epoch, (params, opt_state), keys
            )
            return params, opt_state, losses.mean()

        t_update = timeit(
            update_only, ts.params, ts.opt_state, data, rng, iters=args.iters
        )

        # --- end to end cross-check ---
        def full(ts, envs):
            return ppo.train_iteration(ts, envs, env_params, model, config)

        t_full = timeit(full, ts, envs, iters=args.iters)

        print(
            json.dumps(
                {
                    "batch": B,
                    "rollout_ms": round(t_roll * 1e3, 2),
                    "gae_prep_ms": round(t_gae * 1e3, 2),
                    "perm_ms": round(t_perm * 1e3, 2),
                    "gather_1epoch_ms": round(t_gather * 1e3, 2),
                    "update_ms": round(t_update * 1e3, 2),
                    "full_ms": round(t_full * 1e3, 2),
                    "full_steps_per_sec": round(B * T / t_full, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Pixel-pipeline (config 4) throughput decomposition.

Round-4 VERDICT item 3: the pixel pipeline needs a pinned throughput AND a
render/encode/update decomposition. bench.py pins the headline number; this
tool attributes it:

  full iteration  = rollout (render + conv encode + policy + env step, x
                    horizon) + GAE + update (num_epochs x num_minibatches
                    joint PPO+VAE conv fwd/bwd passes)

measured as two programs - the fused ``pixel_train_iteration`` and a
rollout-only jit of ``pixel_rollout`` - so update+GAE falls out as the
difference. The render share inside the rollout is the in-scan render
number benchmarks/profile_render_scan.py pins (the same render_batch
program feeds both pipelines).

NOTE num_minibatches=16 at 1024 envs is a MEMORY constraint, not a tuning
choice (<=8-minibatch programs OOM the 15.75 GB chip; see bench.py's pixel
leg and RESULTS_round5).

Timing methodology: chained calls + one scalar host fetch
(utils/profiling.timeit_device semantics - block_until_ready does not
block on the axon platform).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs", type=int, default=1024)
    parser.add_argument("--horizon", type=int, default=128)
    parser.add_argument("--minibatches", type=int, default=16)
    parser.add_argument("--trials", type=int, default=3)
    args = parser.parse_args()

    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
    from carla_ppo_tpu.training import pixels as pixels_mod
    from carla_ppo_tpu.training import ppo

    B, T = args.envs, args.horizon
    model = PixelActorCritic(initial_std=0.5)
    config = ppo.PPOConfig(
        num_envs=B, horizon=T, num_minibatches=args.minibatches
    )
    pix = pixels_mod.PixelConfig()
    rich = EnvParams(track=track.make_lap_track(seed=0, props=True))
    rng = jax.random.PRNGKey(0)
    ts = pixels_mod.create_pixel_train_state(model, config, rng, pix)
    envs0 = ppo.init_env_batch(rich, B, rng)

    state = {"ts": ts, "envs": envs0}

    def full_iter():
        state["ts"], state["envs"], _ = pixels_mod.pixel_train_iteration(
            state["ts"], state["envs"], rich, model, config, pix
        )

    def full_sync():
        float(state["ts"].total_env_steps)

    roll_jit = jax.jit(
        partial(pixels_mod.pixel_rollout, config=config, pix=pix),
        static_argnums=(0,),
    )
    rstate = {"envs": envs0, "key": rng}

    def rollout_only():
        rstate["envs"], traj, bootstrap, _ = roll_jit(
            model, state["ts"].params, rstate["envs"], rich, rstate["key"]
        )
        rstate["sum"] = bootstrap.sum()

    def rollout_sync():
        float(rstate["sum"])

    def timed(fn, sync, iters):
        best = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(iters):
                fn()
            sync()
            best.append((time.perf_counter() - t0) / iters)
        return min(best)

    print(f"compiling (B={B}, T={T}, mb={args.minibatches}) ...", flush=True)
    full_iter(); full_sync()
    rollout_only(); rollout_sync()

    t_full = timed(full_iter, full_sync, iters=2)
    t_roll = timed(rollout_only, rollout_sync, iters=2)
    t_upd = t_full - t_roll
    sps = B * T / t_full
    n_updates = config.num_epochs * config.num_minibatches

    print(f"pixel_train_iteration: {t_full * 1e3:9.1f} ms  "
          f"({sps:,.0f} env-steps/s @ {B})")
    print(f"  rollout (render+encode+policy+env x{T}): {t_roll * 1e3:9.1f} ms"
          f"  ({t_roll / t_full * 100:.1f}%)  [{t_roll / T * 1e3:.2f} ms/step]")
    print(f"  update+GAE ({n_updates} joint PPO+VAE minibatch passes):"
          f" {t_upd * 1e3:9.1f} ms  ({t_upd / t_full * 100:.1f}%)"
          f"  [{t_upd / n_updates * 1e3:.2f} ms/minibatch]")
    print("render share inside the rollout: see "
          "profile_render_scan.py (same render_batch program; in-scan "
          "ms/1024-frame figure x horizon)")


if __name__ == "__main__":
    main()

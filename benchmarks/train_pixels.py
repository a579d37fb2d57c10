"""Long-run driver for the end-to-end pixel config (config 4).

Standalone because the pixel pipeline has its own train state/iteration
(training/pixels.py); checkpoints periodically so partial progress survives.

Usage: python benchmarks/train_pixels.py --iterations 2000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=1500)
    parser.add_argument("--num_envs", type=int, default=256)
    parser.add_argument("--horizon", type=int, default=128)
    parser.add_argument("--learning_rate", type=float, default=3e-4)
    parser.add_argument("--max_grad_norm", type=float, default=0.5)
    parser.add_argument("--vae_scale", type=float, default=1e-4)
    # The latent-config breakthrough recipe (round 2): a smaller initial
    # exploration std + weaker entropy bonus lets the action mean sharpen -
    # with std ~1.0 the stochastic rollouts crash before corners and the
    # greedy policy stays knife-edged (see RESULTS_round2.md).
    parser.add_argument("--initial_std", type=float, default=0.5)
    parser.add_argument("--entropy_scale", type=float, default=0.003)
    parser.add_argument("--model_dir", type=str, default="models/pixel_agent")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_npcs", type=int, default=0)
    parser.add_argument("--rich_scene", type=int, default=1)
    parser.add_argument("--warm_start_vae", type=str, default=None,
                        help="Trained VAE model dir: initialize the encoder/"
                             "z-heads/decoder from it (fresh runs only)")
    args = parser.parse_args()

    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
    from carla_ppo_tpu.training import pixels, ppo
    from carla_ppo_tpu.utils.checkpoint import Checkpointer
    from carla_ppo_tpu.utils.metrics import MetricsWriter

    model = PixelActorCritic(initial_std=args.initial_std)
    config = ppo.PPOConfig(
        num_envs=args.num_envs,
        horizon=args.horizon,
        num_minibatches=8,
        learning_rate=args.learning_rate,
        max_grad_norm=args.max_grad_norm,
        initial_std=args.initial_std,
        entropy_scale=args.entropy_scale,
    )
    pix = pixels.PixelConfig(vae_scale=args.vae_scale)
    import jax.numpy as jnp

    env_params = EnvParams(
        track=track.make_lap_track(seed=0, props=bool(args.rich_scene)),
        num_npcs=jnp.int32(args.num_npcs),
    )

    rng = jax.random.PRNGKey(args.seed)
    ts = pixels.create_pixel_train_state(model, config, rng)
    envs = ppo.init_env_batch(env_params, args.num_envs, rng)

    ckpt = Checkpointer(os.path.join(args.model_dir, "checkpoints"))
    # Solve-aware best stream (mirrors training/loop.Trainer): greedy eval
    # peaks are latched by mechanism, not by hoping a periodic save lands on
    # one - joint pixel training degrades unpredictably late (see
    # RESULTS_round2.md), so the best checkpoint is the shippable artifact.
    best_ckpt = Checkpointer(os.path.join(args.model_dir, "best"))
    best_key = (-1.0, -float("inf"))  # (laps, reward)
    restored = ckpt.restore_latest(ts)
    if restored is not None:
        ts = restored
        print(f"resumed at iteration {int(ts.iteration)}", flush=True)
    elif args.warm_start_vae:
        from carla_ppo_tpu.models import vae_common

        _, vae_vars = vae_common.load_vae(args.warm_start_vae)
        ts = pixels.warm_start_from_vae(ts, vae_vars)
        print(f"warm-started perception from {args.warm_start_vae}", flush=True)
    writer = MetricsWriter(os.path.join(args.model_dir, "logs"))

    t0 = time.time()
    while int(ts.iteration) < args.iterations:
        ts, envs, m = pixels.pixel_train_iteration(
            ts, envs, env_params, model, config, pix
        )
        it = int(ts.iteration)
        writer.write_scalars({k: float(v) for k, v in m.items()}, it)
        if it % 25 == 0:
            print(
                f"iter {it}: reward {float(m['train/reward']):8.1f} "
                f"dist {float(m['train/distance_traveled']):6.1f} "
                f"laps {float(m['train/laps_completed']):.3f} "
                f"recon {float(m['train_loss/vae_recon']):7.0f} "
                f"({(time.time() - t0) / max(it, 1):.2f} s/iter)",
                flush=True,
            )
        if it % 100 == 0:
            ckpt.save(it, ts)
        if it % 250 == 0:
            ev = pixels.evaluate(
                ts.params, env_params, model, jax.random.PRNGKey(1),
                num_envs=8, max_steps=26_000, config=config, pix=pix,
            )
            writer.write_scalars({k: float(v) for k, v in ev.items()}, it)
            key = (
                round(float(ev["eval/laps_completed"]), 2),
                float(ev["eval/reward"]),
            )
            marker = ""
            if key > best_key:
                best_key = key
                best_ckpt.save(it, ts)
                marker = "  <- new best"
            print(
                f"  eval @{it}: reward {float(ev['eval/reward']):8.1f} "
                f"dist {float(ev['eval/distance_traveled']):6.1f} m "
                f"laps {float(ev['eval/laps_completed']):.2f} "
                f"finished {float(ev['eval/finished']):.2f}{marker}",
                flush=True,
            )
    ckpt.save(int(ts.iteration), ts)
    ev = pixels.evaluate(
        ts.params, env_params, model, jax.random.PRNGKey(1),
        num_envs=8, max_steps=26_000, config=config, pix=pix,
    )
    print(
        f"final eval: dist {float(ev['eval/distance_traveled']):.1f} m "
        f"laps {float(ev['eval/laps_completed']):.2f}",
        flush=True,
    )
    writer.close()
    ckpt.close()
    best_ckpt.close()
    print("done", flush=True)


if __name__ == "__main__":
    main()

"""Collect paired RGB / semantic-segmentation frames for VAE training (CLI).

Parity with reference: CarlaEnv/collect_data.py - drives around the map and
saves PNG pairs (`rgb/<i>.png`, `segmentation/<i>.png`, class id in the red
channel like CARLA's seg camera). The reference requires a human driving with
WASD for 10,000 frames (README.md:59); here the default is a scripted
noisy lane-following autopilot so the full dataset collects headlessly in
minutes, with `--manual` for the reference's keyboard mode.

Diversity knobs: random track seeds, random spawn points, steering noise, and
camera-noise jitter - the latent space has to cover off-center/off-angle
views for the RL agent to use it (the reference collects the same way, by
driving "randomly" around the lap, README.md:58-60).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from carla_ppo_tpu.envs import lap_env, track as track_mod
from carla_ppo_tpu.envs.types import EnvParams
from carla_ppo_tpu.ops import rasterizer as raster


def save_pair(rgb: np.ndarray, seg: np.ndarray, out_dir: str, idx: int) -> None:
    from PIL import Image

    rgb8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    seg8 = np.zeros((*seg.shape, 3), np.uint8)
    seg8[..., 0] = seg.astype(np.uint8)  # class id in R (CARLA raw format)
    Image.fromarray(rgb8).save(os.path.join(out_dir, "rgb", f"{idx}.png"))
    Image.fromarray(seg8).save(
        os.path.join(out_dir, "segmentation", f"{idx}.png")
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Collects RGB + segmentation frame pairs for VAE training"
    )
    parser.add_argument("--output_dir", type=str, default="vae/data")
    parser.add_argument("--num_images", type=int, default=10000)
    parser.add_argument("--num_tracks", type=int, default=4,
                        help="Distinct random track seeds to sample from")
    parser.add_argument("--steer_noise", type=float, default=0.4)
    parser.add_argument("--save_every", type=int, default=3,
                        help="Save every Nth frame (decorrelates the dataset)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--rich_scene", type=int, default=1,
                        help="Bake roadside props (buildings/fences/poles/"
                             "signs/pedestrians/parked vehicles) + NPC "
                             "traffic so datasets cover all 13 classes")
    parser.add_argument("--num_npcs", type=int, default=6)
    parser.add_argument("--manual", action="store_true",
                        help="Interactive WASD driving like the reference")
    params = parser.parse_args(argv)

    os.makedirs(os.path.join(params.output_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(params.output_dir, "segmentation"), exist_ok=True)

    if params.manual:
        _manual_collect(params)
        return

    cam = raster.CameraConfig()
    rng = jax.random.PRNGKey(params.seed)
    saved = 0
    track_idx = 0
    while saved < params.num_images:
        env_params = EnvParams(
            track=track_mod.make_lap_track(
                seed=params.seed + track_idx, props=bool(params.rich_scene)
            ),
            spawn_pos_noise=jnp.float32(0.8),
            spawn_yaw_noise=jnp.float32(0.15),
            num_npcs=(params.num_npcs if params.rich_scene else 0),
        )
        track_idx = (track_idx + 1) % params.num_tracks

        @jax.jit
        def drive_step(state, key):
            k_steer, k_frame = jax.random.split(key)
            obs = lap_env.observe(state, env_params)
            steer = jnp.clip(
                -0.5 * obs[0] + 2.0 * obs[6] + 1.0 * obs[8]
                + params.steer_noise * jax.random.normal(k_steer),
                -1.0, 1.0,
            )
            throttle = jnp.where(3.6 * state.vehicle.speed < 22.0, 1.0, 0.1)
            state, out = lap_env.autoreset_step(
                state, jnp.stack([steer, throttle]), env_params
            )
            rgb = raster.render_rgb(state, env_params, cam, key=k_frame)
            seg = raster.render_semantic(state, env_params, cam)
            return state, rgb, seg

        rng, k0 = jax.random.split(rng)
        state = lap_env.reset(env_params, k0)
        steps_this_track = min(
            (params.num_images - saved) * params.save_every, 2500
        )
        for i in range(steps_this_track):
            rng, k = jax.random.split(rng)
            state, rgb, seg = drive_step(state, k)
            if i % params.save_every == 0 and saved < params.num_images:
                save_pair(np.asarray(rgb), np.asarray(seg), params.output_dir, saved)
                saved += 1
                if saved % 500 == 0:
                    print(f"saved {saved}/{params.num_images}")
    print(f"done: {saved} pairs under {params.output_dir}")


def _manual_collect(params) -> None:
    """Keyboard collection through the interactive env
    (reference: collect_data.py:276-329; SPACE toggles recording)."""
    import pygame
    from pygame.locals import K_ESCAPE, K_LEFT, K_RIGHT, K_SPACE, K_UP, K_a, K_d, K_w

    from carla_ppo_tpu.envs.gym_api import CarlaLapEnv

    env = CarlaLapEnv(obs_res=(160, 80))
    cam = raster.CameraConfig()
    recording = False
    saved = 0
    action = np.zeros(2, np.float32)
    rng = jax.random.PRNGKey(params.seed)
    print("Drive with WASD/arrows; SPACE toggles recording; ESC quits.")
    while saved < params.num_images:
        pygame.event.pump()
        keys = pygame.key.get_pressed()
        if keys[K_ESCAPE]:
            break
        if keys[K_SPACE]:
            recording = not recording
        action[0] = -0.5 if (keys[K_LEFT] or keys[K_a]) else (
            0.5 if (keys[K_RIGHT] or keys[K_d]) else 0.0
        )
        action[1] = 1.0 if (keys[K_UP] or keys[K_w]) else 0.0
        obs, _, done, info = env.step(action)
        if info["closed"]:
            break
        env.render()
        if recording:
            rng, k = jax.random.split(rng)
            rgb = np.asarray(raster.render_rgb(env.state, env.params, cam, key=k))
            seg = np.asarray(raster.render_semantic(env.state, env.params, cam))
            save_pair(rgb, seg, params.output_dir, saved)
            saved += 1
        if done:
            env.reset()
    env.close()
    print(f"done: {saved} pairs under {params.output_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])

"""Gym-style class API over the functional envs - drop-in parity layer.

A user of the reference drives `CarlaLapEnv` / `CarlaRouteEnv` objects
(reference: carla_lap_env.py:20, carla_route_env.py:20): ctor kwargs,
`reset(is_training)`, `step(action) -> (state, reward, done, {"closed"})`,
`render(mode)` with a pygame window + HUD, keyboard smoke-test `__main__`.
This module offers the same surface on top of the pure-JAX core: the class
owns an `EnvState`, jits the step once, and renders with the on-device
rasterizer instead of a CARLA camera stream.

Mirrored quirks & deliberate fixes:
- `reset()` returns `step(None)[0]` - one tick without acting (reference:
  carla_lap_env.py:255); step(None) keeps the current control.
- The reference declares observation_space (160, 80, 3) while delivering
  (80, 160, 3) frames (carla_lap_env.py:137 vs wrappers.py:173-174); we
  declare the shape that is actually delivered.
- `host`/`port`/`start_carla` kwargs are accepted and ignored: there is no
  server to start.

Single-env stepping through Python costs ~1 ms/step (dispatch-bound) - fine
for interactive use and parity tests; training uses the fused vectorized path.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from carla_ppo_tpu.envs import lap_env, rewards, track as track_mod
from carla_ppo_tpu.envs.observations import encode_state_fns
from carla_ppo_tpu.envs.types import EnvParams, EnvState, RoadOption, TerminationReason
from carla_ppo_tpu.ops import rasterizer as raster


TERMINATION_TEXT = {
    int(TerminationReason.RUNNING): "Running...",
    int(TerminationReason.VEHICLE_STOPPED): "Vehicle stopped",
    int(TerminationReason.OFF_TRACK): "Off-track",
    int(TerminationReason.TOO_FAST): "Too fast",
    int(TerminationReason.LAPS_DONE): "Laps completed",
    int(TerminationReason.MAX_DISTANCE): "Max distance reached",
    int(TerminationReason.COLLISION): "Collision",
    int(TerminationReason.LANE_INVASION): "Lane invasion",
    int(TerminationReason.TIME_LIMIT): "Time limit",
}

MANEUVER_TEXT = {
    int(RoadOption.LANEFOLLOW): "Follow Lane",
    int(RoadOption.LEFT): "Left",
    int(RoadOption.RIGHT): "Right",
    int(RoadOption.STRAIGHT): "Straight",
    int(RoadOption.VOID): "VOID",
}


class CarlaLapEnv:
    """Interactive lap env (reference: carla_lap_env.py:20-509)."""

    metadata = {
        "render.modes": ["human", "rgb_array", "rgb_array_no_hud", "state_pixels"]
    }

    def __init__(
        self,
        host: str = "127.0.0.1",  # ignored: no server
        port: int = 2000,  # ignored
        viewer_res: Tuple[int, int] = (1280, 720),
        obs_res: Tuple[int, int] = (160, 80),
        reward_fn: Union[str, None] = "reward_speed_centering_angle_multiply",
        encode_state_fn: Union[str, Callable, None] = None,
        synchronous: bool = True,  # the sim is always synchronous
        fps: int = 30,
        action_smoothing: float = 0.9,
        start_carla: bool = True,  # ignored
        track_seed: int = 0,
        seed: Optional[int] = None,
        traffic_lights: bool = False,
    ):
        del host, port, synchronous, start_carla
        self.viewer_res = viewer_res
        self.obs_res = obs_res
        self.fps = self.average_fps = fps
        self.action_smoothing = action_smoothing

        if isinstance(reward_fn, str) and reward_fn is not None:
            if reward_fn not in rewards.reward_functions:
                raise KeyError(
                    f"unknown reward_fn {reward_fn!r}; "
                    f"choose from {sorted(rewards.reward_functions)}"
                )
            reward_name = reward_fn
        else:
            reward_name = "reward_speed_centering_angle_multiply"

        self.params = self._make_params(track_seed, fps, action_smoothing, reward_name)
        if traffic_lights:
            # Junction lights (scene dressing + scripted-agent hazards;
            # CARLA worlds have them, see envs/traffic_lights.py).
            from carla_ppo_tpu.envs import traffic_lights as tl

            self.params = tl.add_traffic_lights(self.params, seed=track_seed)

        # Observation encoding: named obs fn ("vector", "pixels", "latent"
        # via vae_common) or None -> raw camera frame.
        if callable(encode_state_fn):
            self._custom_encoder: Optional[Callable] = encode_state_fn
            self._obs_fn_name = None
        elif isinstance(encode_state_fn, str):
            if encode_state_fn not in encode_state_fns:
                raise KeyError(f"unknown encode_state_fn {encode_state_fn!r}")
            self._custom_encoder = None
            self._obs_fn_name = encode_state_fn
        else:
            self._custom_encoder = None
            self._obs_fn_name = None  # raw pixels

        # Action/observation spaces (gymnasium Boxes like the reference's
        # gym Boxes, carla_lap_env.py:136-137 - with the shape fix).
        import gymnasium

        self.action_space = gymnasium.spaces.Box(
            np.array([-1.0, 0.0], np.float32),
            np.array([1.0, 1.0], np.float32),
            dtype=np.float32,
        )
        w, h = obs_res
        self.observation_space = gymnasium.spaces.Box(
            low=0.0, high=1.0, shape=(h, w, 1), dtype=np.float32
        )

        self._rng = jax.random.PRNGKey(0 if seed is None else seed)
        self.state: Optional[EnvState] = None
        self.extra_info: list[str] = []
        self.closed = False
        self.display = None
        self.hud = None
        self.clock = None

        w, h = obs_res
        self._dash_cam = raster.CameraConfig(height=h, width=w)
        # Spectator chase camera (reference: wrappers.py:46-49).
        vw, vh = viewer_res
        scale = max(vw // 320, 1)
        self._spec_cam = raster.CameraConfig(
            height=vh // scale,
            width=vw // scale,
            mount_forward=-5.5,
            mount_height=2.8,
            pitch_deg=-15.0,
        )

        self._bind_jits()
        self.reset()

    # -- construction hooks the route env overrides --

    def _make_params(self, track_seed, fps, action_smoothing, reward_name):
        return EnvParams(
            track=track_mod.make_lap_track(seed=track_seed),
            dt=jnp.float32(1.0 / fps),
            action_smoothing=jnp.float32(action_smoothing),
            reward_fn=reward_name,
        )

    def _bind_jits(self):
        self._jit_step = jax.jit(
            lambda s, a: lap_env.step(s, a, self.params, obs_fn="vector")
        )
        self._jit_reset = jax.jit(
            lambda key, is_training, ckpt: lap_env.reset(
                self.params, key, is_training, ckpt
            )
        )
        self._jit_dash = jax.jit(
            lambda s: raster.render_semantic(s, self.params, self._dash_cam)
        )
        self._jit_spec = jax.jit(
            lambda s: raster.seg_to_rgb(
                raster.render_semantic(s, self.params, self._spec_cam)
            )
        )

    # -- gym-ish API --

    def seed(self, seed=None):
        if seed is not None:
            self._rng = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self, is_training: bool = True, seed: Optional[int] = None):
        if seed is not None:
            self.seed(seed)
        self._rng, key = jax.random.split(self._rng)
        ckpt = 0 if self.state is None else int(self.state.checkpoint_idx)
        self.state = self._jit_reset(key, jnp.bool_(is_training), jnp.int32(ckpt))
        self.extra_info = []
        self.closed = False
        self.observation = None
        self.viewer_image = None
        # Reference returns step(None)[0]: one tick without acting
        # (carla_lap_env.py:255).
        return self.step(None)[0]

    def step(self, action):
        if self.closed:
            raise RuntimeError(
                "CarlaLapEnv.step() called after the environment was closed. "
                'Check for info["closed"] == True in the learning loop.'
            )
        if action is None:
            act = self.state.control  # tick without acting
        else:
            act = jnp.asarray(np.asarray(action, np.float32))
        prev_invasion = bool(self.state.lane_invasion)
        prev_collision = bool(self.state.collision)
        self.state, out = self._jit_step(self.state, act)

        self.observation = np.asarray(
            raster.seg_to_obs(self._jit_dash(self.state))
        )
        encoded = self._encode_state(out)

        if self.hud is not None:
            if bool(self.state.lane_invasion) and not prev_invasion:
                self.hud.notification("Crossed line 'Solid'")
            if bool(self.state.collision) and not prev_collision:
                self.hud.notification("Collision with roadside")

        done = bool(out.done)
        if done:
            self.extra_info.extend(
                [TERMINATION_TEXT[int(self.state.termination_reason)], ""]
            )
        return encoded, float(out.reward), done, {"closed": self.closed}

    def _encode_state(self, out):
        if self._custom_encoder is not None:
            return self._custom_encoder(self)
        if self._obs_fn_name is not None:
            return np.asarray(out.obs)
        return self.observation

    def render(self, mode: str = "human"):
        import pygame

        if self.display is None:
            pygame.init()
            pygame.font.init()
            self.display = pygame.display.set_mode(
                self.viewer_res, pygame.HWSURFACE | pygame.DOUBLEBUF
            )
            from carla_ppo_tpu.envs.hud import HUD

            self.hud = HUD(*self.viewer_res)
            self.clock = pygame.time.Clock()
        self.clock.tick()
        self.hud.tick(self, self.clock)

        maneuver = MANEUVER_TEXT.get(self._current_maneuver(), "INVALID")
        s = self.state
        steps = max(int(s.step_count), 1)
        self.extra_info.extend(
            [
                "Reward: % 19.2f" % float(s.last_reward),
                "",
                "Maneuver:        % 11s" % maneuver,
                "Laps completed:    % 7.2f %%" % (float(s.laps_completed) * 100.0),
                "Distance traveled: % 7d m" % int(s.distance_traveled),
                "Center deviance:   % 7.2f m" % float(s.distance_from_center),
                "Avg center dev:    % 7.2f m"
                % (float(s.center_lane_deviation) / steps),
                "Avg speed:      % 7.2f km/h" % (3.6 * float(s.speed_accum) / steps),
            ]
        )

        # Spectator view (upscaled), dashcam superimposed top-right
        # (reference: carla_lap_env.py:286-293).
        spec = np.asarray(self._jit_spec(self.state))
        self.viewer_image = (spec * 255).astype(np.uint8)
        surf = pygame.transform.scale(
            pygame.surfarray.make_surface(self.viewer_image.swapaxes(0, 1)),
            self.viewer_res,
        )
        self.display.blit(surf, (0, 0))

        obs_rgb = np.asarray(
            raster.seg_to_rgb(self._jit_dash(self.state)) * 255
        ).astype(np.uint8)
        obs_surf = pygame.surfarray.make_surface(obs_rgb.swapaxes(0, 1))
        self.display.blit(
            obs_surf, (self.viewer_res[0] - obs_rgb.shape[1] - 10, 10)
        )

        self.hud.render(self.display, self, extra_info=self.extra_info)
        self.extra_info = []
        pygame.display.flip()

        if mode == "rgb_array_no_hud":
            return self.viewer_image
        elif mode == "rgb_array":
            return np.array(
                pygame.surfarray.array3d(self.display), dtype=np.uint8
            ).transpose([1, 0, 2])
        elif mode == "state_pixels":
            return self.observation
        return None

    def _current_maneuver(self) -> int:
        idx = int(self.state.waypoint_idx) % int(self.params.track.length)
        return int(self.params.track.maneuver[idx])

    def close(self):
        if self.display is not None:
            import pygame

            pygame.quit()
            self.display = None
        self.closed = True


class CarlaRouteEnv(CarlaLapEnv):
    """Interactive random-route env (reference: carla_route_env.py:20-498).

    Same surface as CarlaLapEnv; episodes run random A->B routes chained until
    3000 m total. `reset(is_training)` always starts a fresh random route (the
    reference ignores checkpoints here too)."""

    def __init__(self, *args, num_routes: int = 64, max_distance: float = 3000.0,
                 **kwargs):
        self._num_routes = num_routes
        self._max_distance = max_distance
        super().__init__(*args, **kwargs)

    def _make_params(self, track_seed, fps, action_smoothing, reward_name):
        from carla_ppo_tpu.envs import route_env, route_planner

        town = route_planner.make_town(seed=track_seed)
        bank = route_planner.make_route_bank(
            town, n_routes=self._num_routes, seed=track_seed
        )
        self._bank = bank
        return route_env.route_env_params(
            bank,
            max_distance=self._max_distance,
            dt=jnp.float32(1.0 / fps),
            action_smoothing=jnp.float32(action_smoothing),
            reward_fn=reward_name,
        )

    def _bind_jits(self):
        from carla_ppo_tpu.envs import route_env

        self._jit_step = jax.jit(
            lambda s, a: route_env.step(s, a, self.params, obs_fn="vector")
        )
        self._jit_reset = jax.jit(
            lambda key, is_training, ckpt: route_env.reset(
                self.params, key, is_training
            )
        )
        self._jit_dash = jax.jit(
            lambda s: raster.render_semantic(
                s,
                self.params.replace(
                    track=jax.tree.map(lambda x: x[s.route_id], self.params.track)
                ),
                self._dash_cam,
            )
        )
        self._jit_spec = jax.jit(
            lambda s: raster.seg_to_rgb(
                raster.render_semantic(
                    s,
                    self.params.replace(
                        track=jax.tree.map(
                            lambda x: x[s.route_id], self.params.track
                        )
                    ),
                    self._spec_cam,
                )
            )
        )

    def _current_maneuver(self) -> int:
        rid = int(self.state.route_id)
        idx = min(
            int(self.state.waypoint_idx),
            int(self.params.track.length[rid]) - 1,
        )
        return int(self.params.track.maneuver[rid, idx])


def keyboard_control_loop(env) -> None:
    """Arrow-key / WASD driving, the reference's interactive smoke test
    (reference: carla_lap_env.py:484-509)."""
    import pygame
    from pygame.locals import (
        K_DOWN, K_ESCAPE, K_LEFT, K_RIGHT, K_UP, K_a, K_d, K_h, K_s, K_w,
        KEYDOWN,
    )

    action = np.zeros(2, np.float32)
    while True:
        env.reset(is_training=True)
        while True:
            for event in pygame.event.get():
                if (
                    event.type == KEYDOWN
                    and event.key == K_h
                    and env.hud is not None
                ):
                    env.hud.help.toggle()
            keys = pygame.key.get_pressed()
            if keys[K_ESCAPE]:
                env.close()
                return
            if keys[K_LEFT] or keys[K_a]:
                action[0] = -0.5
            elif keys[K_RIGHT] or keys[K_d]:
                action[0] = 0.5
            else:
                action[0] = 0.0
            action[1] = 1.0 if keys[K_UP] or keys[K_w] else 0.0

            obs, reward, done, info = env.step(action)
            if info["closed"]:
                return
            env.render()
            if done:
                break


if __name__ == "__main__":
    env = CarlaLapEnv(obs_res=(160, 80))
    keyboard_control_loop(env)
    env.close()

"""Standards-compliant Gymnasium adapters.

The reference "does not strictly confine to OpenAI gym's standard"
(reference: README.md:272; reset(is_training) returning only obs, 4-tuple
step). `envs/gym_api` keeps that exact surface for drop-in parity; this
module wraps the same functional cores in the modern Gymnasium API
(reset(seed, options) -> (obs, info); step -> (obs, reward, terminated,
truncated, info)) so the envs compose with today's RL libraries.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import gymnasium
import jax
import jax.numpy as jnp

from carla_ppo_tpu.envs import lap_env, route_env, route_planner, track as track_mod
from carla_ppo_tpu.envs.observations import vector_obs_dim
from carla_ppo_tpu.envs.types import EnvParams


class LapEnvGymnasium(gymnasium.Env):
    """Gymnasium single-env view of the lap simulator (vector observations)."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 30}

    def __init__(
        self,
        track_seed: int = 0,
        reward_fn: str = "reward_speed_centering_angle_multiply",
        action_smoothing: float = 0.0,
        is_training: bool = False,
        render_mode: Optional[str] = None,
    ):
        self.params = EnvParams(
            track=track_mod.make_lap_track(seed=track_seed),
            action_smoothing=jnp.float32(action_smoothing),
            reward_fn=reward_fn,
        )
        self._env = lap_env
        self.is_training = is_training
        self.render_mode = render_mode
        self.action_space = gymnasium.spaces.Box(
            np.array([-1.0, 0.0], np.float32),
            np.array([1.0, 1.0], np.float32),
            dtype=np.float32,
        )
        self.observation_space = gymnasium.spaces.Box(
            -np.inf, np.inf, shape=(vector_obs_dim(),), dtype=np.float32
        )
        self._rng = jax.random.PRNGKey(0)
        self._jit_step = jax.jit(lambda s, a: self._env.step(s, a, self.params))
        self._jit_reset = jax.jit(
            lambda k, t: self._env.reset(self.params, k, t)
        )
        self.state = None

    def _info(self) -> Dict[str, Any]:
        s = self.state
        return {
            "closed": False,  # parity key (carla_lap_env.py:413)
            "distance_traveled": float(s.distance_traveled),
            "laps_completed": float(s.laps_completed),
            "distance_from_center": float(s.distance_from_center),
            "speed": float(s.vehicle.speed),
        }

    def reset(self, *, seed: Optional[int] = None, options=None):
        super().reset(seed=seed)  # seeds gymnasium's np_random bookkeeping
        if seed is not None:
            self._rng = jax.random.PRNGKey(seed)
        self._rng, key = jax.random.split(self._rng)
        self.state = self._jit_reset(key, jnp.bool_(self.is_training))
        obs = np.asarray(self._env.observe(self.state, self.params))
        return obs, self._info()

    def step(self, action):
        self.state, out = self._jit_step(
            self.state, jnp.asarray(np.asarray(action, np.float32))
        )
        terminated = bool(out.done) and not bool(self.state.truncated)
        truncated = bool(self.state.truncated)
        return (
            np.asarray(out.obs),
            float(out.reward),
            terminated,
            truncated,
            self._info(),
        )

    def render(self):
        if self.render_mode != "rgb_array":
            return None
        from carla_ppo_tpu.ops import rasterizer as raster

        cls = raster.render_semantic(self.state, self.params)
        return np.asarray(raster.seg_to_rgb(cls) * 255).astype(np.uint8)


class RouteEnvGymnasium(LapEnvGymnasium):
    """Gymnasium view of the random-route env."""

    def __init__(self, track_seed: int = 0, num_routes: int = 32, **kwargs):
        town = route_planner.make_town(seed=track_seed)
        bank = route_planner.make_route_bank(town, n_routes=num_routes,
                                             seed=track_seed)
        params = route_env.route_env_params(bank)
        # Bypass parent __init__'s lap track; set up manually.
        self.params = params
        self._env = route_env
        self.is_training = kwargs.get("is_training", False)
        self.render_mode = kwargs.get("render_mode")
        self.action_space = gymnasium.spaces.Box(
            np.array([-1.0, 0.0], np.float32),
            np.array([1.0, 1.0], np.float32),
            dtype=np.float32,
        )
        self.observation_space = gymnasium.spaces.Box(
            -np.inf, np.inf, shape=(vector_obs_dim(),), dtype=np.float32
        )
        self._rng = jax.random.PRNGKey(0)
        self._jit_step = jax.jit(lambda s, a: route_env.step(s, a, self.params))
        self._jit_reset = jax.jit(
            lambda k, t: route_env.reset(self.params, k, t)
        )
        self.state = None

    def render(self):
        if self.render_mode != "rgb_array":
            return None
        from carla_ppo_tpu.ops import rasterizer as raster

        per_env = self.params.replace(
            track=route_env.route_track(self.params.track, self.state.route_id)
        )
        cls = raster.render_semantic(self.state, per_env)
        return np.asarray(raster.seg_to_rgb(cls) * 255).astype(np.uint8)

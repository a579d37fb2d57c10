"""Gymnasium `VectorEnv` over the vmapped functional core.

The reference runs ONE CARLA env per process (reference: train.py:69-76
constructs a single CarlaLapEnv); vectorization there would mean N UE4
servers. Here the whole batch is one fused XLA program: a single jitted
call steps every env, so the adapter exposes the modern
`gymnasium.vector.VectorEnv` API (1.x) without subprocesses or worker
pipes — external RL libraries get TPU-resident thousands-of-envs batching
through a standard interface.

Autoreset follows `AutoresetMode.SAME_STEP` (declared in metadata): the
functional core re-spawns an env inside the step that terminates it
(lap_env.autoreset_step semantics), the returned observation row is the NEW
episode's first observation, and the finished episode's terminal observation
is delivered in `infos["final_obs"]` with the standard `_final_obs` mask.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import gymnasium
import jax
import jax.numpy as jnp

from carla_ppo_tpu.envs import lap_env, route_env, track as track_mod
from carla_ppo_tpu.envs.observations import obs_dim_for
from carla_ppo_tpu.envs.types import EnvParams


class LapVectorEnv(gymnasium.vector.VectorEnv):
    """N lap envs as one jitted XLA program (no workers, no pipes)."""

    metadata = {
        "render_modes": ["rgb_array"],
        "render_fps": 30,
        "autoreset_mode": gymnasium.vector.AutoresetMode.SAME_STEP,
    }

    _env_mod = lap_env

    def __init__(
        self,
        num_envs: int = 64,
        track_seed: int = 0,
        reward_fn: str = "reward_speed_centering_angle_multiply",
        action_smoothing: float = 0.0,
        obs_fn: str = "vector",
        is_training: bool = True,
        num_npcs: int = 0,
    ):
        self.params = EnvParams(
            track=track_mod.make_lap_track(seed=track_seed),
            action_smoothing=jnp.float32(action_smoothing),
            reward_fn=reward_fn,
            num_npcs=num_npcs,
        )
        self._build(num_envs, obs_fn, is_training)

    def _build(self, num_envs: int, obs_fn: str, is_training: bool) -> None:
        """Spaces + jitted reset/step closures over self.params (shared by
        the lap and route adapters; only the functional env module and its
        reset signature differ)."""
        self.num_envs = int(num_envs)
        self._obs_fn = obs_fn
        self.is_training = is_training
        obs_dim = obs_dim_for(obs_fn)

        self.single_action_space = gymnasium.spaces.Box(
            np.array([-1.0, 0.0], np.float32),
            np.array([1.0, 1.0], np.float32),
            dtype=np.float32,
        )
        self.single_observation_space = gymnasium.spaces.Box(
            -np.inf, np.inf, shape=(obs_dim,), dtype=np.float32
        )
        self.action_space = gymnasium.vector.utils.batch_space(
            self.single_action_space, self.num_envs
        )
        self.observation_space = gymnasium.vector.utils.batch_space(
            self.single_observation_space, self.num_envs
        )

        params = self.params
        env = self._env_mod
        is_lap = env is lap_env

        def _fresh(state, reset_rng):
            if is_lap:
                # Lap re-spawns keep the persistent respawn checkpoint.
                return env.reset(
                    params,
                    reset_rng,
                    is_training=state.is_training,
                    checkpoint_idx=state.checkpoint_idx,
                )
            return env.reset(params, reset_rng, is_training=state.is_training)

        def _reset_one(key, training):
            state = env.reset(params, key, is_training=training)
            return state, env.observe(state, params, obs_fn)

        def _step_one(state, action):
            # step (not autoreset_step) so the terminal observation is still
            # computable for infos["final_obs"]; the re-spawn mirrors
            # autoreset_step exactly.
            next_state, out = env.step(state, action, params, obs_fn)
            final_obs = out.obs
            rng, reset_rng = jax.random.split(next_state.rng)
            fresh = _fresh(next_state, reset_rng)
            truncated = next_state.truncated
            next_state = jax.tree.map(
                lambda f, n: jnp.where(out.done, f, n),
                fresh,
                next_state.replace(rng=rng),
            )
            obs = jnp.where(
                out.done, env.observe(fresh, params, obs_fn), out.obs
            )
            return next_state, (
                obs,
                out.reward,
                jnp.logical_and(out.done, ~truncated),
                jnp.logical_and(out.done, truncated),
                final_obs,
                out,
            )

        self._jit_reset = jax.jit(jax.vmap(_reset_one, in_axes=(0, None)))
        self._jit_step = jax.jit(jax.vmap(_step_one))
        self._rng = jax.random.PRNGKey(0)
        self._states = None

    def _infos(self, out) -> dict:
        return {
            "distance_traveled": np.asarray(out.distance_traveled),
            "laps_completed": np.asarray(out.laps_completed),
            "total_reward": np.asarray(out.total_reward),
            "step_count": np.asarray(out.step_count),
        }

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._rng = jax.random.PRNGKey(seed)
        self._rng, sub = jax.random.split(self._rng)
        keys = jax.random.split(sub, self.num_envs)
        self._states, obs = self._jit_reset(
            keys, jnp.bool_(self.is_training)
        )
        return np.asarray(obs), {}

    def step(self, actions):
        actions = jnp.asarray(np.asarray(actions, np.float32))
        self._states, (obs, rew, term, trunc, final_obs, out) = (
            self._jit_step(self._states, actions)
        )
        term = np.asarray(term)
        trunc = np.asarray(trunc)
        done = term | trunc
        infos = self._infos(out)
        if done.any():
            infos["final_obs"] = np.asarray(final_obs)
            infos["_final_obs"] = done
        return np.asarray(obs), np.asarray(rew), term, trunc, infos

    def render(self):
        from carla_ppo_tpu.ops import rasterizer as raster

        cls = raster.render_semantic(
            jax.tree.map(lambda x: x[0], self._states), self._render_params()
        )
        return np.asarray(raster.seg_to_rgb(cls) * 255).astype(np.uint8)

    def _render_params(self) -> EnvParams:
        return self.params


class RouteVectorEnv(LapVectorEnv):
    """N route envs as one jitted XLA program.

    Same VectorEnv surface as LapVectorEnv over the route family: every
    reset draws a fresh random route from a precomputed bank, completing a
    route chains into a new one inside step, and episodes end at the
    3000 m budget (route_env semantics; reference: carla_route_env.py).
    `infos["laps_completed"]` carries routes_completed, like the metric
    slot it rides internally.
    """

    _env_mod = route_env

    def __init__(
        self,
        num_envs: int = 64,
        track_seed: int = 0,
        num_routes: int = 32,
        reward_fn: str = "reward_speed_centering_angle_multiply",
        action_smoothing: float = 0.0,
        obs_fn: str = "vector",
        is_training: bool = True,
    ):
        from carla_ppo_tpu.envs import route_planner

        town = route_planner.make_town(seed=track_seed)
        bank = route_planner.make_route_bank(
            town, n_routes=num_routes, seed=track_seed
        )
        self.params = route_env.route_env_params(
            bank,
            action_smoothing=jnp.float32(action_smoothing),
            reward_fn=reward_fn,
        )
        self._build(num_envs, obs_fn, is_training)

    def _render_params(self) -> EnvParams:
        rid = jax.tree.map(lambda x: x[0], self._states).route_id
        return self.params.replace(
            track=route_env.route_track(self.params.track, rid)
        )

"""Multi-track lap environment: domain randomization over track geometry.

BASELINE.json config 5 trains 8192 envs with spawn/route/appearance
randomization. Track-shape randomization works like the route bank: N
domain-randomized lap circuits (envs/track.make_lap_track over seeds) stack
into one TrackData with a leading track axis; each env is pinned to a track
(round-robin), keeping the reference's respawn-checkpoint semantics intact
within each env (reference: carla_lap_env.py:206-218) while the batch as a
whole sees diverse geometry. Spawn jitter comes from EnvParams.spawn_*_noise;
appearance jitter from the renderer's noise key.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from carla_ppo_tpu.envs import lap_env, track as track_mod
from carla_ppo_tpu.envs.lap_env import StepOutput
from carla_ppo_tpu.envs.types import EnvParams, EnvState, TrackData


def make_lap_bank(
    n_tracks: int = 16,
    base_seed: int = 0,
    capacity: int = 2048,
    **track_kwargs,
) -> TrackData:
    """Stack N randomized lap circuits into one bank (leading track axis)."""
    tracks = [
        track_mod.make_lap_track(
            seed=base_seed + i, capacity=capacity, **track_kwargs
        )
        for i in range(n_tracks)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *tracks)


def track_for(bank: TrackData, track_id: Array) -> TrackData:
    return jax.tree.map(lambda x: x[track_id], bank)


def lap_bank_params(bank: TrackData, **overrides) -> EnvParams:
    """EnvParams whose `track` holds the BANK (leading track axis)."""
    return EnvParams(track=bank, **overrides)


def reset(
    params: EnvParams,
    rng: Array,
    is_training: Array | bool = True,
    checkpoint_idx: Array | int = 0,
    track_id: Array | int = 0,
) -> EnvState:
    track_id = jnp.asarray(track_id, jnp.int32)
    per_env = params.replace(track=track_for(params.track, track_id))
    state = lap_env.reset(per_env, rng, is_training, checkpoint_idx)
    return state.replace(route_id=track_id)


@partial(jax.jit, static_argnames=("obs_fn",))
def step(
    state: EnvState,
    action: Array,
    params: EnvParams,
    obs_fn: str = "vector",
) -> Tuple[EnvState, StepOutput]:
    per_env = params.replace(track=track_for(params.track, state.route_id))
    return lap_env.step(state, action, per_env, obs_fn=obs_fn)


def autoreset_step(
    state: EnvState,
    action: Array,
    params: EnvParams,
    obs_fn: str = "vector",
) -> Tuple[EnvState, StepOutput]:
    """Reset-within-step auto-reset on the SAME track (checkpoint respawn
    semantics hold; see lap_env.autoreset_step for the boundary contract)."""
    next_state, out = step(state, action, params, obs_fn=obs_fn)
    rng, reset_rng = jax.random.split(next_state.rng)
    fresh = reset(
        params,
        reset_rng,
        is_training=state.is_training,
        checkpoint_idx=next_state.checkpoint_idx,
        track_id=next_state.route_id,
    )
    next_state = jax.tree.map(
        lambda f, n: jnp.where(out.done, f, n),
        fresh,
        next_state.replace(rng=rng),
    )
    out = out.replace(
        obs=jnp.where(out.done, observe(fresh, params, obs_fn), out.obs)
    )
    return next_state, out


def observe(state: EnvState, params: EnvParams, obs_fn: str = "vector") -> Array:
    per_env = params.replace(track=track_for(params.track, state.route_id))
    return lap_env.observe(state, per_env, obs_fn=obs_fn)


def init_env_batch(
    params: EnvParams, num_envs: int, rng: Array
) -> EnvState:
    """Round-robin track assignment over the batch."""
    n_tracks = params.track.pos.shape[0]
    track_ids = jnp.arange(num_envs, dtype=jnp.int32) % n_tracks
    keys = jax.random.split(rng, num_envs)
    return jax.vmap(lambda k, t: reset(params, k, track_id=t))(keys, track_ids)

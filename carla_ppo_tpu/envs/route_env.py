"""Random-route navigation environment (functional core).

Re-designs reference: CarlaEnv/carla_route_env.py for TPU. Differences from
the lap env (mirroring the reference's deltas):

- every reset draws a fresh random route; completing a route immediately
  chains into a new one inside step (reference: carla_route_env.py:301-302);
- terminal when total distance_traveled reaches 3000 m
  (reference: carla_route_env.py:143, 381-383);
- `routes_completed` = num_routes + fractional progress is the headline
  metric (reference: carla_route_env.py:366), carried in the
  `laps_completed` accumulator slot;
- no lap counting, no respawn checkpoints.

The reference computes each route with a live A* call against the CARLA map
(carla_route_env.py:221-222) - host-side, between episodes. Here routes come
from a precomputed bank (envs/route_planner.make_route_bank) stacked as one
TrackData with a leading route axis, so "new random route" is a single
on-device gather and the whole thing stays inside the jitted step.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

from carla_ppo_tpu.envs import lap_env
from carla_ppo_tpu.envs.lap_env import StepOutput
from carla_ppo_tpu.envs.types import EnvParams, EnvState, TrackData, VehicleState, default_env_state


def route_track(bank: TrackData, route_id: Array) -> TrackData:
    """Slice one route out of the bank (dynamic gather on the leading axis)."""
    return jax.tree.map(lambda x: x[route_id], bank)


def route_env_params(
    bank: TrackData,
    max_distance: float = 3000.0,
    **overrides,
) -> EnvParams:
    """EnvParams for the route env; `track` holds the BANK (leading route
    axis) - step/reset slice it per env."""
    defaults = dict(
        max_distance_traveled=jnp.float32(max_distance),
        max_laps=jnp.float32(jnp.inf),  # no lap terminal on open routes
    )
    defaults.update(overrides)
    return EnvParams(track=bank, **defaults)


def _num_routes(bank: TrackData) -> int:
    return bank.pos.shape[0]


def _spawn_on_route(
    state: EnvState, bank: TrackData, route_id: Array, start_idx: Array | int = 0
) -> EnvState:
    track = route_track(bank, route_id)
    start_idx = jnp.asarray(start_idx, jnp.int32)
    pos = jnp.take(track.pos, start_idx, axis=0)
    fwd = jnp.take(track.fwd, start_idx, axis=0)
    yaw = jnp.arctan2(fwd[1], fwd[0])
    return state.replace(
        vehicle=VehicleState.create(pos, yaw),
        control=jnp.zeros((2,), jnp.float32),
        waypoint_idx=start_idx,
        start_waypoint_idx=start_idx,
        route_id=route_id,
        prev_pos=pos,
    )


def _junction_spawn_idx(track: TrackData, params: EnvParams, key: Array) -> Array:
    """A random waypoint `junction_spawn_backoff` before a junction segment
    of `track` (uniform over its junction waypoints); 0 when the route has
    none. Junction waypoints carry the LEFT/RIGHT/STRAIGHT maneuvers the
    planner paints (envs/route_planner); LANEFOLLOW/CHANGELANE are open road.
    """
    from carla_ppo_tpu.envs.types import RoadOption

    m = track.maneuver
    live = jnp.arange(m.shape[0]) < track.length
    is_junction = (
        (m == RoadOption.LEFT) | (m == RoadOption.RIGHT) | (m == RoadOption.STRAIGHT)
    ) & live
    # Uniform pick among masked indices: argmax of masked uniforms.
    u = jax.random.uniform(key, m.shape)
    pick = jnp.argmax(jnp.where(is_junction, u, -1.0)).astype(jnp.int32)
    idx = jnp.maximum(pick - params.junction_spawn_backoff, 0)
    return jnp.where(jnp.any(is_junction), idx, jnp.int32(0))


def reset(
    params: EnvParams, rng: Array, is_training: Array | bool = True
) -> EnvState:
    """Fresh episode on a random route (reference: carla_route_env.py:189-240;
    note its reset leaves metrics zeroed and new_route picks random spawns).

    Training resets optionally spawn just before a junction with probability
    `params.junction_spawn_prob` (see the field's docstring); eval always
    spawns at the route start like the reference."""
    bank = params.track
    rng, k_route, k_bias, k_pick = jax.random.split(rng, 4)
    route_id = jax.random.randint(k_route, (), 0, _num_routes(bank))
    state = default_env_state(route_track(bank, route_id), rng)
    is_training = jnp.asarray(is_training, jnp.bool_)
    state = state.replace(is_training=is_training)
    track = route_track(bank, route_id)
    bias = is_training & (
        jax.random.uniform(k_bias) < params.junction_spawn_prob
    )
    start_idx = jnp.where(
        bias, _junction_spawn_idx(track, params, k_pick), jnp.int32(0)
    )
    state = _spawn_on_route(state, bank, route_id, start_idx)
    # Mid-route spawns must not count the skipped prefix as progress (the
    # routes_completed metric subtracts this; 0 for route-start spawns).
    state = state.replace(
        route_frac_offset=start_idx.astype(jnp.float32)
        / track.length.astype(jnp.float32)
    )
    return lap_env._with_derived(state, params.replace(track=track))


@partial(jax.jit, static_argnames=("obs_fn",))
def step(
    state: EnvState,
    action: Array,
    params: EnvParams,
    obs_fn: str = "vector",
) -> Tuple[EnvState, StepOutput]:
    """One tick; chains a new random route when the current one is finished
    (reference: carla_route_env.py:300-302)."""
    bank = params.track

    track_now = route_track(bank, state.route_id)
    route_done = state.waypoint_idx >= track_now.length - 1

    rng, k_route = jax.random.split(state.rng)
    new_route_id = jax.random.randint(k_route, (), 0, _num_routes(bank))
    # Reset the low-speed timer: the chained route starts from standstill and
    # deserves its 5 s grace period. (In the reference the episode-global
    # timer keeps running, so the very first step after a route completes
    # trips "Vehicle stopped" - its routes_completed effectively caps at ~1.0;
    # a quirk we fix rather than replicate.)
    switched = _spawn_on_route(state, bank, new_route_id).replace(
        num_routes_completed=state.num_routes_completed + 1,
        low_speed_timer=jnp.float32(0.0),
    )
    state = jax.tree.map(
        lambda new, old: jnp.where(route_done, new, old), switched, state
    ).replace(rng=rng)

    per_env_params = params.replace(track=route_track(bank, state.route_id))
    next_state, out = lap_env.step(state, action, per_env_params, obs_fn=obs_fn)

    # routes_completed metric (reference: carla_route_env.py:366), less the
    # spawn prefix a junction-curriculum reset skipped (route_frac_offset;
    # 0 on reference-parity route-start spawns).
    track = route_track(bank, next_state.route_id)
    routes_completed = (
        next_state.num_routes_completed.astype(jnp.float32)
        + (next_state.waypoint_idx.astype(jnp.float32) + 1.0)
        / track.length.astype(jnp.float32)
        - next_state.route_frac_offset
    )
    next_state = next_state.replace(laps_completed=routes_completed)
    out = out.replace(laps_completed=routes_completed)
    return next_state, out


def autoreset_step(
    state: EnvState,
    action: Array,
    params: EnvParams,
    obs_fn: str = "vector",
) -> Tuple[EnvState, StepOutput]:
    """Step with reset-within-step auto-reset (see lap_env.autoreset_step):
    a terminating step immediately re-spawns on a fresh random route and
    returns the new episode's first observation in StepOutput.obs."""
    next_state, out = step(state, action, params, obs_fn=obs_fn)
    rng, reset_rng = jax.random.split(next_state.rng)
    fresh = reset(params, reset_rng, is_training=state.is_training)
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
    per_env = params.replace(track=route_track(params.track, state.route_id))
    return lap_env.observe(state, per_env, obs_fn=obs_fn)

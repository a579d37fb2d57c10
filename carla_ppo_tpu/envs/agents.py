"""Scripted driving agents (classical autopilot baselines).

Parity with reference: CarlaEnv/agents/ - `Agent` base (hazard checks:
`_is_vehicle_hazard`, agent.py:61-118, brakes for a vehicle ahead on the same
lane; traffic lights don't exist in our synthesized towns, matching the
reference's training routes), `BasicAgent` (PID-follow a planned route to a
destination, basic_agent.py:49-124) and `RoamingAgent` (follow the road
forever, roaming_agent.py:16-74). The reference ships them alongside the
planner; they are not used by the RL path but serve as baselines and
data-collection drivers - same here.

The agents are pure step functions over (EnvState, agent state) so they run
under jit/vmap/scan, e.g. as a vectorized baseline fleet.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct
from jax import Array

from carla_ppo_tpu.envs.controller import VehiclePIDController
from carla_ppo_tpu.envs.types import EnvParams, EnvState


@struct.dataclass
class AgentState:
    controller: VehiclePIDController
    target_speed_kmh: Array  # [] float32

    @classmethod
    def create(cls, target_speed_kmh: float = 20.0) -> "AgentState":
        return cls(
            controller=VehiclePIDController.create(),
            target_speed_kmh=jnp.float32(target_speed_kmh),
        )


def is_vehicle_hazard(
    env_state: EnvState,
    env_params: EnvParams,
    proximity: float = 10.0,
    lane_halfwidth: float = 1.75,
) -> Array:
    """True when an NPC vehicle is ahead of the ego on the same lane within
    `proximity` meters (reference: agent.py:61-118 _is_vehicle_hazard - same
    three tests: ahead of us, on our lane, within the proximity threshold;
    the reference uses map waypoints + is_within_distance_ahead, we use the
    shared road coordinates the whole simulator runs in)."""
    from carla_ppo_tpu.envs import geometry
    from carla_ppo_tpu.envs.observations import wp_gather

    track = env_params.track
    M = env_state.npc_s.shape[0]
    length_f = track.length.astype(jnp.float32)
    ego_s = env_state.waypoint_idx.astype(jnp.float32)
    ds = env_state.npc_s - ego_s
    ds = jnp.where(
        track.is_loop,
        jnp.mod(ds + length_f / 2.0, length_f) - length_f / 2.0,
        ds,
    )
    cur = wp_gather(track.pos, env_state.waypoint_idx, track.length, track.is_loop)
    nxt = wp_gather(
        track.pos, env_state.waypoint_idx + 1, track.length, track.is_loop
    )
    ego_lat = geometry.signed_distance_to_line(cur, nxt, env_state.vehicle.pos)
    active = jnp.arange(M) < env_params.num_npcs
    ahead = jnp.logical_and(ds > 0.0, ds < proximity)
    same_lane = jnp.abs(env_state.npc_lateral - ego_lat) < lane_halfwidth
    return jnp.any(active & ahead & same_lane)


def roaming_agent_step(
    agent: AgentState, env_state: EnvState, env_params: EnvParams
) -> Tuple[Array, AgentState]:
    """Follow the current road at the target speed, slowing for curvature
    (reference: roaming_agent.py:16-74 runs a LocalPlanner at a fixed speed;
    we add curvature-aware slowdown since our tracks have tight turns) and
    performing an emergency stop when a vehicle hazard is detected ahead
    (reference: roaming_agent.py:49-63 -> agent.py emergency_stop)."""
    from carla_ppo_tpu.envs import geometry
    from carla_ppo_tpu.envs.observations import wp_gather

    track = env_params.track
    # Upcoming road bend over ~12 m.
    f_now = wp_gather(track.fwd, env_state.waypoint_idx, track.length, track.is_loop)
    f_ahead = wp_gather(
        track.fwd, env_state.waypoint_idx + 12, track.length, track.is_loop
    )
    bend = jnp.abs(geometry.angle_diff(f_now, f_ahead))
    slow = jnp.clip(1.0 - bend / jnp.deg2rad(60.0), 0.45, 1.0)

    action, controller = agent.controller.run_step(
        env_state, env_params, agent.target_speed_kmh * slow
    )
    # Emergency stop on a vehicle hazard or a red light ahead: keep steering,
    # cut throttle, full brake (reference: agent.py emergency_stop sets
    # throttle 0 / brake 1.0, triggered by _is_vehicle_hazard OR
    # _is_light_red, roaming_agent.py:49-63). The agents emit the 3-channel
    # [steer, throttle, brake] control CARLA vehicles take; the RL action
    # space remains 2-D.
    from carla_ppo_tpu.envs import traffic_lights

    hazard = jnp.logical_or(
        is_vehicle_hazard(env_state, env_params),
        traffic_lights.is_red_light_ahead(env_state, env_params),
    )
    action = jnp.where(
        hazard,
        jnp.stack([action[0], 0.0, 1.0]),
        jnp.stack([action[0], action[1], 0.0]),
    )
    return action, agent.replace(controller=controller)


def basic_agent_step(
    agent: AgentState, env_state: EnvState, env_params: EnvParams
) -> Tuple[Array, AgentState, Array]:
    """Route-following agent; returns (action, agent, done_flag) where done
    signals arrival at the route's final waypoint
    (reference: basic_agent.py:96-124 returns a stop control at the end)."""
    track = env_params.track
    remaining = track.length - 1 - env_state.waypoint_idx
    arrived = remaining <= 2

    action, agent = roaming_agent_step(agent, env_state, env_params)
    # Stop at the destination: full brake (reference: basic_agent.py:96-118
    # emits a stop control at the route's end).
    action = jnp.where(arrived, jnp.array([0.0, 0.0, 1.0]), action)
    return action, agent, arrived

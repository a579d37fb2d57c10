"""Local planner: waypoint queue/buffer + PID waypoint following (pure JAX).

Parity with reference: CarlaEnv/agents/navigation/local_planner.py - the
`LocalPlanner` there keeps a queue of (waypoint, RoadOption) pairs (a global
plan, or auto-extended on the fly at `sampling_radius` spacing,
local_planner.py:153-180), peels a 5-entry buffer off its head
(local_planner.py:212-219), PID-follows the buffer head
(local_planner.py:221-226), purges every buffered waypoint the vehicle has
come within `min_distance` of (local_planner.py:228-238), and emits a full
stop once the queue runs dry (local_planner.py:202-210).

TPU-native design: the queue is not a host-side deque - the baked track
polyline (TrackData) IS the plan, resident in HBM, and the planner state is
three scalars (`head`, `buffer_fill`, `exhausted`) advanced branchlessly so
the whole planner runs under jit/vmap/scan. `set_global_plan` is a state
reset onto a route track (the reference's clear-and-refill,
local_planner.py:182-187); roaming auto-extension corresponds to wrapping on
looped tracks - junction choices are sampled at route-bake time
(route_planner.sample_route_bank), where the random `road_options_list`
choice of local_planner.py:172-178 lives in this framework.

Spacing note: the reference queues waypoints `sampling_radius` apart
(target_speed * 1 s / 3.6 = 5.6 m at 20 km/h) and purges at 90% of that;
our tracks are baked at 1 m resolution, so the planner strides the polyline
by `sampling_stride` waypoints to reproduce the same geometry.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct
from jax import Array

from carla_ppo_tpu.envs.controller import VehiclePIDController
from carla_ppo_tpu.envs.observations import wp_gather
from carla_ppo_tpu.envs.types import EnvParams, EnvState, RoadOption

# Reference defaults (local_planner.py:44,78,101-104).
MIN_DISTANCE_PERCENTAGE = 0.9
BUFFER_SIZE = 5
DEFAULT_TARGET_SPEED_KMH = 20.0


@struct.dataclass
class LocalPlannerState:
    """Queue/buffer cursor over the baked plan + the PID controller state.

    `head` indexes the plan entry at the buffer's head (the current target -
    reference: `self._waypoint_buffer[0]`, local_planner.py:224). Entries
    head..head+BUFFER_SIZE-1 form the buffer; entries beyond are the queue.
    """

    controller: VehiclePIDController
    head: Array  # [] int32, plan index of the buffer head
    target_speed_kmh: Array  # [] float32 (set_speed, local_planner.py:144)
    sampling_stride: Array  # [] int32, plan waypoints per queue entry
    min_distance: Array  # [] float32, purge radius in meters

    @classmethod
    def create(
        cls,
        target_speed_kmh: float = DEFAULT_TARGET_SPEED_KMH,
        sampling_radius_s: float = 1.0,
    ) -> "LocalPlannerState":
        """`sampling_radius_s`: queue spacing in seconds of travel at the
        target speed (reference opt_dict['sampling_radius'],
        local_planner.py:103,122-124)."""
        radius_m = target_speed_kmh * sampling_radius_s / 3.6
        return cls(
            controller=VehiclePIDController.create(),
            head=jnp.int32(0),
            target_speed_kmh=jnp.float32(target_speed_kmh),
            sampling_stride=jnp.int32(max(1, round(radius_m))),
            min_distance=jnp.float32(radius_m * MIN_DISTANCE_PERCENTAGE),
        )

    def set_global_plan(self) -> "LocalPlannerState":
        """Restart the cursor at the plan's start (reference clears the
        queue and refills it from the new plan, local_planner.py:182-187;
        here the plan lives in EnvParams.track, so only the cursor moves)."""
        return self.replace(
            head=jnp.int32(0),
            controller=VehiclePIDController.create(),
        )

    def set_speed(self, speed_kmh) -> "LocalPlannerState":
        return self.replace(target_speed_kmh=jnp.float32(speed_kmh))


def _buffer_positions(
    planner: LocalPlannerState, env_params: EnvParams
) -> Tuple[Array, Array]:
    """Positions [BUFFER_SIZE, 2] + validity mask of the buffered entries."""
    track = env_params.track
    offsets = jnp.arange(BUFFER_SIZE, dtype=jnp.int32)
    idx = planner.head + offsets * planner.sampling_stride
    pos = wp_gather(track.pos, idx, track.length, track.is_loop)
    in_plan = jnp.logical_or(
        track.is_loop, idx < track.length
    )  # open plans end; loops never exhaust (roaming auto-extension)
    return pos, in_plan


def run_step(
    planner: LocalPlannerState,
    env_state: EnvState,
    env_params: EnvParams,
) -> Tuple[Array, LocalPlannerState, Array]:
    """One planning step -> ([steer, throttle], state', target_maneuver).

    Mirrors reference local_planner.py:189-243 run_step: PID toward the
    buffer head, then purge every buffered waypoint within `min_distance`
    (advancing past the FARTHEST such entry - the reference scans the whole
    buffer and pops through max_index); a drained open plan yields a stop
    control. Also returns the head entry's RoadOption (the reference exposes
    it as `self._target_road_option`)."""
    track = env_params.track
    veh = env_state.vehicle

    # Target = buffer head (reference: local_planner.py:224).
    target_pos = wp_gather(track.pos, planner.head, track.length, track.is_loop)
    target_opt = wp_gather(
        track.maneuver, planner.head, track.length, track.is_loop
    )

    action, controller = planner.controller.run_step_to_point(
        env_state, env_params, target_pos, planner.target_speed_kmh
    )

    # Purge: advance head past the farthest buffered entry within
    # min_distance (reference: local_planner.py:228-238).
    buf_pos, in_plan = _buffer_positions(planner, env_params)
    d = jnp.linalg.norm(buf_pos - veh.pos[None, :], axis=1)
    within = jnp.logical_and(d < planner.min_distance, in_plan)
    offsets = jnp.arange(BUFFER_SIZE, dtype=jnp.int32)
    max_index = jnp.max(jnp.where(within, offsets, -1))
    new_head = planner.head + (max_index + 1) * planner.sampling_stride

    # Queue exhausted on an open plan -> full stop (reference:
    # local_planner.py:202-210 emits steer 0 / throttle 0 / brake 1).
    exhausted = jnp.logical_and(
        jnp.logical_not(track.is_loop), planner.head >= track.length
    )
    action = jnp.where(
        exhausted,
        jnp.array([0.0, 0.0, 1.0]),
        jnp.concatenate([action, jnp.zeros((1,))]),
    )
    target_opt = jnp.where(exhausted, jnp.int32(int(RoadOption.VOID)), target_opt)

    planner = planner.replace(head=new_head, controller=controller)
    return action, planner, target_opt

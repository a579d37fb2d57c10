"""Classical PID vehicle controllers (pure JAX, vmap-friendly).

Parity with reference: CarlaEnv/agents/navigation/controller.py -
`VehiclePIDController` combining a longitudinal PID on speed error with a
lateral PID on the heading error to a target waypoint. Used by the scripted
agents (BasicAgent / RoamingAgent) and the data collector's autopilot; also a
handy baseline the RL agent must beat.

State (integral/previous error) is carried explicitly so controllers run
inside jit/scan; the reference keeps deques of errors (controller.py:81,137),
we keep the running integral + last error, the same information the PID uses.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct
from jax import Array

from carla_ppo_tpu.envs import geometry
from carla_ppo_tpu.envs.observations import wp_gather
from carla_ppo_tpu.envs.types import EnvParams, EnvState


@struct.dataclass
class PIDState:
    integral: Array  # [] float32
    prev_error: Array  # [] float32

    @classmethod
    def zero(cls) -> "PIDState":
        return cls(integral=jnp.float32(0.0), prev_error=jnp.float32(0.0))


@struct.dataclass
class PIDParams:
    k_p: Array
    k_i: Array
    k_d: Array

    @classmethod
    def create(cls, k_p: float, k_i: float, k_d: float) -> "PIDParams":
        return cls(
            k_p=jnp.float32(k_p), k_i=jnp.float32(k_i), k_d=jnp.float32(k_d)
        )


def pid_step(
    params: PIDParams, state: PIDState, error: Array, dt: Array
) -> Tuple[Array, PIDState]:
    """One PID update; returns (control, new_state)."""
    integral = state.integral + error * dt
    derivative = (error - state.prev_error) / jnp.maximum(dt, 1e-6)
    out = params.k_p * error + params.k_i * integral + params.k_d * derivative
    return out, PIDState(integral=integral, prev_error=error)


@struct.dataclass
class VehiclePIDController:
    """Lateral + longitudinal PID -> [steer, throttle] action.

    Defaults follow the reference's gains (controller.py:36-44: lateral
    K_P=1.95, longitudinal K_P=1.0 at its 20 Hz; retuned mildly for 30 Hz).
    """

    lateral: PIDParams
    longitudinal: PIDParams
    lat_state: PIDState
    lon_state: PIDState

    @classmethod
    def create(cls) -> "VehiclePIDController":
        return cls(
            lateral=PIDParams.create(1.95, 0.07, 0.2),
            longitudinal=PIDParams.create(0.4, 0.05, 0.0),
            lat_state=PIDState.zero(),
            lon_state=PIDState.zero(),
        )

    def run_step(
        self,
        env_state: EnvState,
        env_params: EnvParams,
        target_speed_kmh: Array,
        lookahead: int = 4,
    ) -> Tuple[Array, "VehiclePIDController"]:
        """Compute [steer, throttle] toward the waypoint `lookahead` ahead at
        `target_speed_kmh` (reference: controller.py:46-68 run_step)."""
        track = env_params.track
        wp = wp_gather(
            track.pos, env_state.waypoint_idx + lookahead,
            track.length, track.is_loop,
        )
        return self.run_step_to_point(env_state, env_params, wp, target_speed_kmh)

    def run_step_to_point(
        self,
        env_state: EnvState,
        env_params: EnvParams,
        wp: Array,
        target_speed_kmh: Array,
    ) -> Tuple[Array, "VehiclePIDController"]:
        """Compute [steer, throttle] toward an explicit target point `wp`
        ([2] world coords) - the reference controller's actual interface
        (controller.py:46-68 takes the target waypoint object; the
        LocalPlanner hands it the buffer head)."""
        veh = env_state.vehicle
        # Lateral: signed heading error to the target waypoint
        # (reference: controller.py:151-180 uses the same cross/dot geometry).
        heading_err = geometry.angle_diff(veh.forward, wp - veh.pos)
        steer_raw, lat_state = pid_step(
            self.lateral, self.lat_state, heading_err, env_params.dt
        )
        steer = jnp.clip(steer_raw, -1.0, 1.0)

        # Longitudinal: speed error in km/h (reference: controller.py:102-123).
        speed_err = (target_speed_kmh - 3.6 * veh.speed) / 3.6
        throttle_raw, lon_state = pid_step(
            self.longitudinal, self.lon_state, speed_err, env_params.dt
        )
        throttle = jnp.clip(throttle_raw, 0.0, 1.0)

        action = jnp.stack([steer, throttle])
        return action, self.replace(lat_state=lat_state, lon_state=lon_state)

"""Single-track (bicycle) vehicle dynamics, pure-JAX and vmap-first.

Replaces the physics of the external CARLA/UnrealEngine server the reference
drives over TCP RPC (reference: CarlaEnv/carla_lap_env.py:338-349 world.tick).
Two fidelity levels, selected statically by `EnvParams.dynamics_model`:

- "kinematic": classic kinematic bicycle with slip angle beta; exact at the
  15-25 km/h speeds the reward band targets (reference:
  reward_functions.py:80-81).
- "dynamic": kinematic backbone + lateral-grip clamp, which limits curvature
  at speed (understeer) like a real car, while remaining a smooth,
  compiler-friendly closed form (no implicit tire solve in the hot loop).

Control input matches the reference action space [steer, throttle] in
[-1,1] x [0,1] (reference: carla_lap_env.py:136); steering passes through a
first-order actuator lag, throttle through a speed-fading engine-force curve
plus quadratic drag and rolling resistance.

All math is float32, scalar-per-env, laid out so a vmapped batch becomes [B]
vectors that the VPU chews through; there are no data-dependent branches.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array, lax

from carla_ppo_tpu.envs.types import VehicleParams, VehicleState

GRAVITY = 9.81


def longitudinal_force(
    params: VehicleParams, v: Array, throttle: Array, brake: Array = 0.0
) -> Array:
    """Net longitudinal force (N): engine minus brake, drag and rolling
    resistance. `brake` in [0,1] maps to CARLA's VehicleControl.brake (the
    scripted agents' emergency_stop sets it to 1.0, reference: agent.py
    emergency_stop / local_planner.py:206); the RL action space has no brake
    channel, matching the reference's [steer, throttle] Box."""
    engine = throttle * params.engine_force * jnp.maximum(1.0 - v / params.v_max, 0.0)
    drag = params.drag_coef * v * v
    roll = params.roll_coef * params.mass * GRAVITY * jnp.sign(v)
    braking = brake * params.brake_force * jnp.sign(v)
    return engine - drag - roll - braking


def _substep(
    params: VehicleParams,
    state: VehicleState,
    steer_cmd: Array,
    throttle_cmd: Array,
    brake_cmd: Array,
    dt: Array,
    dynamic: bool,
) -> VehicleState:
    # Steering actuator: first-order lag toward the commanded wheel angle.
    target_angle = steer_cmd * params.max_steer
    alpha = 1.0 - jnp.exp(-dt / params.steer_tau)
    steer_angle = state.steer_angle + alpha * (target_angle - state.steer_angle)

    v = jnp.sqrt(state.vx**2 + state.vy**2)

    if dynamic:
        # Grip clamp: cap curvature so that lateral accel v^2 * kappa stays
        # below max_lat_accel. Effective steer shrinks smoothly at speed.
        kappa_cmd = jnp.tan(steer_angle) / params.wheelbase
        kappa_max = params.max_lat_accel / jnp.maximum(v * v, 1e-3)
        kappa = jnp.clip(kappa_cmd, -kappa_max, kappa_max)
        eff_angle = jnp.arctan(kappa * params.wheelbase)
    else:
        eff_angle = steer_angle

    # Kinematic bicycle with CG slip angle beta.
    beta = jnp.arctan(params.lr / params.wheelbase * jnp.tan(eff_angle))
    accel = longitudinal_force(params, v, throttle_cmd, brake_cmd) / params.mass
    v_new = jnp.maximum(v + accel * dt, 0.0)  # no reverse (brake holds at 0)

    yaw_rate = v_new / params.lr * jnp.sin(beta)
    yaw = state.yaw + yaw_rate * dt
    course = state.yaw + beta  # velocity direction
    pos = state.pos + v_new * dt * jnp.stack(
        [jnp.cos(course), jnp.sin(course)], axis=-1
    )

    return VehicleState(
        pos=pos,
        yaw=yaw,
        vx=v_new * jnp.cos(beta),
        vy=v_new * jnp.sin(beta),
        yaw_rate=yaw_rate,
        steer_angle=steer_angle,
    )


def vehicle_step(
    params: VehicleParams,
    state: VehicleState,
    steer_cmd: Array,
    throttle_cmd: Array,
    dt: Array,
    substeps: int = 2,
    dynamics_model: str = "kinematic",
    brake_cmd: Array = 0.0,
) -> VehicleState:
    """Advance the vehicle by one env tick of `dt` seconds.

    `substeps` is a static unroll count (explicit Euler per substep); 2
    substeps at 30 Hz keeps integration error well under the 1 m waypoint
    resolution of the track.
    """
    dynamic = dynamics_model == "dynamic"
    sub_dt = dt / substeps

    def body(_, s):
        return _substep(params, s, steer_cmd, throttle_cmd, brake_cmd, sub_dt, dynamic)

    return lax.fori_loop(0, substeps, body, state, unroll=True)

"""Reward/termination plugin layer, pure-function edition.

Parity with reference: reward_functions.py. The reference wraps each named
reward in `create_reward_fn` (reference: reward_functions.py:8-56) which adds
termination logic (low-speed timeout, off-center, optional over-speed) and a
-10 terminal penalty; here that wrapper is `step_reward`, evaluated branch-free
inside the jitted env step.

Differences from the reference, on purpose (SURVEY.md "quirks"):
- the low-speed timer is per-env state, not a module global shared across env
  instances (reference: reward_functions.py:4,26 - a documented bug);
- the over-speed termination works (the reference reads an unbound variable
  `speed_kmh`, reward_functions.py:38);
- collision / lane-invasion termination are real, configurable causes instead
  of HUD notifications (reference: carla_lap_env.py:453-459).

All reward fns take scalar per-env inputs and broadcast under vmap.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
from jax import Array

from carla_ppo_tpu.envs.types import EnvState, EnvParams, RewardParams, TerminationReason

# A reward fn maps (state, params) -> scalar reward, given a state whose
# step-derived fields (distance_from_center, angle_to_road, speed) are fresh.
RewardFn = Callable[[EnvState, EnvParams], Array]

reward_functions: Dict[str, RewardFn] = {}


def register(name: str) -> Callable[[RewardFn], RewardFn]:
    def deco(fn: RewardFn) -> RewardFn:
        reward_functions[name] = fn
        return fn

    return deco


def _speed_reward(speed_kmh: Array, rp: RewardParams) -> Array:
    """Trapezoid speed shaping (reference: reward_functions.py:88-95):
    0 -> 1 over [0, min_speed], 1 on [min_speed, target_speed], then falling
    1 -> 0 over [target_speed, max_speed] and negative beyond."""
    rising = speed_kmh / rp.min_speed
    falling = 1.0 - (speed_kmh - rp.target_speed) / (rp.max_speed - rp.target_speed)
    return jnp.where(
        speed_kmh < rp.min_speed,
        rising,
        jnp.where(speed_kmh > rp.target_speed, falling, 1.0),
    )


def _centering_factor(state: EnvState, rp: RewardParams) -> Array:
    """1 when centered, 0 at max_distance (reference: reward_functions.py:98)."""
    return jnp.maximum(1.0 - state.distance_from_center / rp.max_distance, 0.0)


def _angle_factor(state: EnvState, rp: RewardParams) -> Array:
    """1 aligned with road, 0 at +-20 deg (reference: reward_functions.py:101)."""
    return jnp.maximum(
        1.0 - jnp.abs(state.angle_to_road / rp.angle_factor_max), 0.0
    )


@register("reward_kendall")
def reward_kendall(state: EnvState, params: EnvParams) -> Array:
    """Speed in km/h ('Learn to Drive in a Day'; reference:
    reward_functions.py:65-67)."""
    return 3.6 * state.vehicle.speed


@register("reward_speed_centering_angle_add")
def reward_speed_centering_angle_add(state: EnvState, params: EnvParams) -> Array:
    """speed + centering + angle (reference: reward_functions.py:72-106)."""
    rp = params.reward
    return (
        _speed_reward(3.6 * state.vehicle.speed, rp)
        + _centering_factor(state, rp)
        + _angle_factor(state, rp)
    )


@register("reward_speed_centering_angle_multiply")
def reward_speed_centering_angle_multiply(
    state: EnvState, params: EnvParams
) -> Array:
    """speed * centering * angle (reference: reward_functions.py:111-145;
    the default in reference: train.py:253)."""
    rp = params.reward
    return (
        _speed_reward(3.6 * state.vehicle.speed, rp)
        * _centering_factor(state, rp)
        * _angle_factor(state, rp)
    )


# Along-track window (m) around an NPC inside which an offset ego counts as
# mid-overtake: an overtake NEEDS lateral offset, and punishing it teaches
# tailgating instead of passing (measured round 3: the multiplicative reward
# capped the traffic agent at NPC-following pace - RESULTS_round3.md).
OVERTAKE_WINDOW = 15.0
# Minimum lateral offset FROM THE NPC for the centering waiver: an ego
# directly behind (|dlat| below this) is following, not passing, and earns
# centering normally. (An unconditional near-NPC waiver was tried first and
# reward-farmed: agents tailgated at NPC pace collecting the free centering
# term for ~4000-step episodes - traffic_npc_r4, round 3 late session.)
PASS_LATERAL_MIN = 1.2
# Proximity shaping: penalty ramps from 0 at PROXIMITY_RANGE meters of
# box-clearance to PROXIMITY_SCALE at contact with the collision box.
PROXIMITY_RANGE = 6.0
PROXIMITY_SCALE = 1.5


@register("reward_traffic_add")
def reward_traffic_add(state: EnvState, params: EnvParams) -> Array:
    """Additive reward with traffic-aware shaping (no reference analog - the
    reference never trains against traffic; its collision sensor is
    HUD-only, reference: carla_lap_env.py:453-459).

    speed + centering' + angle - proximity + pass_bonus * overtakes, where

    - centering' waives the centering term only while actually PASSING: some
      live NPC within OVERTAKE_WINDOW along-track AND the ego laterally
      offset from it by > PASS_LATERAL_MIN. Following in-lane earns
      centering normally (see PASS_LATERAL_MIN for why);
    - proximity penalizes closing on an NPC's collision box: with d the
      Euclidean clearance OUTSIDE the box (axis-wise slack in the same
      Frenet frame as the collision test, lap_env.step),
      penalty = PROXIMITY_SCALE * max(0, 1 - d / PROXIMITY_RANGE).
      At box contact (d=0, one step from termination) the penalty equals
      -1.5: a smooth approach gradient toward keeping a passing margin;
    - each COMPLETED overtake (an NPC's gap sign-flips ahead -> behind,
      detected in lap_env.step) pays RewardParams.pass_bonus once - sized
      to decisively outearn staying parked behind an NPC at its pace;
    - the whole positive sum is scaled by RewardParams.blocked_scale while
      an active NPC sits ahead IN-LANE within block_range meters (round-5
      anti-pacing gate; see the RewardParams.blocked_scale comment for the
      round-4 measurements motivating it). The proximity penalty and the
      pass bonus are NOT scaled: safety pressure and the passing payoff
      survive the gate at full strength.
    """
    from carla_ppo_tpu.envs.observations import npc_gaps

    rp = params.reward
    ds, dlat, active = npc_gaps(state, params)

    passing = jnp.any(
        active
        & (jnp.abs(ds) < OVERTAKE_WINDOW)
        & (jnp.abs(dlat) > PASS_LATERAL_MIN)
    )
    centering = jnp.where(passing, 1.0, _centering_factor(state, rp))

    blocked = jnp.any(
        active
        & (ds > 0.0)
        & (ds < rp.block_range)
        & (jnp.abs(dlat) < PASS_LATERAL_MIN)
    )
    gate = jnp.where(blocked, rp.blocked_scale, 1.0)

    slack_s = jnp.maximum(jnp.abs(ds) - params.npc_collision_s, 0.0)
    slack_l = jnp.maximum(jnp.abs(dlat) - params.npc_collision_lat, 0.0)
    clearance = jnp.sqrt(slack_s**2 + slack_l**2)
    danger = jnp.max(
        jnp.where(
            active, jnp.maximum(1.0 - clearance / PROXIMITY_RANGE, 0.0), 0.0
        )
    )

    return (
        gate
        * (
            _speed_reward(3.6 * state.vehicle.speed, rp)
            + centering
            + _angle_factor(state, rp)
        )
        - PROXIMITY_SCALE * danger
        + rp.pass_bonus * state.npc_just_passed
    )


def step_reward(
    state: EnvState, params: EnvParams, extra_terminal: Array, extra_reason: Array
) -> tuple[Array, Array, Array, Array]:
    """The `create_reward_fn` wrapper as a pure function.

    Args:
      state: env state with fresh step-derived fields; `state.low_speed_timer`
        is the timer value *before* this step and `state.terminal` any
        already-latched terminal (e.g. 3 laps done).
      extra_terminal / extra_reason: terminal conditions detected by the env
        step itself (laps done, max distance, collision...), merged with the
        reward layer's own causes at the reference's priority order.

    Returns:
      (reward, terminal, reason, new_low_speed_timer)
    """
    rp = params.reward
    speed = state.vehicle.speed

    # Timer accrues sim time each step (reference: reward_functions.py:26
    # adds 1/fps per call).
    timer = state.low_speed_timer + params.dt

    stopped = jnp.logical_and(timer > rp.low_speed_timeout, speed < rp.low_speed_threshold)
    off_track = state.distance_from_center > rp.max_distance
    too_fast = jnp.logical_and(
        rp.max_speed_terminate > 0.0, 3.6 * speed > rp.max_speed_terminate
    )

    terminal = stopped | off_track | too_fast | extra_terminal

    # Reason priority: env-level causes first (they were latched before the
    # reward fn ran in the reference too), then stopped/off-track/too-fast in
    # source order (reference: reward_functions.py:24-40, later checks win
    # there; we keep first-cause-wins for stable metrics).
    reason = jnp.where(
        extra_terminal,
        extra_reason,
        jnp.where(
            stopped,
            jnp.int32(TerminationReason.VEHICLE_STOPPED),
            jnp.where(
                off_track,
                jnp.int32(TerminationReason.OFF_TRACK),
                jnp.where(
                    too_fast,
                    jnp.int32(TerminationReason.TOO_FAST),
                    jnp.int32(TerminationReason.RUNNING),
                ),
            ),
        ),
    )

    base = reward_functions[params.reward_fn](state, params)
    # Non-terminal: shaped reward. Terminal: flat penalty and reset the timer
    # (reference: reward_functions.py:43-48).
    reward = jnp.where(terminal, rp.terminal_penalty, base)
    timer = jnp.where(terminal, 0.0, timer)
    return reward, terminal, reason, timer

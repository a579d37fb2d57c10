"""The lap-driving environment as a pure JAX function suite.

TPU-native re-design of reference: CarlaEnv/carla_lap_env.py. The reference
talks to an external CARLA server over TCP at 30 FPS with one env instance;
here `step` is a pure function of (EnvState, action, EnvParams) that vmaps
over thousands of envs and fuses into the PPO rollout scan.

Semantics parity map (reference file:line -> here):
- action smoothing                carla_lap_env.py:332-333   -> step()
- waypoint advance dot-walk       carla_lap_env.py:360-371   -> _advance_waypoint()
- distance from lane center       carla_lap_env.py:376-378   -> _center_distance()
- distance/speed/deviation accum  carla_lap_env.py:384-389   -> step()
- lap counting, 3-lap terminal    carla_lap_env.py:392-395   -> step()
- 50-wp respawn checkpoint        carla_lap_env.py:398-400   -> step()
- reward + termination plugin     reward_functions.py:21-55  -> rewards.step_reward()
- training reset to checkpoint    carla_lap_env.py:206-218   -> reset()
- reset returns first observation carla_lap_env.py:255       -> reset() computes
  derived fields directly (no 2 s physics settle needed: spawn is exact)

Auto-reset: under vmap there is no Python episode loop, so `autoreset_step`
re-spawns an env within the step that terminates it (reset-within-step):
done/reward/metrics describe the finished episode while StepOutput.obs is the
new episode's first observation, and the persistent checkpoint index carries
across the reset like the reference's env object does.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array

from carla_ppo_tpu.envs import geometry, rewards
from carla_ppo_tpu.envs.dynamics import vehicle_step
from carla_ppo_tpu.envs.observations import encode_state_fns, wp_gather
from carla_ppo_tpu.envs.types import (
    EnvParams,
    EnvState,
    TerminationReason,
    VehicleState,
    default_env_state,
)


@struct.dataclass
class StepOutput:
    obs: Array
    reward: Array
    done: Array
    # Snapshot of episodic metrics at this step (read them where done=True to
    # get end-of-episode values, like the reference logs after each episode,
    # train.py:210-215).
    total_reward: Array
    distance_traveled: Array
    center_lane_deviation: Array
    speed_accum: Array
    laps_completed: Array
    step_count: Array
    termination_reason: Array
    npc_overtakes: Array  # cumulative completed overtakes this episode


def reset(
    params: EnvParams,
    rng: Array,
    is_training: Array | bool = True,
    checkpoint_idx: Array | int = 0,
) -> EnvState:
    """Spawn the vehicle on the track.

    Training: at the persistent respawn checkpoint ("fail faster",
    reference: carla_lap_env.py:206-209 and README.md:219-237).
    Eval: at waypoint 0 (reference: carla_lap_env.py:210-213).
    """
    track = params.track
    is_training = jnp.asarray(is_training, jnp.bool_)
    checkpoint_idx = jnp.asarray(checkpoint_idx, jnp.int32)

    start_idx = jnp.where(
        is_training, jnp.mod(checkpoint_idx, track.length), jnp.int32(0)
    )
    pos = jnp.take(track.pos, start_idx, axis=0)
    fwd = jnp.take(track.fwd, start_idx, axis=0)
    yaw = jnp.arctan2(fwd[1], fwd[0])

    rng, k_pos, k_yaw, k_npc_s, k_npc_v = jax.random.split(rng, 5)
    lateral = jnp.stack([-fwd[1], fwd[0]])
    pos = pos + lateral * params.spawn_pos_noise * jax.random.normal(k_pos)
    yaw = yaw + params.spawn_yaw_noise * jax.random.normal(k_yaw)

    state = default_env_state(track, rng)

    # NPC traffic spawns (inert unless params.num_npcs > 0): uniformly around
    # the track, at least 25 m ahead of the ego spawn, at randomized cruise
    # speeds. The reference world has traffic CARLA places; here it is
    # explicit per-env state ticked inside step().
    M = state.npc_s.shape[0]
    length_f = track.length.astype(jnp.float32)
    gap = jax.random.uniform(
        k_npc_s, (M,), minval=25.0, maxval=jnp.maximum(length_f - 25.0, 26.0)
    )
    npc_s = start_idx.astype(jnp.float32) + gap
    npc_speed = jax.random.uniform(
        k_npc_v, (M,),
        minval=params.npc_min_speed, maxval=params.npc_max_speed,
    )

    state = state.replace(
        vehicle=VehicleState.create(pos, yaw),
        waypoint_idx=start_idx,
        start_waypoint_idx=start_idx,
        checkpoint_idx=checkpoint_idx,
        is_training=is_training,
        prev_pos=pos,
        npc_s=npc_s,
        npc_speed=npc_speed,
    )
    return _with_derived(state, params)


def _with_derived(state: EnvState, params: EnvParams) -> EnvState:
    """Fill the step-derived fields the reward/obs layers read."""
    d, angle = _center_distance_and_angle(state, params)
    return state.replace(distance_from_center=d, angle_to_road=angle)


def _advance_waypoint(state: EnvState, params: EnvParams) -> Array:
    """How many waypoints did we pass this step?

    The reference walks forward while dot(wp_fwd, pos - wp_pos) > 0
    (reference: carla_lap_env.py:360-371). Vectorized over a static lookahead
    window: advance = number of *leading* positive dots (prefix-AND), which is
    exactly the loop's exit condition.
    """
    track = params.track
    K = params.waypoint_lookahead
    offsets = jnp.arange(1, K + 1, dtype=jnp.int32)
    idxs = state.waypoint_idx + offsets
    wp_pos = wp_gather(track.pos, idxs, track.length, track.is_loop)  # [K,2]
    wp_fwd = wp_gather(track.fwd, idxs, track.length, track.is_loop)  # [K,2]
    rel = state.vehicle.pos[None, :] - wp_pos
    dots = jnp.sum(wp_fwd * rel, axis=-1)
    passed = dots > 0.0
    advance = jnp.sum(jnp.cumprod(passed.astype(jnp.int32)))
    new_idx = state.waypoint_idx + advance
    # Open routes never advance past the final waypoint.
    return jnp.where(
        track.is_loop, new_idx, jnp.minimum(new_idx, track.length - 1)
    ).astype(jnp.int32)


def _center_distance_and_angle(
    state: EnvState, params: EnvParams
) -> Tuple[Array, Array]:
    """Lane-center distance + signed velocity-vs-road angle.

    Reference: carla_lap_env.py:374-378 (distance to the current->next
    waypoint line) and reward_functions.py:83-86 (angle between the velocity
    vector and the current waypoint's forward vector).
    """
    track = params.track
    cur_pos = wp_gather(track.pos, state.waypoint_idx, track.length, track.is_loop)
    nxt_pos = wp_gather(
        track.pos, state.waypoint_idx + 1, track.length, track.is_loop
    )
    cur_fwd = wp_gather(track.fwd, state.waypoint_idx, track.length, track.is_loop)

    d = geometry.distance_to_line(cur_pos, nxt_pos, state.vehicle.pos)

    vel = state.vehicle.velocity
    # At standstill the velocity direction is undefined; use the body forward
    # vector (the reference feeds atan2(0,0)=0 - strictly noisier).
    ref_vec = jnp.where(state.vehicle.speed > 1e-3, vel, state.vehicle.forward)
    angle = geometry.angle_diff(ref_vec, cur_fwd)
    return d, angle


@partial(jax.jit, static_argnames=("obs_fn",))
def step(
    state: EnvState,
    action: Array,
    params: EnvParams,
    obs_fn: str = "vector",
) -> Tuple[EnvState, StepOutput]:
    """One synchronous env tick. `action` = [steer in [-1,1], throttle in [0,1]].

    Mirrors reference: carla_lap_env.py:310-413 end to end, minus the RPC/
    busy-wait plumbing that doesn't exist on-device.

    An optional 3rd component is CARLA's VehicleControl.brake in [0,1]
    (reference: wrappers.py:202 carries it; the scripted agents'
    emergency_stop sets it) - the RL action space stays 2-D like the
    reference's Box. Brake is applied unsmoothed: it is the scripted
    agents' safety channel, and the reference smooths only the RL action.
    """
    track = params.track
    action = jnp.asarray(action, jnp.float32)
    act = jnp.stack(
        [jnp.clip(action[0], -1.0, 1.0), jnp.clip(action[1], 0.0, 1.0)]
    )
    brake = (
        jnp.clip(action[2], 0.0, 1.0) if action.shape[0] > 2 else jnp.float32(0.0)
    )

    # Action smoothing (reference: carla_lap_env.py:332-333).
    a = params.action_smoothing
    control = state.control * a + act * (1.0 - a)

    # Physics tick (replaces world.tick + wait_for_tick RPC).
    vehicle = vehicle_step(
        params.vehicle,
        state.vehicle,
        control[0],
        control[1],
        params.dt,
        substeps=params.physics_substeps,
        dynamics_model=params.dynamics_model,
        brake_cmd=brake,
    )

    mid = state.replace(vehicle=vehicle, control=control)

    # Waypoint bookkeeping.
    waypoint_idx = _advance_waypoint(mid, params)
    mid = mid.replace(waypoint_idx=waypoint_idx)
    distance_from_center, angle = _center_distance_and_angle(mid, params)

    # Metric accumulators (reference: carla_lap_env.py:379-389).
    step_dist = jnp.linalg.norm(vehicle.pos - state.prev_pos)
    distance_traveled = state.distance_traveled + step_dist
    center_lane_deviation = state.center_lane_deviation + distance_from_center
    speed_accum = state.speed_accum + vehicle.speed

    # Lap counting (reference: carla_lap_env.py:392-395).
    laps_completed = (
        (waypoint_idx - state.start_waypoint_idx).astype(jnp.float32)
        / track.length.astype(jnp.float32)
    )
    laps_done = laps_completed >= params.max_laps

    # Respawn checkpoint (reference: carla_lap_env.py:398-400).
    checkpoint_idx = jnp.where(
        state.is_training,
        (waypoint_idx // params.checkpoint_frequency) * params.checkpoint_frequency,
        state.checkpoint_idx,
    )

    # Lane invasion / collision events. The road's per-waypoint widths bound
    # the paved area - asymmetric on dual-lane roads (the other lane extends
    # it on one side); beyond the edge + shoulder we call it a collision with
    # the roadside. (The reference only HUD-notifies these,
    # carla_lap_env.py:453-459; termination is opt-in here.)
    cur_wp = wp_gather(track.pos, waypoint_idx, track.length, track.is_loop)
    nxt_wp = wp_gather(track.pos, waypoint_idx + 1, track.length, track.is_loop)
    ego_lat = geometry.signed_distance_to_line(cur_wp, nxt_wp, vehicle.pos)
    lw = wp_gather(track.left_width, waypoint_idx, track.length, track.is_loop)
    rw = wp_gather(track.right_width, waypoint_idx, track.length, track.is_loop)
    lane_invasion = jnp.logical_or(ego_lat > lw, ego_lat < -rw)
    collision = jnp.logical_or(ego_lat > lw + 1.5, ego_lat < -(rw + 1.5))

    # NPC traffic tick + REAL vehicle-vehicle collision (the reference's
    # collision sensor fires on actual actors, CarlaEnv/wrappers.py:85-115).
    # Overlap test in road coordinates: |delta s| and |delta lateral| within
    # a car-sized box against any active NPC.
    #
    # Reactive dynamics (round 4; reference analog: live CARLA autopilot
    # traffic, wrappers.py:186-217). NPCs are NOT rails: each one
    # (a) car-follows - brakes toward zero as its in-lane gap to the nearest
    #     vehicle ahead (another NPC or the EGO) closes from
    #     npc_follow_dist to npc_follow_min, so traffic jams behind a slow
    #     ego instead of driving through it;
    # (b) jitters its speed (sinusoidal, per-slot phase - +-npc_speed_jitter
    #     multiplicative); and
    # (c) wanders laterally inside its lane (bounded sinusoidal-velocity
    #     walk, clamped to the road width at its waypoint minus a half-car
    #     margin).
    # Everything is a pure function of existing state (step_count drives the
    # phases), so EnvState's pytree is unchanged and old checkpoints load.
    # num_npcs is STATIC (types.py): the whole tick below exists in the
    # compiled program only for traffic configs - zero-NPC pipelines carry
    # none of it (measured 38% of vector throughput when it was traced).
    M = state.npc_s.shape[0]
    active_npc = jnp.arange(M) < params.num_npcs
    length_f = track.length.astype(jnp.float32)
    ego_s = waypoint_idx.astype(jnp.float32)

    def wrap_gap(gap):
        return jnp.where(
            track.is_loop,
            jnp.mod(gap + length_f / 2.0, length_f) - length_f / 2.0,
            gap,
        )

    slot_f = jnp.arange(M, dtype=jnp.float32)
    t_step = state.step_count.astype(jnp.float32)
    if params.npc_reactive and params.num_npcs > 0:
        # (a) car-following over [M, M+1] gaps (all NPCs + the ego).
        others_s = jnp.concatenate([state.npc_s, ego_s[None]])
        others_lat = jnp.concatenate([state.npc_lateral, ego_lat[None]])
        others_active = jnp.concatenate(
            [active_npc, jnp.ones((1,), bool)]
        )
        gaps = wrap_gap(others_s[None, :] - state.npc_s[:, None])  # [M, M+1]
        in_lane = (
            jnp.abs(others_lat[None, :] - state.npc_lateral[:, None])
            < params.npc_follow_lat
        )
        ahead = (gaps > 0.1) & in_lane & others_active[None, :]
        gap_ahead = jnp.min(
            jnp.where(ahead, gaps, jnp.inf), axis=1
        )  # [M]
        follow = jnp.clip(
            (gap_ahead - params.npc_follow_min)
            / jnp.maximum(
                params.npc_follow_dist - params.npc_follow_min, 1e-3
            ),
            0.0,
            1.0,
        )
        # (b) speed jitter: per-slot phase via the golden angle.
        jitter = 1.0 + params.npc_speed_jitter * jnp.sin(
            0.23 * t_step + 2.39996 * slot_f
        )
        npc_speed_eff = state.npc_speed * jitter * follow
        # (c) lateral wander, clamped to the road at the NPC's waypoint.
        npc_wp = jnp.where(
            track.is_loop,
            jnp.mod(state.npc_s, length_f),
            jnp.clip(state.npc_s, 0.0, length_f - 1.0),
        ).astype(jnp.int32)
        npc_lw = wp_gather(track.left_width, npc_wp, track.length, track.is_loop)
        npc_rw = wp_gather(track.right_width, npc_wp, track.length, track.is_loop)
        wander = params.npc_wander_rate * jnp.sin(
            0.11 * t_step + 2.39996 * slot_f + 1.0
        )
        # Lane-keeping spring toward npc_keep_lat (keep_gain=0 = round-4
        # free walk; see EnvParams.npc_keep_lat for why traffic configs
        # want a keep-right home).
        keep = params.npc_keep_gain * (params.npc_keep_lat - state.npc_lateral)
        npc_lateral = jnp.clip(
            state.npc_lateral + (wander + keep) * params.dt,
            -(npc_rw - 0.8),
            npc_lw - 0.8,
        )
    else:
        npc_speed_eff = state.npc_speed
        npc_lateral = state.npc_lateral
    npc_s = state.npc_s + npc_speed_eff * params.dt

    ds = wrap_gap(npc_s - ego_s)
    if params.num_npcs > 0:
        npc_hit = jnp.any(
            active_npc
            & (jnp.abs(ds) < params.npc_collision_s)
            & (jnp.abs(npc_lateral - ego_lat) < params.npc_collision_lat)
        )
        collision = collision | npc_hit

    # Overtake events: an NPC's gap sign-flips ahead -> behind this step.
    # Two far-boundary wrap artifacts must NOT count: an NPC lapping a
    # slower ego flips +L/2 -> -L/2 (ds_old > 0 and ds <= 0, exactly the
    # pass signature, but with a ~L jump - round-3 late review finding: it paid
    # a phantom pass_bonus once per NPC per relative lap), and the ego
    # lapping an NPC flips -L/2 -> +L/2 (ds_old < 0, never matches). A true
    # pass moves the gap by at most a few meters per tick, so requiring a
    # small step kills both artifacts without touching real passes.
    if params.num_npcs > 0:
        ds_old = wrap_gap(
            state.npc_s - state.waypoint_idx.astype(jnp.float32)
        )
        small_step = jnp.abs(ds_old - ds) < length_f / 4.0
        npc_just_passed = jnp.sum(
            (active_npc & (ds_old > 0.0) & (ds <= 0.0) & small_step).astype(
                jnp.float32
            )
        )
    else:
        npc_just_passed = jnp.float32(0.0)

    step_count = state.step_count + 1
    over_distance = distance_traveled >= params.max_distance_traveled
    over_steps = step_count >= params.max_episode_steps

    env_terminal = laps_done | over_distance | over_steps
    if params.terminate_on_collision:
        env_terminal = env_terminal | collision
    if params.terminate_on_lane_invasion:
        env_terminal = env_terminal | lane_invasion
    env_reason = jnp.where(
        laps_done,
        jnp.int32(TerminationReason.LAPS_DONE),
        jnp.where(
            over_distance,
            jnp.int32(TerminationReason.MAX_DISTANCE),
            jnp.where(
                over_steps,
                jnp.int32(TerminationReason.TIME_LIMIT),
                jnp.where(
                    collision & params.terminate_on_collision,
                    jnp.int32(TerminationReason.COLLISION),
                    jnp.int32(TerminationReason.LANE_INVASION),
                ),
            ),
        ),
    )

    # npc_s/npc_just_passed ride along so reward shaping
    # (rewards.reward_traffic_add) sees the same post-tick NPC geometry and
    # overtake events the collision test above used.
    mid = mid.replace(
        distance_from_center=distance_from_center,
        angle_to_road=angle,
        collision=collision,
        lane_invasion=lane_invasion,
        npc_s=npc_s,
        npc_lateral=npc_lateral,
        npc_just_passed=npc_just_passed,
        npc_overtakes=state.npc_overtakes + npc_just_passed,
    )

    reward, terminal, reason, low_speed_timer = rewards.step_reward(
        mid, params, env_terminal, env_reason
    )

    total_reward = state.total_reward + reward

    next_state = mid.replace(
        checkpoint_idx=checkpoint_idx,
        low_speed_timer=low_speed_timer,
        step_count=step_count,
        time=state.time + params.dt,
        terminal=terminal,
        truncated=over_steps & ~laps_done,
        termination_reason=reason,
        last_reward=reward,
        prev_pos=vehicle.pos,
        total_reward=total_reward,
        distance_traveled=distance_traveled,
        center_lane_deviation=center_lane_deviation,
        speed_accum=speed_accum,
        laps_completed=laps_completed,
    )

    obs = encode_state_fns[obs_fn](next_state, params)
    out = StepOutput(
        obs=obs,
        reward=reward,
        done=terminal,
        total_reward=total_reward,
        distance_traveled=distance_traveled,
        center_lane_deviation=center_lane_deviation,
        speed_accum=speed_accum,
        laps_completed=laps_completed,
        step_count=step_count,
        termination_reason=reason,
        npc_overtakes=next_state.npc_overtakes,
    )
    return next_state, out


def autoreset_step(
    state: EnvState,
    action: Array,
    params: EnvParams,
    obs_fn: str = "vector",
) -> Tuple[EnvState, StepOutput]:
    """Step with reset-within-step auto-reset (gymnax semantics).

    The action is applied to the incoming live state. If that step ends the
    episode, the env is immediately re-spawned (keeping the persistent
    checkpoint index and training flag, like the reference's env object does
    between episodes) and the returned `StepOutput.obs` is the NEW episode's
    first observation, while done/reward/metric snapshots still describe the
    finished episode. The next policy action therefore acts on the state it
    observed - a rollout never pairs an old episode's terminal observation
    with the new episode's transition (the reference breaks its Python loop
    at terminal and calls reset() explicitly; this is the branchless analog).
    """
    next_state, out = step(state, action, params, obs_fn=obs_fn)
    rng, reset_rng = jax.random.split(next_state.rng)
    fresh = reset(
        params,
        reset_rng,
        is_training=state.is_training,
        checkpoint_idx=next_state.checkpoint_idx,
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
    return encode_state_fns[obs_fn](state, params)

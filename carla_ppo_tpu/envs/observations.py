"""State-encoding plugin layer (obs builders).

Parity with the reference's `encode_state_fn` injection: the env returns
whatever the configured encoder produces, instead of raw pixels
(reference: vae_common.py:33-62, injected at carla_lap_env.py:141).

Encoders here are pure functions of (EnvState, EnvParams) so they trace into
the jitted step. This registry holds exactly the encoders with that
signature - today the "vector" family (ground-truth road-relative features,
no VAE/camera needed). The other two observation families of the capability
ladder need extra inputs and therefore live elsewhere:

- latent (frozen-VAE z ++ [steer, throttle, speed], the reference's 64+3
  observation, vae_common.py:45-62): built by `training/ppo.make_obs_fn`
  from a `LatentObs` spec + VAE variables; `models/vae_common.py` holds the
  encoder closure factory.
- pixels (raw on-device seg frames): rendered by `ops/rasterizer` inside
  `training/pixels.pixel_rollout`, which feeds frames straight to the conv
  policy without a (state, params) -> vector encoding at all.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp
from jax import Array

from carla_ppo_tpu.envs import geometry
from carla_ppo_tpu.envs.types import EnvParams, EnvState

# Lookahead offsets (waypoints ~= meters) for road-preview features.
PREVIEW_OFFSETS = (2, 4, 8, 16, 32, 64)


def wp_gather(track_arr: Array, idx: Array, length: Array, is_loop: Array) -> Array:
    """Gather track data at a monotonic waypoint index, wrapping on loops and
    clamping on open routes (reference mods by len(route): carla_lap_env.py:364)."""
    i = jnp.where(is_loop, jnp.mod(idx, length), jnp.minimum(idx, length - 1))
    return jnp.take(track_arr, i, axis=0)


def vector_obs(state: EnvState, params: EnvParams) -> Array:
    """Ground-truth road-relative observation, [obs_dim] float32.

    Features (all roughly unit-scale):
      0: signed lateral offset / max_distance
      1: heading error (velocity vs road) / angle_factor_max
      2: speed (km/h) / target_speed
      3: current steer control
      4: current throttle control
      5: steer_angle / max_steer (actuator state)
      6..: per-preview-offset (bearing to waypoint in vehicle frame,
           relative road heading at that waypoint), each /pi
    """
    track = params.track
    veh = state.vehicle
    rp = params.reward

    cur = wp_gather(track.pos, state.waypoint_idx, track.length, track.is_loop)
    nxt = wp_gather(track.pos, state.waypoint_idx + 1, track.length, track.is_loop)
    signed_offset = geometry.signed_distance_to_line(cur, nxt, veh.pos)

    feats = [
        signed_offset / rp.max_distance,
        state.angle_to_road / rp.angle_factor_max,
        3.6 * veh.speed / rp.target_speed,
        state.control[0],
        state.control[1],
        veh.steer_angle / params.vehicle.max_steer,
    ]

    fwd = veh.forward
    for k in PREVIEW_OFFSETS:
        wp_pos = wp_gather(
            track.pos, state.waypoint_idx + k, track.length, track.is_loop
        )
        wp_fwd = wp_gather(
            track.fwd, state.waypoint_idx + k, track.length, track.is_loop
        )
        bearing = geometry.angle_diff(fwd, wp_pos - veh.pos)
        rel_heading = geometry.angle_diff(fwd, wp_fwd)
        feats.append(bearing / jnp.pi)
        feats.append(rel_heading / jnp.pi)

    return jnp.stack(feats).astype(jnp.float32)


def vector_obs_dim() -> int:
    return 6 + 2 * len(PREVIEW_OFFSETS)


# Radar range for the NPC-traffic features (meters of along-track gap).
NPC_RADAR_RANGE = 50.0


def npc_gaps(state: EnvState, params: EnvParams) -> tuple[Array, Array, Array]:
    """Frenet-frame gaps ego -> each NPC slot: (ds, dlat, active).

    `ds` is the along-track gap in waypoint units (~m, positive = NPC ahead),
    wrapped to the nearest representative on loops - the same math as the
    collision test in lap_env.step; `dlat` the signed lateral offset of the
    NPC relative to the ego; `active` masks the live slots. Shared by the
    radar observation and the traffic-aware reward shaping so all three
    layers (collision, obs, reward) agree on the geometry.
    """
    track = params.track
    cur = wp_gather(track.pos, state.waypoint_idx, track.length, track.is_loop)
    nxt = wp_gather(track.pos, state.waypoint_idx + 1, track.length, track.is_loop)
    ego_lat = geometry.signed_distance_to_line(cur, nxt, state.vehicle.pos)

    length_f = track.length.astype(jnp.float32)
    ego_s = state.waypoint_idx.astype(jnp.float32)
    active = jnp.arange(state.npc_s.shape[0]) < params.num_npcs
    ds = state.npc_s - ego_s
    ds = jnp.where(
        track.is_loop,
        jnp.mod(ds + length_f / 2.0, length_f) - length_f / 2.0,
        ds,
    )
    dlat = state.npc_lateral - ego_lat
    return ds, dlat, active


def vector_npc_obs(state: EnvState, params: EnvParams) -> Array:
    """`vector_obs` ++ radar-style traffic features, [obs_dim + 6] float32.

    The ground-truth vector observation is blind to NPC traffic (NPCs only
    appear in the rendered camera), so an agent trained with collision
    termination against traffic needs these. They model a forward/rear radar
    - the sensor a real AV stack pairs with its camera; the reference's
    CARLA world exposes the same information through its actor list
    (reference: CarlaEnv/agents/navigation/agent.py:129-193
    _is_vehicle_hazard, which scans actor positions/headings directly).

    Extra features (unit-scale):
      +0: nearest-ahead NPC gap / NPC_RADAR_RANGE       (1.0 = none in range)
      +1: its lateral offset rel. ego / max_distance    (0 when none)
      +2: its closing speed (ego - npc) / target_speed  (0 when none)
      +3..5: same triple for the nearest NPC behind.

    Gaps are along-track (Frenet s), matching the collision test in
    lap_env.step; on loops the gap wraps around the circuit.
    """
    base = vector_obs(state, params)
    rp = params.reward

    ds, dlat, active = npc_gaps(state, params)

    def radar(gap: Array) -> list:
        """gap >= 0 along one direction; inf where inactive/other side."""
        nearest = jnp.min(jnp.where(active & (gap >= 0.0), gap, jnp.inf))
        idx = jnp.argmin(jnp.where(active & (gap >= 0.0), gap, jnp.inf))
        in_range = nearest < NPC_RADAR_RANGE
        rel_lat = dlat[idx] / rp.max_distance
        closing = (
            3.6 * (state.vehicle.speed - state.npc_speed[idx]) / rp.target_speed
        )
        return [
            jnp.where(in_range, nearest / NPC_RADAR_RANGE, 1.0),
            jnp.where(in_range, rel_lat, 0.0),
            jnp.where(in_range, closing, 0.0),
        ]

    feats = radar(ds) + radar(-ds)
    return jnp.concatenate([base, jnp.stack(feats).astype(jnp.float32)])


def vector_npc_obs_dim() -> int:
    return vector_obs_dim() + 6


def obs_dim_for(obs_fn: str) -> int:
    return {"vector": vector_obs_dim(), "vector_npc": vector_npc_obs_dim()}[
        obs_fn
    ]


def measurements(state: EnvState) -> Array:
    """[steer, throttle, speed] appended to VAE latents
    (reference: vae_common.py:52-54; speed in m/s as the reference's
    get_speed returns m/s)."""
    return jnp.stack(
        [state.control[0], state.control[1], state.vehicle.speed]
    ).astype(jnp.float32)


ObsFn = Callable[[EnvState, EnvParams], Array]

encode_state_fns: Dict[str, ObsFn] = {
    "vector": vector_obs,
    "vector_npc": vector_npc_obs,
}

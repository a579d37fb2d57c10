"""Traffic lights: junction-entry signals with a shared timed cycle.

Parity with reference: CARLA worlds contain traffic-light actors cycling
Green -> Yellow -> Red, and the scripted agents brake for them -
`Agent._is_light_red` finds the light affecting the ego and reports a hazard
when its state is Red (reference: CarlaEnv/agents/navigation/agent.py:61-127;
RoamingAgent/BasicAgent then `emergency_stop`, roaming_agent.py:49-63,
basic_agent.py:96-118). The reference's RL path never gates on a light (its
training routes are lap/rural roads), and neither does ours - lights are a
scripted-agent hazard + scene dressing, exactly the reference split.

TPU-native design: a light is (waypoint index, phase offset) in EnvParams'
device-resident table; its state is a PURE FUNCTION of episode time
(`step_count * dt`), so the whole subsystem is branchless modular arithmetic
- no light actors, no state to carry, vmap/scan-safe by construction. The
visual comes free: `bake_light_props` writes a TRAFFICSIGNS pole into the
track's roadside prop table at each light, rendered by the existing
billboard pass.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array

from carla_ppo_tpu.envs.types import (
    PROP_STRIDE,
    EnvParams,
    EnvState,
    RoadOption,
    SegClass,
    TrackData,
)

GREEN, YELLOW, RED = 0, 1, 2

# How far before the junction the signal pole stands, and how close the ego
# must be for a red light to gate it (the reference uses its proximity
# threshold of 10 m, agent.py:36).
SETBACK_WP = 4
PROXIMITY_M = 10.0


def light_states(params: EnvParams, t_seconds: Array) -> Array:
    """[L] int32 state per light (GREEN/YELLOW/RED) at episode time t.

    One shared period; per-light phase offsets stagger junctions. The cycle
    is green for `light_green_frac`, yellow for `light_yellow_frac`, red for
    the rest - CARLA's fixed-timer light group semantics."""
    u = jnp.mod(t_seconds + params.light_phase, params.light_period)
    u = u / jnp.maximum(params.light_period, 1e-6)
    return jnp.where(
        u < params.light_green_frac,
        GREEN,
        jnp.where(u < params.light_green_frac + params.light_yellow_frac, YELLOW, RED),
    ).astype(jnp.int32)


def is_red_light_ahead(
    env_state: EnvState,
    params: EnvParams,
    proximity: float = PROXIMITY_M,
) -> Array:
    """True when a RED light stands within `proximity` meters ahead of the
    ego on its route (reference: agent.py:61-127 _is_light_red - the agent
    only brakes for Red, driving through Yellow). Empty light table => False.
    """
    track = params.track
    length_f = track.length.astype(jnp.float32)
    ds = (params.light_wp - env_state.waypoint_idx).astype(jnp.float32)
    ds = jnp.where(
        track.is_loop,
        jnp.mod(ds + length_f / 2.0, length_f) - length_f / 2.0,
        ds,
    )  # waypoints are 1 m apart -> ds is meters along the route
    t = env_state.step_count.astype(jnp.float32) * params.dt
    red = light_states(params, t) == RED
    gating = jnp.logical_and(ds >= 0.0, ds < proximity)
    return jnp.any(jnp.logical_and(red, gating))


def place_traffic_lights(
    track: TrackData,
    max_lights: int = 8,
    min_spacing_wp: int = 60,
    period_s: float = 16.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: choose light waypoints at junction entries.

    A junction entry is a LANEFOLLOW -> turn transition in the baked
    maneuver tags (where the reference's map puts its junction lights);
    lights stand SETBACK_WP before the turn, at least `min_spacing_wp`
    apart, phases staggered so the network never turns all-red at once.
    Returns (light_wp [L] int32, light_phase [L] float32) numpy arrays.
    """
    man = np.asarray(track.maneuver)[: int(track.length)]
    following = man == int(RoadOption.LANEFOLLOW)
    turning = np.isin(
        man, (int(RoadOption.LEFT), int(RoadOption.RIGHT), int(RoadOption.STRAIGHT))
    )
    # Entry = waypoint i where i is LANEFOLLOW and i+1 begins a turn.
    entries = np.nonzero(following[:-1] & turning[1:])[0]

    rng = np.random.default_rng(seed ^ 0x716575)
    chosen: list[int] = []
    for e in entries:
        wp = max(int(e) - SETBACK_WP, 0)
        if all(abs(wp - c) >= min_spacing_wp for c in chosen):
            chosen.append(wp)
        if len(chosen) >= max_lights:
            break
    light_wp = np.asarray(chosen, np.int32)
    # Stagger phases across the cycle deterministically per seed.
    light_phase = rng.uniform(0.0, period_s, size=light_wp.size).astype(np.float32)
    return light_wp, light_phase


def bake_light_props(track: TrackData, light_wp: np.ndarray) -> TrackData:
    """Write a TRAFFICSIGNS signal pole into the roadside prop table at each
    light (right-hand side, CARLA-style), rendered by the existing billboard
    pass - the seg camera shows lights as TRAFFICSIGNS regardless of state,
    matching CARLA's semantic segmentation."""
    cls = np.asarray(track.prop_class).copy()
    lat = np.asarray(track.prop_lateral).copy()
    hgt = np.asarray(track.prop_height).copy()
    hwd = np.asarray(track.prop_halfwidth).copy()
    right_w = np.asarray(track.right_width)
    for wp in np.asarray(light_wp):
        slot = min(int(wp) // PROP_STRIDE, track.prop_slots - 1)
        cls[slot, 1] = int(SegClass.TRAFFICSIGNS)
        lat[slot, 1] = -(right_w[int(wp)] + 0.6)
        hgt[slot, 1] = 4.5
        hwd[slot, 1] = 0.25
    return track.replace(
        prop_class=jnp.asarray(cls),
        prop_lateral=jnp.asarray(lat),
        prop_height=jnp.asarray(hgt),
        prop_halfwidth=jnp.asarray(hwd),
    )


def add_traffic_lights(
    params: EnvParams,
    max_lights: int = 8,
    min_spacing_wp: int = 60,
    period_s: float = 16.0,
    seed: int = 0,
) -> EnvParams:
    """Place junction lights on `params.track`, bake their signal-pole props,
    and fill the light table. No junctions => params unchanged (empty table).
    """
    light_wp, light_phase = place_traffic_lights(
        params.track, max_lights, min_spacing_wp, period_s, seed
    )
    if light_wp.size == 0:
        return params
    return params.replace(
        track=bake_light_props(params.track, light_wp),
        light_wp=jnp.asarray(light_wp),
        light_phase=jnp.asarray(light_phase),
        light_period=jnp.float32(period_s),
    )

"""Traffic-light tests: cycle math, red-light gating, scripted-agent stop,
prop baking, and the no-lights default being a strict no-op
(reference behavior: agents/navigation/agent.py:61-127 _is_light_red)."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_ppo_tpu.envs import agents, lap_env, traffic_lights
from carla_ppo_tpu.envs import track as track_mod
from carla_ppo_tpu.envs.types import EnvParams, SegClass


def _params_with_light(wp: int, phase: float = 0.0, **kw) -> EnvParams:
    t = track_mod.make_lap_track(seed=0)
    return EnvParams(
        track=t,
        light_wp=jnp.asarray([wp], jnp.int32),
        light_phase=jnp.asarray([phase], jnp.float32),
        **kw,
    )


def test_light_cycle_states():
    """period 16 s, green 0.5, yellow 0.125 -> green [0,8), yellow [8,10),
    red [10,16)."""
    p = _params_with_light(100)
    states = [
        int(traffic_lights.light_states(p, jnp.float32(t))[0])
        for t in (0.0, 7.9, 8.1, 9.9, 10.1, 15.9, 16.1)
    ]
    G, Y, R = traffic_lights.GREEN, traffic_lights.YELLOW, traffic_lights.RED
    assert states == [G, G, Y, Y, R, R, G]


def test_phase_staggers_lights():
    t = track_mod.make_lap_track(seed=0)
    p = EnvParams(
        track=t,
        light_wp=jnp.asarray([50, 200], jnp.int32),
        light_phase=jnp.asarray([0.0, 10.0], jnp.float32),
    )
    s = traffic_lights.light_states(p, jnp.float32(0.0))
    assert int(s[0]) == traffic_lights.GREEN
    assert int(s[1]) == traffic_lights.RED  # 10 s into the cycle


def test_red_light_gates_only_within_proximity_ahead():
    p = _params_with_light(30, phase=10.0)  # red at t=0
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    # Ego at wp 0: light 30 m ahead -> beyond 10 m proximity, not gating.
    s0 = s.replace(waypoint_idx=jnp.int32(0))
    assert not bool(traffic_lights.is_red_light_ahead(s0, p))
    # Ego at wp 25: 5 m ahead -> gating.
    s1 = s.replace(waypoint_idx=jnp.int32(25))
    assert bool(traffic_lights.is_red_light_ahead(s1, p))
    # Ego past the light: behind, not gating.
    s2 = s.replace(waypoint_idx=jnp.int32(31))
    assert not bool(traffic_lights.is_red_light_ahead(s2, p))
    # Same geometry but green (phase 0): not gating.
    pg = _params_with_light(30, phase=0.0)
    assert not bool(traffic_lights.is_red_light_ahead(s1, pg))


def test_empty_table_is_noop():
    """The default EnvParams has no lights: gating is always False (the
    RL-config path is untouched)."""
    p = EnvParams(track=track_mod.make_lap_track(seed=0))
    assert p.light_wp.shape == (0,)
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    assert not bool(traffic_lights.is_red_light_ahead(s, p))


def test_agent_stops_at_red_and_proceeds_on_green():
    """The roaming agent must brake to a stop before an always-red light,
    then drive through once it turns green (reference: roaming_agent.py:49-63
    emergency_stop on light hazard)."""
    # green_frac 0 + yellow_frac 0 => permanently red.
    p = _params_with_light(
        60,
        phase=0.0,
        light_green_frac=jnp.float32(0.0),
        light_yellow_frac=jnp.float32(0.0),
    )
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    agent = agents.AgentState.create(target_speed_kmh=18.0)

    @jax.jit
    def drive(s, agent, params):
        def body(carry, _):
            s, agent = carry
            a, agent = agents.roaming_agent_step(agent, s, params)
            s, _ = lap_env.step(s, a, params)
            return (s, agent), s.vehicle.vx

        return jax.lax.scan(body, (s, agent), None, length=600)

    (s_red, agent_red), vx = drive(s, agent, p)
    # Stopped (slow drift at most) and never crossed the light.
    assert float(s_red.vehicle.vx) < 0.6
    assert int(s_red.waypoint_idx) < 60
    # All-green light: same drive passes the junction at speed.
    pg = _params_with_light(60, phase=0.0, light_green_frac=jnp.float32(1.0))
    (s_green, _), _ = drive(s, agent, pg)
    assert int(s_green.waypoint_idx) > 65  # past the light at wp 60
    assert float(s_green.vehicle.vx) > 2.0


def test_place_and_bake_lights():
    """add_traffic_lights finds junction entries on the lap circuit, spaces
    them, and bakes TRAFFICSIGNS poles on the right-hand side."""
    p = EnvParams(track=track_mod.make_lap_track(seed=0))
    p2 = traffic_lights.add_traffic_lights(p, max_lights=6, seed=0)
    L = p2.light_wp.shape[0]
    assert 1 <= L <= 6
    wps = np.sort(np.asarray(p2.light_wp))
    assert (np.diff(wps) >= 60).all()
    # Each light has a signal pole prop in its slot, on the right side.
    from carla_ppo_tpu.envs.types import PROP_STRIDE

    cls = np.asarray(p2.track.prop_class)
    for wp in wps:
        assert cls[int(wp) // PROP_STRIDE, 1] == int(SegClass.TRAFFICSIGNS)
    # Phases are staggered within the period.
    assert np.asarray(p2.light_phase).max() <= 16.0


def test_lights_render_in_seg_frame():
    """A light pole directly ahead shows up as TRAFFICSIGNS pixels in the
    semantic camera (billboard pass renders the baked pole)."""
    from carla_ppo_tpu.ops import rasterizer as R

    t = track_mod.make_lap_track(seed=0)
    p = EnvParams(track=t)
    p = p.replace(track=traffic_lights.bake_light_props(t, np.asarray([12])))
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    cam = R.CameraConfig(render_props=True)
    frame = np.asarray(R.render_semantic(s, p, cam))
    assert (frame == int(SegClass.TRAFFICSIGNS)).sum() > 3


def test_gym_api_traffic_lights_knob():
    """CarlaLapEnv(traffic_lights=True) fills the light table."""
    from carla_ppo_tpu.envs.gym_api import CarlaLapEnv

    env = CarlaLapEnv(traffic_lights=True, viewer_res=(320, 180))
    assert env.params.light_wp.shape[0] >= 1
    env.close()

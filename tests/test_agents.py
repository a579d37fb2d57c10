"""PID controller / scripted agent tests: the classical autopilot must
actually drive the lap - a strong end-to-end check of env + control."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import agents, lap_env, route_env, route_planner
from carla_ppo_tpu.envs.controller import PIDParams, PIDState, pid_step
from carla_ppo_tpu.envs.types import EnvParams


def test_pid_step_proportional():
    params = PIDParams.create(2.0, 0.0, 0.0)
    out, state = pid_step(params, PIDState.zero(), jnp.float32(0.5), jnp.float32(0.1))
    assert float(out) == pytest.approx(1.0)


def test_pid_integral_accumulates():
    params = PIDParams.create(0.0, 1.0, 0.0)
    state = PIDState.zero()
    outs = []
    for _ in range(3):
        out, state = pid_step(params, state, jnp.float32(1.0), jnp.float32(0.5))
        outs.append(float(out))
    np.testing.assert_allclose(outs, [0.5, 1.0, 1.5], rtol=1e-5)


def test_pid_derivative():
    params = PIDParams.create(0.0, 0.0, 1.0)
    state = PIDState(integral=jnp.float32(0.0), prev_error=jnp.float32(1.0))
    out, _ = pid_step(params, state, jnp.float32(2.0), jnp.float32(0.5))
    assert float(out) == pytest.approx(2.0)  # (2-1)/0.5 * 1.0


def test_roaming_agent_drives_lap(lap_params):
    """The PID autopilot must cover substantial distance without leaving the
    road or stalling - the de-facto integration test of env + controller."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    agent = agents.AgentState.create(target_speed_kmh=18.0)

    @jax.jit
    def run(s, agent):
        def body(carry, _):
            s, agent = carry
            action, agent = agents.roaming_agent_step(agent, s, lap_params)
            s, out = lap_env.step(s, action, lap_params)
            return (s, agent), (out.done, s.distance_from_center)

        return jax.lax.scan(body, (s, agent), None, length=1200)  # 40 s

    (s, agent), (dones, devs) = run(s, agent)
    assert not bool(dones.any()), "autopilot terminated an episode"
    assert float(s.distance_traveled) > 150.0
    assert float(devs.max()) < 1.6
    avg_kmh = 3.6 * float(s.speed_accum) / int(s.step_count)
    assert 8.0 < avg_kmh < 25.0


def test_basic_agent_stops_at_destination():
    from carla_ppo_tpu.envs import track as track_mod

    t = track_mod.make_segment_track([track_mod.Straight(120.0)])
    params = EnvParams(track=t)
    s = lap_env.reset(params, jax.random.PRNGKey(0))
    agent = agents.AgentState.create(target_speed_kmh=18.0)
    arrived = False
    for _ in range(900):
        action, agent, done = agents.basic_agent_step(agent, s, params)
        s, out = lap_env.step(s, action, params)
        if bool(done):
            arrived = True
            break
    assert arrived
    # Open track: waypoint index clamps at the end.
    assert int(s.waypoint_idx) >= int(t.length) - 5


def test_roaming_agent_vmapped(lap_params):
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    agent = jax.vmap(lambda _: agents.AgentState.create())(jnp.arange(B))
    actions, agent2 = jax.vmap(
        lambda a, s: agents.roaming_agent_step(a, s, lap_params)
    )(agent, states)
    assert actions.shape == (B, 3)  # [steer, throttle, brake]


def test_vehicle_hazard_detection(lap_params):
    """is_vehicle_hazard fires only for an active NPC ahead on our lane
    (reference: agent.py:61-118 _is_vehicle_hazard)."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    params_traffic = lap_params.replace(num_npcs=1)
    ego_s = float(s.waypoint_idx)

    def with_npc(ds, lateral):
        return s.replace(
            npc_s=s.npc_s.at[0].set(ego_s + ds),
            npc_lateral=s.npc_lateral.at[0].set(lateral),
        )

    # Ahead, same lane -> hazard.
    assert bool(agents.is_vehicle_hazard(with_npc(6.0, 0.0), params_traffic))
    # Ahead but other side of the road -> no hazard.
    assert not bool(agents.is_vehicle_hazard(with_npc(6.0, 2.5), params_traffic))
    # Behind -> no hazard.
    assert not bool(agents.is_vehicle_hazard(with_npc(-6.0, 0.0), params_traffic))
    # Too far ahead -> no hazard.
    assert not bool(agents.is_vehicle_hazard(with_npc(40.0, 0.0), params_traffic))
    # Inactive slot (num_npcs=0) -> no hazard.
    assert not bool(agents.is_vehicle_hazard(with_npc(6.0, 0.0), lap_params))


def test_roaming_agent_emergency_stop(lap_params):
    """The autopilot cuts throttle when a vehicle blocks the lane ahead."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    params_traffic = lap_params.replace(num_npcs=1)
    agent = agents.AgentState.create(target_speed_kmh=18.0)
    blocked = s.replace(
        npc_s=s.npc_s.at[0].set(float(s.waypoint_idx) + 5.0),
        npc_lateral=s.npc_lateral.at[0].set(0.0),
    )
    a_blocked, _ = agents.roaming_agent_step(agent, blocked, params_traffic)
    a_free, _ = agents.roaming_agent_step(agent, s, params_traffic)
    assert float(a_blocked[1]) == 0.0  # throttle cut
    assert float(a_free[1]) > 0.0

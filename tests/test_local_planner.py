"""LocalPlanner tests: queue/buffer purge semantics, exhaustion stop, and a
closed-loop lap drive through the planner (reference behavior:
CarlaEnv/agents/navigation/local_planner.py:189-243)."""

import jax
import jax.numpy as jnp
import numpy as np

from carla_ppo_tpu.envs import lap_env, local_planner
from carla_ppo_tpu.envs import track as track_mod
from carla_ppo_tpu.envs.types import EnvParams, RoadOption


def test_create_defaults_match_reference():
    """20 km/h * 1 s / 3.6 = 5.6 m sampling radius, purge at 90% of it
    (reference: local_planner.py:44,101-104)."""
    p = local_planner.LocalPlannerState.create()
    assert int(p.sampling_stride) == 6  # 5.6 m rounded to 1 m-grid waypoints
    np.testing.assert_allclose(
        float(p.min_distance), 20.0 / 3.6 * 0.9, rtol=1e-5
    )
    assert int(p.head) == 0


def test_purge_advances_past_farthest_within_min_distance(lap_params):
    """The purge pops through the FARTHEST buffered entry within
    min_distance, not just the head (reference: local_planner.py:228-238
    takes max_index over the whole buffer)."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    p = local_planner.LocalPlannerState.create()
    # Teleport the vehicle onto plan entry 2 of the buffer: indices 0,6,12.
    target = lap_params.track.pos[12]
    s = s.replace(vehicle=s.vehicle.replace(pos=target))
    _, p2, _ = local_planner.run_step(p, s, lap_params)
    # Entries 0 (d=12m) and 6 (d=6m) are outside min_distance (5m), entry 12
    # is inside -> head advances past buffer slot 2 to 3*stride.
    assert int(p2.head) == 3 * int(p.sampling_stride)


def test_no_purge_when_far(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    far = lap_params.track.pos[0] + jnp.array([50.0, 50.0])
    s = s.replace(vehicle=s.vehicle.replace(pos=far))
    p = local_planner.LocalPlannerState.create()
    _, p2, _ = local_planner.run_step(p, s, lap_params)
    assert int(p2.head) == 0


def test_exhausted_open_plan_stops():
    """A drained queue on an open plan yields a stop control and VOID
    maneuver (reference: local_planner.py:202-210)."""
    t = track_mod.make_segment_track([track_mod.Straight(60.0)])
    params = EnvParams(track=t)
    s = lap_env.reset(params, jax.random.PRNGKey(0))
    s = s.replace(vehicle=s.vehicle.replace(vx=jnp.float32(5.0)))
    p = local_planner.LocalPlannerState.create().replace(
        head=jnp.int32(int(t.length))
    )
    action, _, opt = local_planner.run_step(p, s, params)
    np.testing.assert_allclose(np.asarray(action), [0.0, 0.0, 1.0])  # brake
    assert int(opt) == int(RoadOption.VOID)


def test_set_global_plan_resets_cursor():
    p = local_planner.LocalPlannerState.create().replace(head=jnp.int32(37))
    p2 = p.set_global_plan()
    assert int(p2.head) == 0
    assert float(p2.controller.lat_state.integral) == 0.0


def test_planner_drives_lap(lap_params):
    """Closed loop: the planner's own queue/buffer target selection + PID
    must lap the track - head keeps advancing, the car stays on the road."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    p = local_planner.LocalPlannerState.create(target_speed_kmh=16.0)

    @jax.jit
    def run(s, p):
        def body(carry, _):
            s, p = carry
            action, p, _ = local_planner.run_step(p, s, lap_params)
            s, out = lap_env.step(s, action, lap_params)
            return (s, p), (out.done, s.distance_from_center)

        return jax.lax.scan(body, (s, p), None, length=1500)

    (s, p), (dones, devs) = run(s, p)
    assert not bool(dones.any()), "planner-driven episode terminated"
    assert float(s.distance_traveled) > 150.0
    assert int(p.head) > 100  # the queue cursor actually consumed the plan
    assert float(devs.max()) < 2.0


def test_planner_vmapped(lap_params):
    """The planner is a pure function over pytrees: vmap a small fleet."""
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    planners = jax.vmap(
        lambda _: local_planner.LocalPlannerState.create()
    )(jnp.arange(B))

    @jax.jit
    def step_all(states, planners):
        def one(s, p):
            action, p, _ = local_planner.run_step(p, s, lap_params)
            s, _ = lap_env.step(s, action, lap_params)
            return s, p

        return jax.vmap(one)(states, planners)

    for _ in range(60):
        states, planners = step_all(states, planners)
    assert float(states.distance_traveled.min()) > 2.0

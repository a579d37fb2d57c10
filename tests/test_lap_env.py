"""End-to-end functional-env tests: reset semantics, waypoint tracking,
metrics, auto-reset, vmap batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import lap_env
from carla_ppo_tpu.envs.observations import vector_obs_dim
from carla_ppo_tpu.envs.types import TerminationReason


def drive_controller(state, params):
    """Simple centerline-following heuristic: steer from obs features."""
    obs = lap_env.observe(state, params)
    # obs[0]=signed offset, obs[6]=bearing to wp+2 (scaled by pi).
    steer = jnp.clip(-0.5 * obs[0] + 2.5 * obs[6], -1.0, 1.0)
    throttle = jnp.where(3.6 * state.vehicle.speed < 19.0, 1.0, 0.1)
    return jnp.stack([steer, throttle])


def test_reset_on_track(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    assert float(s.distance_from_center) < 0.1
    assert abs(float(s.angle_to_road)) < 0.1
    assert float(s.vehicle.speed) == 0.0
    assert int(s.step_count) == 0


def test_eval_reset_at_start(lap_params):
    s = lap_env.reset(
        lap_params, jax.random.PRNGKey(0), is_training=False, checkpoint_idx=150
    )
    assert int(s.waypoint_idx) == 0
    s = lap_env.reset(
        lap_params, jax.random.PRNGKey(0), is_training=True, checkpoint_idx=150
    )
    assert int(s.waypoint_idx) == 150


def test_step_advances_waypoints(lap_params):
    """Full throttle along the road must advance the waypoint index."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))

    def body(s, _):
        a = drive_controller(s, lap_params)
        s, out = lap_env.step(s, a, lap_params)
        return s, out

    s, outs = jax.lax.scan(body, s, None, length=300)  # 10 s
    assert int(s.waypoint_idx) > 20
    assert float(s.distance_traveled) > 20.0
    assert float(s.distance_from_center) < 1.5
    assert not bool(s.terminal)
    # speed_accum/step_count is avg speed (reference: train.py:126).
    avg_kmh = 3.6 * float(s.speed_accum) / int(s.step_count)
    assert 5.0 < avg_kmh < 30.0


def test_checkpoint_updates(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    s = s.replace(waypoint_idx=jnp.int32(123))
    s, _ = lap_env.step(s, jnp.array([0.0, 0.0]), lap_params)
    # (123 // 50) * 50 = 100 (reference: carla_lap_env.py:398-400).
    assert int(s.checkpoint_idx) == 100


def test_eval_does_not_update_checkpoint(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0), is_training=False)
    s = s.replace(waypoint_idx=jnp.int32(123))
    s, _ = lap_env.step(s, jnp.array([0.0, 0.0]), lap_params)
    assert int(s.checkpoint_idx) == 0


def test_lap_counting_and_terminal(lap_params):
    n = int(lap_params.track.length)
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    # Teleport bookkeeping to nearly 3 laps.
    s = s.replace(waypoint_idx=jnp.int32(3 * n - 1))
    s = s.replace(
        vehicle=s.vehicle.replace(
            pos=lap_params.track.pos[(3 * n) % n], vx=jnp.float32(6.0)
        )
    )
    s, out = lap_env.step(s, jnp.array([0.0, 0.5]), lap_params)
    assert float(s.laps_completed) >= 3.0 or int(s.waypoint_idx) == 3 * n - 1


def test_off_track_terminates(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    # Teleport 4 m off the centerline.
    fwd = np.asarray(lap_params.track.fwd[0])
    lateral = np.array([-fwd[1], fwd[0]])
    s = s.replace(
        vehicle=s.vehicle.replace(pos=jnp.asarray(np.asarray(s.vehicle.pos) + 4.0 * lateral))
    )
    s, out = lap_env.step(s, jnp.array([0.0, 0.0]), lap_params)
    assert bool(out.done)
    assert int(s.termination_reason) == TerminationReason.OFF_TRACK
    assert float(out.reward) == pytest.approx(-10.0)


def test_action_smoothing(lap_params):
    params = lap_params.replace(action_smoothing=jnp.float32(0.9))
    s = lap_env.reset(params, jax.random.PRNGKey(0))
    s, _ = lap_env.step(s, jnp.array([1.0, 1.0]), params)
    # control = 0 * 0.9 + 1 * 0.1 (reference: carla_lap_env.py:332-333).
    np.testing.assert_allclose(np.asarray(s.control), [0.1, 0.1], atol=1e-6)


def test_autoreset(lap_params):
    """Reset-within-step: the step that terminates re-spawns the env at the
    checkpoint and returns the NEW episode's first obs while done/metrics
    describe the finished episode (no stale boundary observation)."""
    s = lap_env.reset(
        lap_params, jax.random.PRNGKey(0), checkpoint_idx=jnp.int32(100)
    )
    # Push the vehicle far off-track so this step terminates (OFF_TRACK).
    s = s.replace(
        vehicle=s.vehicle.replace(pos=s.vehicle.pos + jnp.asarray([0.0, 10.0])),
        distance_traveled=jnp.float32(123.0),
    )
    s2, out = lap_env.autoreset_step(s, jnp.array([0.0, 1.0]), lap_params)
    assert bool(out.done)
    # StepOutput metrics snapshot the FINISHED episode...
    assert float(out.distance_traveled) > 100.0
    # ...while the carried state is a fresh spawn at the checkpoint.
    assert int(s2.step_count) == 0
    assert float(s2.distance_traveled) < 1.0
    assert int(s2.start_waypoint_idx) == 100
    assert int(s2.checkpoint_idx) == 100
    assert not bool(s2.terminal)
    # The returned obs belongs to the new episode, not the terminal state.
    np.testing.assert_allclose(
        np.asarray(out.obs), np.asarray(lap_env.observe(s2, lap_params)),
        atol=1e-6,
    )


def test_autoreset_noop_when_alive(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    s1, o1 = lap_env.step(s, jnp.array([0.1, 0.5]), lap_params)
    s2, o2 = lap_env.autoreset_step(s, jnp.array([0.1, 0.5]), lap_params)
    np.testing.assert_allclose(np.asarray(s1.vehicle.pos), np.asarray(s2.vehicle.pos))
    assert float(o1.reward) == pytest.approx(float(o2.reward))


def test_vmap_batch(lap_params):
    B = 32
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    actions = jnp.tile(jnp.array([0.0, 1.0]), (B, 1))
    step = jax.vmap(lambda s, a: lap_env.autoreset_step(s, a, lap_params))
    states, outs = step(states, actions)
    assert outs.obs.shape == (B, vector_obs_dim())
    assert outs.reward.shape == (B,)
    assert bool(jnp.all(states.step_count == 1))


def test_obs_finite_and_scaled(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    for _ in range(50):
        s, out = lap_env.step(s, jnp.array([0.3, 1.0]), lap_params)
        assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert float(jnp.abs(out.obs).max()) < 20.0


def test_npc_overtake_event_detection(lap_params):
    """An NPC whose along-track gap sign-flips ahead -> behind counts as ONE
    overtake: npc_just_passed fires on exactly that step, npc_overtakes
    accumulates, and StepOutput carries the running count."""
    import jax

    p = lap_params.replace(num_npcs=1)
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    s = s.replace(
        vehicle=s.vehicle.replace(vx=jnp.float32(9.0)),
        npc_s=s.npc_s.at[0].set(s.waypoint_idx.astype(jnp.float32) + 0.5),
        npc_speed=s.npc_speed.at[0].set(jnp.float32(0.0)),
        npc_lateral=s.npc_lateral.at[0].set(jnp.float32(2.5)),  # clear lane
    )
    action = jnp.asarray([0.0, 1.0], jnp.float32)
    events = []
    for _ in range(10):
        s, out = lap_env.step(s, action, p)
        events.append(float(s.npc_just_passed))
        assert float(out.npc_overtakes) == float(s.npc_overtakes)
    # The stationary NPC 0.5 wp ahead is passed exactly once in ~3 m.
    assert sum(events) == 1.0
    assert float(s.npc_overtakes) == 1.0
    # A fresh reset zeroes the episode counter.
    s2 = lap_env.reset(p, jax.random.PRNGKey(1))
    assert float(s2.npc_overtakes) == 0.0


def test_npc_car_following_brakes_behind_ego(lap_params):
    """Reactive NPCs are not rails: an NPC closing on a slow ego in its lane
    brakes (car-following) instead of driving through it - the gap
    stabilizes near npc_follow_min and no collision fires from behind."""
    import jax

    p = lap_params.replace(num_npcs=1)
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    ego_s0 = float(s.waypoint_idx)
    s = s.replace(
        vehicle=s.vehicle.replace(vx=jnp.float32(0.5)),
        npc_s=s.npc_s.at[0].set(jnp.float32(ego_s0 - 20.0)),
        npc_speed=s.npc_speed.at[0].set(jnp.float32(8.0)),
        npc_lateral=s.npc_lateral.at[0].set(jnp.float32(0.0)),  # ego's lane
    )
    action = jnp.asarray([0.0, 0.0], jnp.float32)
    gaps = []
    for _ in range(120):
        s, out = lap_env.step(s, action, p)
        gaps.append(float(s.npc_s[0]) - float(s.waypoint_idx))
        assert not bool(out.done), "NPC rear-ended the stopped ego"
    # The NPC closed most of the 20 m but held off near npc_follow_min
    # (6 m), outside the collision box (npc_collision_s = 4 m).
    assert -11.0 < gaps[-1] < -float(p.npc_collision_s)
    # Steady state: gap change over the last 30 steps is small (it stopped).
    assert abs(gaps[-1] - gaps[-30]) < 1.5


def test_npc_rails_mode_reproduces_round3_behavior(lap_params):
    """npc_reactive=False restores the rail NPCs exactly: constant speed,
    frozen lateral."""
    import jax

    p = lap_params.replace(num_npcs=2, npc_reactive=False)
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    lat0 = np.asarray(s.npc_lateral)
    s0 = np.asarray(s.npc_s)
    v0 = np.asarray(s.npc_speed)
    action = jnp.asarray([0.0, 0.5], jnp.float32)
    for i in range(20):
        s, _ = lap_env.step(s, action, p)
    np.testing.assert_array_equal(np.asarray(s.npc_lateral), lat0)
    np.testing.assert_allclose(
        np.asarray(s.npc_s), s0 + 20 * float(p.dt) * v0, rtol=1e-5
    )


def test_npc_wander_stays_on_road(lap_params):
    """Reactive lateral wander is clamped inside the road (half-car margin
    from each edge) at the NPC's own waypoint."""
    import jax

    p = lap_params.replace(num_npcs=4)
    s = lap_env.reset(p, jax.random.PRNGKey(3))
    action = jnp.asarray([0.0, 0.3], jnp.float32)
    moved = False
    lat_prev = np.asarray(s.npc_lateral).copy()
    for _ in range(90):
        s, _ = lap_env.step(s, action, p)
        lat = np.asarray(s.npc_lateral)[:4]
        wp = np.asarray(s.npc_s)[:4].astype(int) % int(p.track.length)
        lw = np.asarray(p.track.left_width)[wp]
        rw = np.asarray(p.track.right_width)[wp]
        assert (lat <= lw - 0.79).all() and (lat >= -(rw - 0.79)).all()
        if not np.array_equal(lat, lat_prev[:4]):
            moved = True
        lat_prev = np.asarray(s.npc_lateral).copy()
    assert moved, "reactive NPCs should wander laterally"


def test_npc_lapping_ego_is_not_an_overtake(lap_params):
    """A FASTER NPC whose lead wraps past +L/2 on the loop flips its gap
    sign exactly like a pass (+L/2 -> -L/2) but must NOT count (round-4
    review finding: it paid a phantom pass_bonus once per relative lap)."""
    import jax

    p = lap_params.replace(num_npcs=1)
    s = lap_env.reset(p, jax.random.PRNGKey(0))
    L = float(p.track.length)
    # NPC just under half a track ahead and moving fast; a stationary-ish
    # ego watches the wrapped gap jump to -L/2 within a few steps.
    s = s.replace(
        vehicle=s.vehicle.replace(vx=jnp.float32(1.0)),
        npc_s=s.npc_s.at[0].set(
            s.waypoint_idx.astype(jnp.float32) + L / 2.0 - 0.5
        ),
        npc_speed=s.npc_speed.at[0].set(jnp.float32(10.0)),
        npc_lateral=s.npc_lateral.at[0].set(jnp.float32(2.5)),
    )
    action = jnp.asarray([0.0, 0.0], jnp.float32)
    for _ in range(10):
        s, out = lap_env.step(s, action, p)
    assert float(s.npc_overtakes) == 0.0


def test_npc_lane_keeping_spring_holds_home(lap_params):
    """With npc_keep_gain > 0 the lateral wander oscillates around
    npc_keep_lat instead of free-walking across the road (round-5 lever:
    a keep-right home leaves a reliable passing corridor)."""
    import jax

    home = -0.5
    p = lap_params.replace(
        num_npcs=4,
        npc_keep_lat=jnp.float32(home),
        npc_keep_gain=jnp.float32(1.5),
    )
    s = lap_env.reset(p, jax.random.PRNGKey(3))
    action = jnp.asarray([0.0, 0.3], jnp.float32)
    # Let the spring settle, then check the NPCs hold near home.
    for _ in range(150):
        s, _ = lap_env.step(s, action, p)
    lats = []
    for _ in range(120):
        s, _ = lap_env.step(s, action, p)
        lats.append(np.asarray(s.npc_lateral)[:4].copy())
    lats = np.stack(lats)  # [T, 4]
    # Mean near home; oscillation bounded well inside the road.
    assert np.abs(lats.mean(axis=0) - home).max() < 0.35
    assert np.abs(lats - home).max() < 1.2

    # keep_gain=0 (default) reproduces the round-4 free walk bit-exactly.
    p0 = lap_params.replace(num_npcs=4)
    pk = lap_params.replace(
        num_npcs=4, npc_keep_lat=jnp.float32(9.9), npc_keep_gain=jnp.float32(0.0)
    )
    s0 = lap_env.reset(p0, jax.random.PRNGKey(7))
    sk = lap_env.reset(pk, jax.random.PRNGKey(7))
    for _ in range(30):
        s0, _ = lap_env.step(s0, action, p0)
        sk, _ = lap_env.step(sk, action, pk)
    np.testing.assert_array_equal(
        np.asarray(s0.npc_lateral), np.asarray(sk.npc_lateral)
    )

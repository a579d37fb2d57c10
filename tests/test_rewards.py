"""Reward/termination parity tests against the reference's closed-form
shaping (reference: reward_functions.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import lap_env, rewards
from carla_ppo_tpu.envs.types import TerminationReason


def make_state(lap_params, speed_ms=0.0, dist_center=0.0, angle=0.0,
               low_speed_timer=0.0):
    import jax

    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    s = s.replace(
        vehicle=s.vehicle.replace(vx=jnp.float32(speed_ms)),
        distance_from_center=jnp.float32(dist_center),
        angle_to_road=jnp.float32(angle),
        low_speed_timer=jnp.float32(low_speed_timer),
    )
    return s


def ref_shaped_reward(speed_kmh, dist, angle_rad, mode):
    """Reference formulas (reward_functions.py:88-104, 127-143)."""
    min_speed, target, max_speed, max_dist = 15.0, 20.0, 25.0, 3.0
    if speed_kmh < min_speed:
        sr = speed_kmh / min_speed
    elif speed_kmh > target:
        sr = 1.0 - (speed_kmh - target) / (max_speed - target)
    else:
        sr = 1.0
    cf = max(1.0 - dist / max_dist, 0.0)
    af = max(1.0 - abs(angle_rad / np.deg2rad(20)), 0.0)
    return sr + cf + af if mode == "add" else sr * cf * af


@pytest.mark.parametrize("mode", ["add", "multiply"])
@pytest.mark.parametrize(
    "speed_kmh,dist,angle",
    [
        (0.0, 0.0, 0.0),
        (10.0, 1.0, 0.1),
        (17.0, 0.0, 0.0),
        (20.0, 2.9, -0.3),
        (24.0, 0.5, 0.0),
        (40.0, 0.0, 0.0),  # over-speed: negative speed term
    ],
)
def test_shaped_reward_parity(lap_params, mode, speed_kmh, dist, angle):
    fn = rewards.reward_functions[f"reward_speed_centering_angle_{mode}"]
    state = make_state(lap_params, speed_kmh / 3.6, dist, angle)
    got = float(fn(state, lap_params))
    want = ref_shaped_reward(speed_kmh, dist, angle, mode)
    assert got == pytest.approx(want, abs=1e-4)


def test_kendall_reward(lap_params):
    state = make_state(lap_params, speed_ms=10.0)
    got = float(rewards.reward_functions["reward_kendall"](state, lap_params))
    assert got == pytest.approx(36.0, abs=1e-3)


def test_low_speed_termination(lap_params):
    """< 1 km/h after 5 s -> 'Vehicle stopped' with -10
    (reference: reward_functions.py:28-30, 47-48)."""
    state = make_state(lap_params, speed_ms=0.0, low_speed_timer=5.5)
    r, term, reason, timer = rewards.step_reward(
        state, lap_params, jnp.bool_(False), jnp.int32(0)
    )
    assert bool(term)
    assert int(reason) == TerminationReason.VEHICLE_STOPPED
    assert float(r) == pytest.approx(-10.0)
    assert float(timer) == 0.0


def test_low_speed_grace_period(lap_params):
    """No termination within the first 5 s even at standstill."""
    state = make_state(lap_params, speed_ms=0.0, low_speed_timer=1.0)
    r, term, reason, timer = rewards.step_reward(
        state, lap_params, jnp.bool_(False), jnp.int32(0)
    )
    assert not bool(term)
    assert float(timer) > 1.0


def test_off_track_termination(lap_params):
    state = make_state(lap_params, speed_ms=6.0, dist_center=3.2)
    r, term, reason, _ = rewards.step_reward(
        state, lap_params, jnp.bool_(False), jnp.int32(0)
    )
    assert bool(term)
    assert int(reason) == TerminationReason.OFF_TRACK
    assert float(r) == pytest.approx(-10.0)


def test_max_speed_termination_works(lap_params):
    """The reference's version has an unbound-variable bug
    (reward_functions.py:38); ours must actually fire."""
    params = lap_params.replace(
        reward=lap_params.reward.replace(max_speed_terminate=jnp.float32(20.0))
    )
    state = make_state(params, speed_ms=30.0 / 3.6)
    _, term, reason, _ = rewards.step_reward(
        state, params, jnp.bool_(False), jnp.int32(0)
    )
    assert bool(term)
    assert int(reason) == TerminationReason.TOO_FAST


def test_env_terminal_passthrough(lap_params):
    state = make_state(lap_params, speed_ms=6.0)
    r, term, reason, _ = rewards.step_reward(
        state, lap_params, jnp.bool_(True), jnp.int32(TerminationReason.LAPS_DONE)
    )
    assert bool(term)
    assert int(reason) == TerminationReason.LAPS_DONE
    assert float(r) == pytest.approx(-10.0)


def npc_state(lap_params, ds, dlat, speed_ms=20.0 / 3.6, dist_center=0.0):
    """State with one live NPC at along-track gap `ds`, lateral `dlat`
    (ego spawns at waypoint 0 on the lane center, so ego_s = ego_lat = 0)."""
    s = make_state(lap_params, speed_ms=speed_ms, dist_center=dist_center)
    return s.replace(
        npc_s=s.npc_s.at[0].set(jnp.float32(ds)),
        npc_lateral=s.npc_lateral.at[0].set(jnp.float32(dlat)),
        npc_speed=s.npc_speed.at[0].set(jnp.float32(4.0)),
    )


def traffic_params(lap_params, n=1):
    return lap_params.replace(num_npcs=n)


def test_traffic_reward_matches_additive_without_npcs(lap_params):
    """num_npcs=0: reward_traffic_add is exactly the additive reward."""
    for speed, dist, angle in [(10.0, 1.0, 0.1), (20.0, 2.0, -0.2)]:
        s = make_state(lap_params, speed / 3.6, dist, angle)
        got = float(rewards.reward_functions["reward_traffic_add"](s, lap_params))
        want = float(
            rewards.reward_functions["reward_speed_centering_angle_add"](
                s, lap_params
            )
        )
        assert got == pytest.approx(want, abs=1e-5)


def test_traffic_reward_far_npc_is_additive(lap_params):
    """An NPC beyond OVERTAKE_WINDOW and PROXIMITY_RANGE changes nothing."""
    p = traffic_params(lap_params)
    s = npc_state(p, ds=100.0, dlat=0.0, dist_center=1.0)
    got = float(rewards.reward_functions["reward_traffic_add"](s, p))
    want = float(
        rewards.reward_functions["reward_speed_centering_angle_add"](s, p)
    )
    assert got == pytest.approx(want, abs=1e-5)


def test_traffic_reward_waives_centering_near_npc(lap_params):
    """Inside the overtake window with full lateral clearance: the centering
    term reads 1.0 regardless of offset (lateral offset during a pass is
    free), and no proximity penalty at >= PROXIMITY_RANGE box clearance."""
    p = traffic_params(lap_params)
    # ds=10 (inside window), dlat big enough that box clearance >= 6.
    s = npc_state(p, ds=10.0, dlat=9.0, dist_center=2.0, speed_ms=20.0 / 3.6)
    got = float(rewards.reward_functions["reward_traffic_add"](s, p))
    # speed term = 1.0 (20 km/h in band), centering waived -> 1.0, angle 1.0.
    assert got == pytest.approx(3.0, abs=1e-4)


def test_traffic_reward_proximity_penalty_ramp(lap_params):
    """Penalty is PROXIMITY_SCALE at box contact and ramps linearly to 0 at
    PROXIMITY_RANGE meters of clearance."""
    p = traffic_params(lap_params)
    fn = rewards.reward_functions["reward_traffic_add"]
    base = 3.0  # speed 1 + waived centering 1 + angle 1

    # Box contact: |ds| = npc_collision_s (4.0), dlat = 0 -> clearance 0.
    s = npc_state(p, ds=4.0, dlat=0.0)
    assert float(fn(s, p)) == pytest.approx(base - rewards.PROXIMITY_SCALE, abs=1e-4)

    # Half-range clearance: ds = 4 + 3 -> clearance 3 -> half penalty.
    s = npc_state(p, ds=7.0, dlat=0.0)
    assert float(fn(s, p)) == pytest.approx(
        base - 0.5 * rewards.PROXIMITY_SCALE, abs=1e-4
    )

    # Laterally clear: ds = 4, dlat = collision_lat + 6 -> no penalty.
    s = npc_state(p, ds=4.0, dlat=1.5 + 6.0)
    assert float(fn(s, p)) == pytest.approx(base, abs=1e-4)


def test_traffic_reward_inactive_slots_ignored(lap_params):
    """Slot 0 is populated but num_npcs=0: the NPC must be invisible."""
    s = npc_state(lap_params, ds=4.0, dlat=0.0, dist_center=1.0)
    got = float(rewards.reward_functions["reward_traffic_add"](s, lap_params))
    want = float(
        rewards.reward_functions["reward_speed_centering_angle_add"](
            s, lap_params
        )
    )
    assert got == pytest.approx(want, abs=1e-5)


def test_traffic_reward_no_waiver_when_following(lap_params):
    """Directly behind an NPC (|dlat| < PASS_LATERAL_MIN): centering is
    earned normally - tailgating must not collect a free centering term
    (the round-4 reward-farming regression this guards against)."""
    p = traffic_params(lap_params)
    s = npc_state(p, ds=8.0, dlat=0.0, dist_center=2.0)
    got = float(rewards.reward_functions["reward_traffic_add"](s, p))
    # speed 1 + centering (1 - 2/3) + angle 1 - proximity (clearance 4 ->
    # danger 1/3 -> 0.5).
    assert got == pytest.approx(1.0 + 1.0 / 3.0 + 1.0 - 0.5, abs=1e-4)


def test_traffic_reward_pass_bonus(lap_params):
    """A completed overtake this step pays RewardParams.pass_bonus once."""
    p = traffic_params(lap_params)
    s = npc_state(p, ds=-5.0, dlat=2.0)
    fn = rewards.reward_functions["reward_traffic_add"]
    base = float(fn(s, p))
    bumped = float(fn(s.replace(npc_just_passed=jnp.float32(1.0)), p))
    assert bumped - base == pytest.approx(float(p.reward.pass_bonus), abs=1e-4)


def test_traffic_reward_blocked_gate_scales_positive_terms(lap_params):
    """blocked_scale < 1: queued in-lane behind an NPC within block_range,
    the positive shaping terms scale down; the proximity penalty and the
    pass bonus do NOT (round-5 anti-pacing gate)."""
    p = traffic_params(lap_params)
    p = p.replace(reward=p.reward.replace(blocked_scale=jnp.float32(0.25)))
    fn = rewards.reward_functions["reward_traffic_add"]

    # Same geometry as the no-waiver test: ds=8 in-lane. Positive terms were
    # 1 + 1/3 + 1 (speed, centering, angle); proximity penalty 0.5.
    s = npc_state(p, ds=8.0, dlat=0.0, dist_center=2.0)
    assert float(fn(s, p)) == pytest.approx(
        0.25 * (1.0 + 1.0 / 3.0 + 1.0) - 0.5, abs=1e-4
    )

    # The pass bonus rides through unscaled.
    bumped = float(fn(s.replace(npc_just_passed=jnp.float32(1.0)), p))
    assert bumped - float(fn(s, p)) == pytest.approx(
        float(p.reward.pass_bonus), abs=1e-4
    )


def test_traffic_reward_blocked_gate_ignores_npc_behind_or_far(lap_params):
    """The gate only fires on an NPC AHEAD within block_range and in-lane:
    behind, beyond range, or laterally offset leaves reward unscaled."""
    p = traffic_params(lap_params)
    p = p.replace(reward=p.reward.replace(blocked_scale=jnp.float32(0.25)))
    fn = rewards.reward_functions["reward_traffic_add"]

    for ds, dlat in [(-8.0, 0.0), (20.0, 0.0), (8.0, 2.0)]:
        s = npc_state(p, ds=ds, dlat=dlat, dist_center=0.0)
        p_off = p.replace(reward=p.reward.replace(blocked_scale=jnp.float32(1.0)))
        assert float(fn(s, p)) == pytest.approx(float(fn(s, p_off)), abs=1e-5)

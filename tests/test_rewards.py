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

"""Golden-trajectory regression test.

Pins the exact numeric behavior of the lap env (dynamics + waypoint tracking
+ reward) on a fixed action script so refactors that change semantics fail
loudly (SURVEY.md section 4's golden-trajectory strategy). Tolerances are
loose enough for cross-compiler fma differences but tight enough to catch any
real change. Regenerate deliberately with tests/test_golden.py --regen logic
(see capture snippet in the test body docstring) when semantics change ON
PURPOSE, and say why in the commit.
"""

import jax
import jax.numpy as jnp
import numpy as np

from carla_ppo_tpu.envs import lap_env, track
from carla_ppo_tpu.envs.types import EnvParams

# Captured on CPU, jax 0.9, seed 42, track seed 0 (straight 30 @ full
# throttle, 30 @ steer 0.3, 30 @ steer -0.2 half throttle).
GOLDEN = {
    "rewards": {10: 0.35318, 30: 0.9004, 60: 0.05162, 89: -0.0},
    "devs": {10: 0.00449, 30: 0.05711, 60: 0.69147, 89: 0.12293},
    "pos": (206.6746, 13.6734),
    "yaw": 1.08849,
    "wp": 14,
    "dist": 14.778,
}


def test_golden_trajectory(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(42))
    actions = [(0.0, 1.0)] * 30 + [(0.3, 0.8)] * 30 + [(-0.2, 0.5)] * 30

    @jax.jit
    def roll(s):
        def body(c, a):
            s = c
            s, out = lap_env.step(s, a, lap_params)
            return s, (out.reward, s.distance_from_center)

        return jax.lax.scan(body, s, jnp.asarray(actions, jnp.float32))

    s, (r, d) = roll(s)
    r, d = np.asarray(r), np.asarray(d)
    for i, want in GOLDEN["rewards"].items():
        assert abs(float(r[i]) - want) < 1e-3, (i, float(r[i]), want)
    for i, want in GOLDEN["devs"].items():
        assert abs(float(d[i]) - want) < 1e-3, (i, float(d[i]), want)
    np.testing.assert_allclose(np.asarray(s.vehicle.pos), GOLDEN["pos"], atol=1e-2)
    assert abs(float(s.vehicle.yaw) - GOLDEN["yaw"]) < 1e-3
    assert int(s.waypoint_idx) == GOLDEN["wp"]
    assert abs(float(s.distance_traveled) - GOLDEN["dist"]) < 1e-2

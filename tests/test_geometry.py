"""Unit tests for geometry helpers against closed-form / reference-semantics
cases (reference math: CarlaEnv/wrappers.py:25-49)."""

import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import geometry


def ref_angle_diff(v0, v1):
    """The reference's scalar implementation (wrappers.py:25-30)."""
    angle = np.arctan2(v1[1], v1[0]) - np.arctan2(v0[1], v0[0])
    if angle > np.pi:
        angle -= 2 * np.pi
    elif angle <= -np.pi:
        angle += 2 * np.pi
    return angle


@pytest.mark.parametrize("seed", range(5))
def test_angle_diff_matches_reference(seed):
    rng = np.random.default_rng(seed)
    v0 = rng.normal(size=(2,))
    v1 = rng.normal(size=(2,))
    got = float(geometry.angle_diff(jnp.asarray(v0), jnp.asarray(v1)))
    want = ref_angle_diff(v0, v1)
    assert abs(got - want) < 1e-5


def test_angle_diff_signs():
    e_x = jnp.array([1.0, 0.0])
    e_y = jnp.array([0.0, 1.0])
    assert float(geometry.angle_diff(e_x, e_y)) == pytest.approx(np.pi / 2)
    assert float(geometry.angle_diff(e_y, e_x)) == pytest.approx(-np.pi / 2)
    # Opposite vectors land on +pi (half-open interval (-pi, pi]).
    assert float(geometry.angle_diff(e_x, -e_x)) == pytest.approx(np.pi)


def test_distance_to_line():
    a = jnp.array([0.0, 0.0])
    b = jnp.array([10.0, 0.0])
    p = jnp.array([5.0, 3.0])
    assert float(geometry.distance_to_line(a, b, p)) == pytest.approx(3.0)
    # Degenerate segment falls back to point distance (wrappers.py:35-36).
    assert float(geometry.distance_to_line(a, a, p)) == pytest.approx(
        float(jnp.linalg.norm(p))
    )


def test_signed_distance_to_line():
    a = jnp.array([0.0, 0.0])
    b = jnp.array([1.0, 0.0])
    assert float(
        geometry.signed_distance_to_line(a, b, jnp.array([0.5, 2.0]))
    ) == pytest.approx(2.0)
    assert float(
        geometry.signed_distance_to_line(a, b, jnp.array([0.5, -2.0]))
    ) == pytest.approx(-2.0)


def test_rotate2d():
    v = jnp.array([1.0, 0.0])
    out = geometry.rotate2d(v, jnp.pi / 2)
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0], atol=1e-6)

"""Running-moments / reward-normalization tests against numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.ops import running_stats as rs


def test_update_moments_matches_numpy():
    rng = np.random.default_rng(0)
    m = rs.RunningMoments.create()
    all_samples = []
    for _ in range(5):
        batch = rng.normal(3.0, 2.0, size=200).astype(np.float32)
        all_samples.append(batch)
        m = rs.update_moments(m, jnp.asarray(batch))
    flat = np.concatenate(all_samples)
    assert float(m.mean) == pytest.approx(flat.mean(), rel=1e-3)
    assert float(m.var) == pytest.approx(flat.var(), rel=1e-2)


def test_normalize_rewards_scales_to_unit_std():
    rng = np.random.default_rng(1)
    T, B = 64, 16
    moments = rs.RunningMoments.create()
    returns = jnp.zeros((B,))
    # Feed several rollouts of large-scale rewards; the normalized output
    # should approach unit-ish scale.
    for _ in range(10):
        rewards = jnp.asarray(rng.normal(0, 50.0, size=(T, B)).astype(np.float32))
        dones = jnp.asarray((rng.uniform(size=(T, B)) < 0.02).astype(np.float32))
        normed, moments, returns = rs.normalize_rewards(
            moments, returns, rewards, dones, 0.99
        )
    assert 0.05 < float(jnp.abs(normed).mean()) < 2.0
    assert float(jnp.abs(normed).max()) <= 10.0  # clip


def test_normalize_rewards_return_recursion():
    """Per-env returns follow R = gamma * R * (1 - done) + r."""
    rewards = jnp.asarray([[1.0], [1.0], [1.0]])
    dones = jnp.asarray([[0.0], [1.0], [0.0]])
    _, _, returns = rs.normalize_rewards(
        rs.RunningMoments.create(), jnp.zeros((1,)), rewards, dones, 0.5
    )
    # R1 = 1; done masks the carry before adding:
    # R2 = 0.5 * R1 * (1-1) + 1 = 1; R3 = 0.5 * 1 * 1 + 1 = 1.5
    assert float(returns[0]) == pytest.approx(1.5)


def test_preserves_sign_and_order():
    rewards = jnp.asarray([[3.0, -3.0, 1.0, 0.0]])
    dones = jnp.zeros((1, 4))
    normed, _, _ = rs.normalize_rewards(
        rs.RunningMoments.create(), jnp.zeros((4,)), rewards, dones, 0.99
    )
    n = np.asarray(normed[0])
    assert n[0] > n[2] > n[3] > n[1]

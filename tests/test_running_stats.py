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
    """Accumulate-then-reset: R = gamma * R + r, carry zeroed AFTER done so
    the terminal reward counts toward its own episode's return sample."""
    rewards = jnp.asarray([[1.0], [1.0], [1.0]])
    dones = jnp.asarray([[0.0], [1.0], [0.0]])
    _, _, returns = rs.normalize_rewards(
        rs.RunningMoments.create(), jnp.zeros((1,)), rewards, dones, 0.5
    )
    # R1 = 1 (carry 1); R2 = 0.5 * 1 + 1 = 1.5 but done zeroes the carry;
    # R3 = 0.5 * 0 + 1 = 1 -> final carry 1.
    assert float(returns[0]) == pytest.approx(1.0)


def test_normalize_rewards_terminal_reward_in_own_episode():
    """The terminal step's reward (e.g. the -10 penalty) must appear in the
    emitted return sample at that step, not seed the next episode."""
    rewards = jnp.asarray([[1.0], [-10.0], [0.0]])
    dones = jnp.asarray([[0.0], [1.0], [0.0]])
    moments = rs.RunningMoments.create()
    _, moments, returns = rs.normalize_rewards(
        moments, jnp.zeros((1,)), rewards, dones, 1.0
    )
    # Emitted samples: 1, (1 - 10) = -9, 0. The -9 proves the penalty landed
    # in its own episode; the final carry restarts at 0 for the next episode.
    assert float(returns[0]) == pytest.approx(0.0)
    # Moments saw the -9 sample: mean of {1, -9, 0} ~ -2.67 (plus the tiny
    # init count), so well below zero.
    assert float(moments.mean) < -2.0


def test_preserves_sign_and_order():
    rewards = jnp.asarray([[3.0, -3.0, 1.0, 0.0]])
    dones = jnp.zeros((1, 4))
    normed, _, _ = rs.normalize_rewards(
        rs.RunningMoments.create(), jnp.zeros((4,)), rewards, dones, 0.99
    )
    n = np.asarray(normed[0])
    assert n[0] > n[2] > n[3] > n[1]

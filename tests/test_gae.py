"""GAE tests against a plain-numpy reference recursion and the scipy-filter
semantics of reference: utils.py:45-50."""

import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.ops import gae


def numpy_gae(rewards, values, bootstrap, dones, gamma, lam):
    """Standard masked GAE recursion."""
    T = len(rewards)
    vals = np.concatenate([values, [bootstrap]])
    adv = np.zeros(T)
    last = 0.0
    for t in reversed(range(T)):
        nd = 1.0 - float(dones[t])
        delta = rewards[t] + nd * gamma * vals[t + 1] - vals[t]
        last = delta + gamma * lam * nd * last
        adv[t] = last
    return adv


def scipy_style_gae(rewards, values, bootstrap, dones, gamma, lam):
    """The reference's formulation (utils.py:45-50): bootstrap masked by
    dones, but the accumulation itself unmasked."""
    import scipy.signal

    vals = np.concatenate([values, [bootstrap]])
    deltas = rewards + (1.0 - dones) * gamma * vals[1:] - vals[:-1]
    return scipy.signal.lfilter([1], [1, -gamma * lam], deltas[::-1], axis=0)[::-1]


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("fn", [gae.compute_gae, gae.compute_gae_associative])
def test_gae_matches_numpy(seed, fn):
    rng = np.random.default_rng(seed)
    T = 64
    rewards = rng.normal(size=T).astype(np.float32)
    values = rng.normal(size=T).astype(np.float32)
    bootstrap = np.float32(rng.normal())
    dones = (rng.uniform(size=T) < 0.1).astype(np.float32)

    got = np.asarray(
        fn(
            jnp.asarray(rewards),
            jnp.asarray(values),
            jnp.asarray(bootstrap),
            jnp.asarray(dones),
            0.99,
            0.95,
        )
    )
    want = numpy_gae(rewards, values, bootstrap, dones, 0.99, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gae_matches_reference_formulation_when_no_mid_rollout_done():
    """With terminals only at the last step (the reference always breaks its
    rollout at a terminal, train.py:168-169), our masked recursion equals the
    reference's scipy filter exactly."""
    rng = np.random.default_rng(7)
    T = 128
    rewards = rng.normal(size=T).astype(np.float32)
    values = rng.normal(size=T).astype(np.float32)
    bootstrap = np.float32(rng.normal())
    dones = np.zeros(T, np.float32)
    dones[-1] = 1.0

    got = np.asarray(
        gae.compute_gae(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(bootstrap),
            jnp.asarray(dones), 0.99, 0.95,
        )
    )
    want = scipy_style_gae(rewards, values, bootstrap, dones, 0.99, 0.95)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gae_batched():
    """[T, B] layout vmaps over the batch axis implicitly."""
    rng = np.random.default_rng(0)
    T, B = 32, 8
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    bootstrap = rng.normal(size=B).astype(np.float32)
    dones = (rng.uniform(size=(T, B)) < 0.15).astype(np.float32)

    got = np.asarray(
        gae.compute_gae(
            jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(bootstrap),
            jnp.asarray(dones),
        )
    )
    for b in range(B):
        want = numpy_gae(
            rewards[:, b], values[:, b], bootstrap[b], dones[:, b], 0.99, 0.95
        )
        np.testing.assert_allclose(got[:, b], want, rtol=1e-4, atol=1e-5)


def test_normalize_advantages():
    adv = jnp.asarray(np.random.default_rng(0).normal(2.0, 3.0, size=256))
    out = gae.normalize_advantages(adv)
    assert abs(float(out.mean())) < 1e-5
    assert abs(float(out.std()) - 1.0) < 1e-3

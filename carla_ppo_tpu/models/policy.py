"""Gaussian actor-critic in Flax.

Architecture parity with reference: ppo.py PolicyGraph (ppo.py:11-66):

- policy trunk: MLP(500, 300), ReLU activations *including* the output
  (the reference's build_mlp is called with output_activation=relu,
  ppo.py:42; utils.py:25-28);
- action mean: Dense(num_actions) with tanh activation and variance-scaling
  init (scale=initial_mean_factor=0.1), rescaled from (-1, 1) to the action
  box low/high (ppo.py:43-47);
- log-std: a free per-action parameter initialized to log(initial_std)
  (ppo.py:48);
- value: a separate MLP(500, 300) ReLU trunk + Dense(1) (ppo.py:51-55).

The matmuls are [B, 500] x [500, 300]-shaped; at B >= 1024 they tile cleanly
onto the MXU. Parameters always stay float32 and the distribution math
(log-prob, entropy, tanh box rescale) is computed in float32; `dtype`
selects the trunk matmul compute dtype. At 8192-env minibatches the f32
matmuls are roofline-bound and `dtype=bfloat16` cuts the PPO update ~1.5x
(benchmarks/profile_update.py --dtype bfloat16).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

# Python float, NOT jnp: a module-level jnp op would initialize the JAX
# backend at import time, pinning the platform before a CLI entry point can
# honor JAX_PLATFORMS (the axon sitecustomize force-sets "axon,cpu").
LOG_2PI = math.log(2.0 * math.pi)


class MLP(nn.Module):
    hidden_sizes: Sequence[int]
    output_activation: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(h, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < len(self.hidden_sizes) - 1 or self.output_activation:
                x = nn.relu(x)
        return x


class ActorCritic(nn.Module):
    """Continuous Gaussian policy + state-value function."""

    num_actions: int = 2
    action_low: Tuple[float, ...] = (-1.0, 0.0)  # steer, throttle
    action_high: Tuple[float, ...] = (1.0, 1.0)  # (reference: carla_lap_env.py:136)
    pi_hidden_sizes: Tuple[int, ...] = (500, 300)
    vf_hidden_sizes: Tuple[int, ...] = (500, 300)
    initial_std: float = 1.0  # train.py default (train.py:229)
    initial_mean_factor: float = 0.1  # ppo.py:17
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: Array) -> Tuple[Array, Array, Array]:
        """Returns (action_mean [.., A], action_std [A], value [..])."""
        low = jnp.asarray(self.action_low, jnp.float32)
        high = jnp.asarray(self.action_high, jnp.float32)

        pi = MLP(self.pi_hidden_sizes, dtype=self.dtype, name="pi")(obs)
        raw_mean = nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.variance_scaling(
                self.initial_mean_factor, "fan_in", "truncated_normal"
            ),
            dtype=self.dtype,
            name="action_mean",
        )(pi)
        action_mean = low + (jnp.tanh(raw_mean) + 1.0) / 2.0 * (high - low)

        action_logstd = self.param(
            "action_logstd",
            lambda key, shape: jnp.full(shape, jnp.log(self.initial_std), jnp.float32),
            (self.num_actions,),
        )

        if self.vf_hidden_sizes is None:
            vf = pi  # share features (ppo.py:51-52)
        else:
            vf = MLP(self.vf_hidden_sizes, dtype=self.dtype, name="vf")(obs)
        value = nn.Dense(1, dtype=self.dtype, name="value")(vf).squeeze(-1)

        return (
            action_mean.astype(jnp.float32),
            jnp.exp(action_logstd),
            value.astype(jnp.float32),
        )

    # --- distribution helpers (diagonal Gaussian) ---

    def sample(
        self, variables, obs: Array, key: Array, greedy: bool = False
    ) -> Tuple[Array, Array, Array]:
        """Sample a clipped action; returns (action, log_prob, value).

        Parity with reference: ppo.py:57-66 - the sampled action is clipped to
        the action box and the log-prob is evaluated on the *clipped* action
        (the reference feeds the clipped `taken_actions` back through
        `action_normal.log_prob`).
        """
        mean, std, value = self.apply(variables, obs)
        noise = jax.random.normal(key, mean.shape)
        action = jnp.where(greedy, mean, mean + std * noise)
        low = jnp.asarray(self.action_low, jnp.float32)
        high = jnp.asarray(self.action_high, jnp.float32)
        action = jnp.clip(action, low, high)
        logp = gaussian_log_prob(action, mean, std)
        return action, logp, value


def gaussian_log_prob(x: Array, mean: Array, std: Array) -> Array:
    """Sum over the action axis of the diagonal-Gaussian log-density
    (reference: ppo.py:66)."""
    z = (x - mean) / std
    per_dim = -0.5 * (z**2 + LOG_2PI) - jnp.log(std)
    return jnp.sum(per_dim, axis=-1)


def gaussian_entropy(std: Array) -> Array:
    """Sum over action axis (reference: ppo.py:129)."""
    return jnp.sum(0.5 * (LOG_2PI + 1.0) + jnp.log(std), axis=-1)

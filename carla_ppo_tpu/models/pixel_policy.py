"""Pixel-input actor-critic with an integrated (jointly trained) VAE.

The reference's end state is PPO on top of a *frozen* VAE (README's
architecture); BASELINE.json config 4 goes further: end-to-end pixels where
the camera frame feeds a conv encoder trained jointly with the policy, with
the VAE's reconstruction + KL objective as an auxiliary loss (the
world-model bottleneck regularizes the representation while PPO shapes it).

Architecture: the World-Models conv stack (models/vae.py ConvEncoder: 32, 64,
128, 256, k4 s2 VALID - reference vae/models.py:249-253) -> z heads;
policy/value trunks consume z_mean ++ measurements exactly like the frozen
pipeline (vae_common.py:45-62), so a frozen-VAE agent and a joint agent see
the same observation interface.

All convs tile onto the MXU; keep batch >= 128 for full utilization.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from carla_ppo_tpu.models.policy import MLP
from carla_ppo_tpu.models.vae import ConvDecoder, ConvEncoder


class PixelActorCritic(nn.Module):
    frame_shape: Tuple[int, int, int] = (80, 160, 1)
    num_measurements: int = 3
    z_dim: int = 64
    num_actions: int = 2
    action_low: Tuple[float, ...] = (-1.0, 0.0)
    action_high: Tuple[float, ...] = (1.0, 1.0)
    pi_hidden_sizes: Tuple[int, ...] = (500, 300)
    vf_hidden_sizes: Tuple[int, ...] = (500, 300)
    initial_std: float = 1.0
    initial_mean_factor: float = 0.1
    # Joint-VAE auxiliary head (decoder); disable for plain pixel PPO.
    with_decoder: bool = True

    def _encoded_shape(self) -> Tuple[int, int, int]:
        h, w, _ = self.frame_shape
        for _ in range(4):
            h = (h - 4) // 2 + 1
            w = (w - 4) // 2 + 1
        return (h, w, 256)

    def setup(self):
        self.encoder = ConvEncoder()
        self.mean_head = nn.Dense(self.z_dim, name="z_mean")
        self.logstd_head = nn.Dense(self.z_dim, name="z_logstd_sq")
        if self.with_decoder:
            self.decoder = ConvDecoder(
                encoded_shape=self._encoded_shape(),
                out_channels=self.frame_shape[-1],
            )
        self.pi = MLP(self.pi_hidden_sizes, name="pi")
        self.action_mean_head = nn.Dense(
            self.num_actions,
            kernel_init=nn.initializers.variance_scaling(
                self.initial_mean_factor, "fan_in", "truncated_normal"
            ),
            name="action_mean",
        )
        self.vf = MLP(self.vf_hidden_sizes, name="vf")
        self.value_head = nn.Dense(1, name="value")
        self.action_logstd = self.param(
            "action_logstd",
            lambda key, shape: jnp.full(
                shape, jnp.log(self.initial_std), jnp.float32
            ),
            (self.num_actions,),
        )

    def encode(self, frames: Array) -> Tuple[Array, Array]:
        h = self.encoder(frames)
        return self.mean_head(h), self.logstd_head(h)

    def policy_value(self, frames: Array, measurements: Array):
        """(action_mean, action_std, value) - the rollout path; no decoder."""
        z_mean, _ = self.encode(frames)
        obs = jnp.concatenate([z_mean, measurements], axis=-1)
        low = jnp.asarray(self.action_low, jnp.float32)
        high = jnp.asarray(self.action_high, jnp.float32)
        raw = self.action_mean_head(self.pi(obs))
        action_mean = low + (jnp.tanh(raw) + 1.0) / 2.0 * (high - low)
        value = self.value_head(self.vf(obs)).squeeze(-1)
        return action_mean, jnp.exp(self.action_logstd), value

    def __call__(
        self,
        frames: Array,  # [B, H, W, C] float in [0,1]
        measurements: Array,  # [B, M]
        rng: Optional[Array] = None,
    ):
        """Returns (action_mean, action_std, value, aux) where aux carries the
        VAE quantities (z_mean, z_logstd_sq, recon_logits or None). Used on
        the update path where the joint-VAE losses need the decoder."""
        z_mean, z_logstd_sq = self.encode(frames)

        obs = jnp.concatenate([z_mean, measurements], axis=-1)
        low = jnp.asarray(self.action_low, jnp.float32)
        high = jnp.asarray(self.action_high, jnp.float32)
        raw = self.action_mean_head(self.pi(obs))
        action_mean = low + (jnp.tanh(raw) + 1.0) / 2.0 * (high - low)
        value = self.value_head(self.vf(obs)).squeeze(-1)

        recon_logits = None
        if self.with_decoder:
            if rng is not None:
                std = jnp.exp(0.5 * z_logstd_sq)
                z = z_mean + std * jax.random.normal(rng, z_mean.shape)
            else:
                z = z_mean
            recon_logits = self.decoder(z).reshape(frames.shape[0], -1)

        aux = {
            "z_mean": z_mean,
            "z_logstd_sq": z_logstd_sq,
            "recon_logits": recon_logits,
        }
        return action_mean, jnp.exp(self.action_logstd), value, aux

    def act(
        self,
        variables,
        frames: Array,
        measurements: Array,
        key: Array,
        greedy: bool = False,
    ) -> Tuple[Array, Array, Array]:
        """(clipped action, log_prob, value) - no decoder work on the
        rollout path (the decoder only runs inside the update minibatches)."""
        from carla_ppo_tpu.models.policy import gaussian_log_prob

        mean, std, value = self.apply(
            variables, frames, measurements, method=self.policy_value
        )
        noise = jax.random.normal(key, mean.shape)
        action = jnp.where(greedy, mean, mean + std * noise)
        low = jnp.asarray(self.action_low, jnp.float32)
        high = jnp.asarray(self.action_high, jnp.float32)
        action = jnp.clip(action, low, high)
        logp = gaussian_log_prob(action, mean, std)
        return action, logp, value

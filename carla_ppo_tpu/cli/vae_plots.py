"""VAE analysis figures (CLI).

Parity with reference: vae/vae_plots.py - latent z-dim sweep grids rendered
with the CARLA 13-class palette, plus reconstruction side-by-sides. Writes
matplotlib figures to files (the reference is also a standalone analysis
script).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax.numpy as jnp

from carla_ppo_tpu.models import vae_common
from carla_ppo_tpu.ops.rasterizer import SEG_PALETTE


def class_image(img: np.ndarray) -> np.ndarray:
    """Seg-channel [H,W,1] in [0,1] -> palette RGB (reference palette:
    vae/vae_plots.py:49-71)."""
    cls = np.clip(np.round(img[..., 0] * 12.0), 0, 12).astype(np.int32)
    return np.asarray(SEG_PALETTE)[cls]


def main(argv=None) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    parser = argparse.ArgumentParser(description="VAE latent sweep figures")
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, default="vae/plots")
    parser.add_argument("--dims", type=int, default=8)
    parser.add_argument("--steps", type=int, default=9)
    parser.add_argument("--z_range", type=float, default=3.0)
    parser.add_argument("--dataset", type=str, default=None,
                        help="Frame folder for reconstruction side-by-sides")
    params = parser.parse_args(argv)

    os.makedirs(params.out_dir, exist_ok=True)
    model, variables = vae_common.load_vae(params.model_dir)

    # Latent sweep grid (reference: vae/vae_plots.py:73-103).
    dims = min(params.dims, model.z_dim)
    fig, axes = plt.subplots(
        dims, params.steps, figsize=(params.steps * 1.6, dims * 0.9)
    )
    sweep = np.linspace(-params.z_range, params.z_range, params.steps)
    for d in range(dims):
        for i, v in enumerate(sweep):
            z = np.zeros((1, model.z_dim), np.float32)
            z[0, d] = v
            img = np.asarray(
                model.apply(variables, jnp.asarray(z),
                            method=model.generate_from_latent)
            )[0]
            rgb = class_image(img) if img.shape[-1] == 1 else img
            ax = axes[d, i] if dims > 1 else axes[i]
            ax.imshow(rgb)
            ax.set_xticks([]), ax.set_yticks([])
            if i == 0:
                ax.set_ylabel(f"z{d}", fontsize=7)
            if d == 0:
                ax.set_title(f"{v:+.1f}", fontsize=7)
    fig.suptitle("Latent sweeps (one dim at a time)")
    sweep_path = os.path.join(params.out_dir, "latent_sweep.png")
    fig.savefig(sweep_path, dpi=130, bbox_inches="tight")
    print(f"wrote {sweep_path}")

    if params.dataset:
        from carla_ppo_tpu.utils.datasets import load_images, preprocess_rgb_frame

        frames = load_images(
            os.path.join(params.dataset, "rgb"), preprocess_rgb_frame, limit=6
        )
        recon = np.asarray(
            model.apply(variables, jnp.asarray(frames), method=model.reconstruct)
        )
        fig, axes = plt.subplots(2, len(frames), figsize=(len(frames) * 1.8, 3.2))
        for i in range(len(frames)):
            axes[0, i].imshow(frames[i])
            out = recon[i]
            axes[1, i].imshow(class_image(out) if out.shape[-1] == 1 else out)
            for r in range(2):
                axes[r, i].set_xticks([]), axes[r, i].set_yticks([])
        axes[0, 0].set_ylabel("source")
        axes[1, 0].set_ylabel("reconstruction")
        recon_path = os.path.join(params.out_dir, "reconstructions.png")
        fig.savefig(recon_path, dpi=130, bbox_inches="tight")
        print(f"wrote {recon_path}")


if __name__ == "__main__":
    main(sys.argv[1:])

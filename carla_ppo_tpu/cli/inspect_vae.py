"""Interactive VAE latent-space explorer (CLI).

Parity with reference: vae/inspect_vae.py - tkinter sliders over each latent
dimension, live decoder output, and "set z by image" seeding from a real
frame. Adds a headless `--dump` mode that writes a latent-sweep contact sheet
instead of opening a window (useful on remote machines).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from carla_ppo_tpu.models import vae_common


def decode_image(model, variables, z: np.ndarray) -> np.ndarray:
    img = model.apply(
        variables, jnp.asarray(z[None], jnp.float32),
        method=model.generate_from_latent,
    )[0]
    img = np.asarray(img)
    if img.shape[-1] == 1:
        # Seg-channel output: expand with the palette for display.
        from carla_ppo_tpu.ops.rasterizer import SEG_PALETTE

        cls = np.clip(np.round(img[..., 0] * 12.0), 0, 12).astype(np.int32)
        img = np.asarray(SEG_PALETTE)[cls]
    return (img * 255).astype(np.uint8)


def dump_sweep(model, variables, out_path: str, dims: int = 10, steps: int = 9,
               z_range: float = 3.0) -> None:
    """Latent sweep grid like reference: vae/vae_plots.py:73-103."""
    from PIL import Image

    h, w = model.out_shape[0], model.out_shape[1]
    dims = min(dims, model.z_dim)
    sheet = np.zeros((dims * h, steps * w, 3), np.uint8)
    for d in range(dims):
        for i, v in enumerate(np.linspace(-z_range, z_range, steps)):
            z = np.zeros(model.z_dim, np.float32)
            z[d] = v
            sheet[d * h:(d + 1) * h, i * w:(i + 1) * w] = decode_image(
                model, variables, z
            )
    Image.fromarray(sheet).save(out_path)
    print(f"latent sweep written to {out_path}")


def run_ui(model, variables, source_dir=None) -> None:
    """tkinter slider UI (reference: vae/inspect_vae.py:41-116)."""
    import tkinter as tk

    from PIL import Image, ImageTk

    z = np.zeros(model.z_dim, np.float32)

    root = tk.Tk()
    root.title("VAE inspector")
    img_label = tk.Label(root)
    img_label.grid(row=0, column=0, columnspan=4)

    def refresh():
        img = decode_image(model, variables, z)
        img = Image.fromarray(img).resize((img.shape[1] * 3, img.shape[0] * 3),
                                          Image.NEAREST)
        tk_img = ImageTk.PhotoImage(img)
        img_label.configure(image=tk_img)
        img_label.image = tk_img

    sliders = []
    n_show = min(model.z_dim, 32)
    for d in range(n_show):
        def make_cb(dim):
            def cb(val):
                z[dim] = float(val)
                refresh()
            return cb

        s = tk.Scale(root, from_=-3.0, to=3.0, resolution=0.05,
                     orient=tk.HORIZONTAL, length=160, label=f"z{d}",
                     command=make_cb(d))
        s.grid(row=1 + d % ((n_show + 3) // 4), column=d // ((n_show + 3) // 4))
        sliders.append(s)

    def reset():
        z[:] = 0
        for s in sliders:
            s.set(0.0)
        refresh()

    def set_by_image():
        """Seed z from a random dataset frame
        (reference: inspect_vae.py:96-104)."""
        if not source_dir:
            return
        from carla_ppo_tpu.utils.datasets import load_images, preprocess_rgb_frame

        frames = load_images(source_dir, preprocess_rgb_frame, limit=50)
        frame = frames[np.random.randint(len(frames))]
        z[:] = np.asarray(
            model.apply(variables, jnp.asarray(frame[None]), method=model.encode)
        )[0][: model.z_dim]
        for d, s in enumerate(sliders):
            if d < len(z):
                s.set(float(z[d]))
        refresh()

    tk.Button(root, text="Reset", command=reset).grid(row=0, column=4)
    tk.Button(root, text="Set z by image", command=set_by_image).grid(
        row=1, column=4
    )
    refresh()
    root.mainloop()


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Explore a VAE's latent space")
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--source_dir", type=str, default=None,
                        help="Frame folder for 'set z by image'")
    parser.add_argument("--dump", type=str, default=None,
                        help="Write a latent-sweep PNG here instead of a UI")
    parser.add_argument("--dims", type=int, default=10)
    params = parser.parse_args(argv)

    model, variables = vae_common.load_vae(params.model_dir)
    if params.dump:
        dump_sweep(model, variables, params.dump, dims=params.dims)
    else:
        run_ui(model, variables, params.source_dir)


if __name__ == "__main__":
    main(sys.argv[1:])

"""Image-dataset loading for VAE training.

Parity with reference: vae/train_vae.py:15-44 - PNG frame folders, RGB and
semantic-segmentation preprocessors, and the 10% train/val split.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import numpy as np


def preprocess_rgb_frame(frame: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 [0,1] (reference: train_vae.py:15-18,
    vae_common.py:29-31)."""
    return (frame[..., :3].astype(np.float32)) / 255.0


def preprocess_seg_frame(frame: np.ndarray) -> np.ndarray:
    """CARLA seg camera encodes the class id in the red channel; 13 classes
    normalize to [0,1] by /12 (reference: train_vae.py:21-29)."""
    out = frame[..., :1].astype(np.float32) / 12.0
    return out


def load_images(
    dir_path: str,
    preprocess_fn: Callable[[np.ndarray], np.ndarray],
    limit: int | None = None,
) -> np.ndarray:
    """Load every PNG in a folder, sorted numerically when possible
    (reference: train_vae.py:31-39)."""
    from PIL import Image

    names = [n for n in os.listdir(dir_path) if n.lower().endswith(".png")]

    def sort_key(n: str):
        stem = os.path.splitext(n)[0]
        return (0, int(stem)) if stem.isdigit() else (1, stem)

    names.sort(key=sort_key)
    if limit is not None:
        names = names[:limit]
    frames = []
    for n in names:
        with Image.open(os.path.join(dir_path, n)) as im:
            frames.append(preprocess_fn(np.asarray(im)))
    return np.stack(frames)


def train_val_split(
    images: np.ndarray, val_portion: float = 0.1, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Shuffled split, 10% validation by default (reference:
    train_vae.py:41-44 splits deterministically after its own shuffle)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(images))
    n_val = max(int(len(images) * val_portion), 1)
    return images[idx[n_val:]], images[idx[:n_val]]

"""Utility-layer tests: datasets, metrics, video, checkpointer, vae_common."""

import os

import numpy as np
import pytest


def test_preprocess_rgb(tmp_path):
    from carla_ppo_tpu.utils.datasets import preprocess_rgb_frame

    frame = np.full((4, 4, 3), 255, np.uint8)
    out = preprocess_rgb_frame(frame)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, 1.0)


def test_preprocess_seg():
    from carla_ppo_tpu.utils.datasets import preprocess_seg_frame

    frame = np.zeros((4, 4, 3), np.uint8)
    frame[..., 0] = 12  # class id in red channel
    out = preprocess_seg_frame(frame)
    assert out.shape == (4, 4, 1)
    np.testing.assert_allclose(out, 1.0)


def test_load_images_sorted_numerically(tmp_path):
    from PIL import Image

    from carla_ppo_tpu.utils.datasets import load_images, preprocess_rgb_frame

    # 10.png would sort before 2.png lexically; must sort numerically.
    for i, val in [(2, 20), (10, 100), (1, 10)]:
        Image.fromarray(np.full((2, 2, 3), val, np.uint8)).save(
            tmp_path / f"{i}.png"
        )
    imgs = load_images(str(tmp_path), preprocess_rgb_frame)
    np.testing.assert_allclose(imgs[:, 0, 0, 0] * 255, [10, 20, 100], atol=1)


def test_train_val_split():
    from carla_ppo_tpu.utils.datasets import train_val_split

    data = np.arange(100)[:, None]
    train, val = train_val_split(data, val_portion=0.1, seed=0)
    assert len(train) == 90 and len(val) == 10
    assert set(train.flatten()) | set(val.flatten()) == set(range(100))


def test_mean_metrics():
    from carla_ppo_tpu.utils.metrics import MeanMetrics

    m = MeanMetrics()
    m.add({"a": 1.0, "b": 10.0})
    m.add({"a": 3.0})
    out = m.flush(None, 0)
    assert out == {"a": 2.0, "b": 10.0}
    assert m.means() == {}


def test_metrics_writer(tmp_path):
    from carla_ppo_tpu.utils.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.write_scalars({"x/y": 1.5}, 0)
    w.write_hparams({"lr": 1e-4})
    w.close()
    assert any("tfevents" in f for f in os.listdir(tmp_path))


def test_video_recorder(tmp_path):
    from carla_ppo_tpu.utils.video import VideoRecorder

    path = str(tmp_path / "out.avi")
    rec = VideoRecorder(path, frame_size=(64, 96, 3), fps=30)
    for i in range(10):
        rec.add_frame(np.full((64, 96, 3), i * 20, np.uint8))
    rec.release()
    assert os.path.getsize(path) > 1000
    import cv2

    cap = cv2.VideoCapture(path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10


def test_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp

    from carla_ppo_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path / "ck"))
    tree = {"w": jnp.arange(4.0), "step": jnp.int32(7)}
    assert ckpt.latest_step() is None
    assert ckpt.restore_latest(tree) is None
    ckpt.save(3, tree)
    ckpt.save(5, {"w": jnp.ones(4), "step": jnp.int32(9)})
    assert ckpt.latest_step() == 5
    out = ckpt.restore_latest(tree)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
    assert int(out["step"]) == 9
    old = ckpt.restore(3, tree)
    assert int(old["step"]) == 7
    ckpt.close()


def test_model_dir_name_roundtrip():
    from carla_ppo_tpu.models.vae_common import model_dir_name, parse_model_dir

    name = model_dir_name("seg", "bce", "cnn", 64, 1.0, 0.0)
    assert name == "seg_bce_cnn_zdim64_beta1_kl_tolerance0.0_data"
    z, mtype, depth, src_depth = parse_model_dir(name)
    assert src_depth == 3
    assert (z, mtype, depth) == (64, "cnn", 1)
    z, mtype, depth, _ = parse_model_dir("rgb_bce_mlp_zdim32_beta4_kl_tolerance0.5_data")
    name1 = model_dir_name("seg", "bce", "cnn", 64, 1.0, 0.0, source_depth=1)
    assert name1.startswith("from_seg_seg_")
    assert parse_model_dir(name1) == (64, "cnn", 1, 1)
    assert (z, mtype, depth) == (32, "mlp", 3)
    # seg-source / RGB-target: the "from_seg_" prefix must not be mistaken
    # for the target's "seg_" marker (train_vae --source seg
    # --use_segmentation_as_target 0).
    name2 = model_dir_name("rgb", "bce", "cnn", 64, 1.0, 0.0, source_depth=1)
    assert name2.startswith("from_seg_rgb_bce_")
    assert parse_model_dir(name2) == (64, "cnn", 3, 1)
    # RGB->RGB reconstruction: the reference's literal shipped dir name
    # (reference README.md:123-128, vae/models/rgb_bce_cnn_...).
    name3 = model_dir_name("rgb", "bce", "cnn", 64, 1.0, 0.0)
    assert name3 == "rgb_bce_cnn_zdim64_beta1_kl_tolerance0.0_data"
    assert parse_model_dir(name3) == (64, "cnn", 3, 3)


def test_timeit_device_and_sync_fetch():
    """timeit_device must actually wait for device work (host-fetch sync, NOT
    block_until_ready - which does not block on the axon remote platform)
    and return a sane positive per-call time; sync_fetch must handle pytrees
    and pick the smallest leaf without error."""
    import jax
    import jax.numpy as jnp

    from carla_ppo_tpu.utils.profiling import sync_fetch, timeit_device

    calls = {"n": 0}

    @jax.jit
    def f(x):
        return {"big": x * 2.0, "small": x.sum()}

    def wrapped(x):
        calls["n"] += 1
        return f(x)

    x = jnp.ones((64, 64))
    dt = timeit_device(wrapped, x, iters=3)
    assert dt > 0.0
    assert calls["n"] == 4  # 1 warmup + 3 timed
    sync_fetch({"a": jnp.ones(3), "b": (jnp.zeros(()), None)})
    sync_fetch(None)  # no array leaves: no-op

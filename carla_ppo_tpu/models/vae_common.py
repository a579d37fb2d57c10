"""VAE <-> RL glue: loading pretrained VAEs and building latent observations.

Parity with reference: vae_common.py - model dirs encode their configuration
in the directory NAME (`zdim64`, `mlp`, `seg_` prefix; reference:
vae_common.py:12-15), `load_vae` restores the newest checkpoint, and
`create_encode_state_fn` produces the observation the PPO agent consumes:

    z_mean(64) ++ [steer, throttle, speed]        (vae_common.py:45-62)

The TPU twist: the encoder runs INSIDE the jitted rollout on frames the
on-device camera just rendered, for the whole env batch at once - the
reference round-trips a batch-of-1 sess.run per env step (vae/models.py:199).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from carla_ppo_tpu.envs.types import EnvParams, EnvState
from carla_ppo_tpu.models.vae import VAE
from carla_ppo_tpu.ops import rasterizer
from carla_ppo_tpu.utils.checkpoint import Checkpointer


def model_dir_name(
    source: str, loss_type: str, model_type: str, z_dim: int, beta: float,
    kl_tolerance: float, source_depth: int = 3,
) -> str:
    """Compose the reference's directory naming scheme
    (e.g. seg_bce_cnn_zdim64_beta1_kl_tolerance0.0_data;
    reference: vae/train_vae.py:83-87). `source` names the TARGET family
    exactly like the reference ("seg" = trained against segmentation maps).
    A 1-channel source (a seg->seg autoencoder, our extension - the
    reference only ever encodes RGB) additionally gets a "from_seg_"
    prefix so the configuration round-trips through parse_model_dir.
    RGB targets carry the reference's literal "rgb_" prefix (its shipped
    dir: vae/models/rgb_bce_cnn_zdim64_beta1_kl_tolerance0.0_data)."""
    prefix = "seg_" if source == "seg" else "rgb_"
    if source_depth == 1:
        prefix = "from_seg_" + prefix
    beta_s = int(beta) if float(beta).is_integer() else beta
    return f"{prefix}{loss_type}_{model_type}_zdim{z_dim}_beta{beta_s}_kl_tolerance{kl_tolerance}_data"


def parse_model_dir(model_dir: str) -> Tuple[int, str, int, int]:
    """(z_dim, model_type, target_depth, source_depth) from a model
    directory name (reference: vae_common.py:12-15; source_depth is our
    extension for seg->seg autoencoders)."""
    name = os.path.basename(os.path.normpath(model_dir))
    z = re.findall(r"zdim(\d+)", name)
    z_dim = int(z[0]) if z else 64
    model_type = "mlp" if "mlp" in name else "cnn"
    # Strip the source prefix BEFORE testing for the target's "seg_": a
    # seg-source/RGB-target model ("from_seg_bce_...") must parse as
    # target_depth 3, not have its "from_seg_" matched as the target marker.
    source_depth = 1 if name.startswith("from_seg_") else 3
    rest = name[len("from_seg_"):] if source_depth == 1 else name
    target_depth = 1 if rest.startswith("seg_") else 3
    return z_dim, model_type, target_depth, source_depth


def build_vae(
    z_dim: int, model_type: str, target_depth: int,
    source_shape: Tuple[int, int, int] = (80, 160, 3),
    dtype: jnp.dtype = jnp.float32,
) -> VAE:
    return VAE(
        source_shape=source_shape,
        target_shape=(source_shape[0], source_shape[1], target_depth),
        z_dim=z_dim,
        model_type=model_type,
        dtype=dtype,
    )


def load_vae(
    model_dir: str,
    z_dim: Optional[int] = None,
    model_type: Optional[str] = None,
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[VAE, Any]:
    """Build + restore a pretrained VAE; raises if nothing restores
    (reference: vae_common.py:6-27). `dtype` sets the encoder compute dtype
    only (checkpoints are float32 either way)."""
    p_z, p_type, p_depth, p_src = parse_model_dir(model_dir)
    z_dim = z_dim or p_z
    model_type = model_type or p_type
    model = build_vae(
        z_dim, model_type, p_depth,
        source_shape=(80, 160, p_src),
        dtype=dtype,
    )

    dummy = jnp.zeros((1, *model.source_shape), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), dummy, jax.random.PRNGKey(1), True)
    ckpt = Checkpointer(os.path.join(model_dir, "checkpoints"))
    variables = ckpt.restore_latest(template)
    if variables is None:
        raise FileNotFoundError(f"Failed to load VAE from {model_dir}")
    return model, variables


def preprocess_frame(frame: Array) -> Array:
    """uint8 -> [0,1] floats (reference: vae_common.py:29-31); frames from the
    on-device camera are already [0,1] floats and pass through."""
    frame = jnp.asarray(frame)
    if jnp.issubdtype(frame.dtype, jnp.integer):
        return frame.astype(jnp.float32) / 255.0
    return frame.astype(jnp.float32)


def create_encode_state_fn(
    model: VAE,
    variables: Any,
    measurements_to_include=("steer", "throttle", "speed"),
    cam: rasterizer.CameraConfig = rasterizer.CameraConfig(),
    source: str = "seg",
) -> Callable[[EnvState, EnvParams], Array]:
    """Latent observation builder for a SINGLE env state (vmap over batches).

    source="seg": feed the camera's seg frame (as the /12-normalized single
    channel broadcast to the VAE's source depth) - the standard on-device
    path. source="rgb": feed the shaded pseudo-RGB render.
    """
    measure_flags = (
        "steer" in measurements_to_include,
        "throttle" in measurements_to_include,
        "speed" in measurements_to_include,
    )
    src_depth = model.source_shape[-1]

    def encode_state(state: EnvState, params: EnvParams) -> Array:
        if source == "rgb":
            frame = rasterizer.render_rgb(state, params, cam)
        else:
            cls = rasterizer.render_semantic(state, params, cam)
            frame = rasterizer.seg_to_obs(cls)
            if src_depth == 3:
                frame = jnp.repeat(frame, 3, axis=-1)
        z = model.apply(variables, frame[None], method=model.encode)[0]

        feats = [z]
        if measure_flags[0]:
            feats.append(state.control[0:1])
        if measure_flags[1]:
            feats.append(state.control[1:2])
        if measure_flags[2]:
            feats.append(state.vehicle.speed[None])
        return jnp.concatenate(feats).astype(jnp.float32)

    return encode_state


def create_encode_batch_fn(
    model: VAE,
    variables: Any,
    measurements_to_include=("steer", "throttle", "speed"),
    cam: rasterizer.CameraConfig = rasterizer.CameraConfig(),
    banked: bool = False,
    source: str = "seg",
) -> Callable[[EnvState, EnvParams], Array]:
    """BATCH-level latent observation builder.

    Same output as vmap(create_encode_state_fn(...)) but renders through
    rasterizer.render_batch / render_batch_banked / render_rgb_batch, which
    dispatch the fused Pallas ground kernel on TPU - the per-env vmapped
    render_semantic cannot take that path. `banked=True` for route/lap_bank
    batches whose params.track is a bank indexed by states.route_id.
    `source="rgb"` feeds the shaded pseudo-RGB frames (the reference's
    deployed observation path: RGB dashcam through the VAE,
    vae_common.py:33-62); banked rgb falls back to the vmapped renderer."""
    measure_flags = (
        "steer" in measurements_to_include,
        "throttle" in measurements_to_include,
        "speed" in measurements_to_include,
    )
    src_depth = model.source_shape[-1]
    render = rasterizer.render_batch_banked if banked else rasterizer.render_batch

    def render_rgb_frames(states: EnvState, params: EnvParams) -> Array:
        if banked:
            def one(s, p):
                per_env = p.replace(
                    track=jax.tree.map(lambda x: x[s.route_id], p.track)
                )
                return rasterizer.render_rgb(s, per_env, cam)

            return jax.vmap(one, in_axes=(0, None))(states, params)
        return rasterizer.render_rgb_batch(states, params, cam)

    def encode_batch(states: EnvState, params: EnvParams) -> Array:
        if source == "rgb":
            frames = render_rgb_frames(states, params)  # [B, H, W, 3]
        else:
            cls = render(states, params, cam)
            frames = rasterizer.seg_to_obs(cls)  # [B, H, W, 1]
            if src_depth == 3:
                frames = jnp.repeat(frames, 3, axis=-1)
        z = model.apply(variables, frames, method=model.encode)  # [B, z]
        feats = [z]
        if measure_flags[0]:
            feats.append(states.control[:, 0:1])
        if measure_flags[1]:
            feats.append(states.control[:, 1:2])
        if measure_flags[2]:
            feats.append(states.vehicle.speed[:, None])
        return jnp.concatenate(feats, axis=1).astype(jnp.float32)

    return encode_batch

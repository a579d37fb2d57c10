"""Golden outputs for the shipped pretrained checkpoints.

Guards cross-round refactors from silently breaking checkpoint loading
(reference analog: tf.train.Saver restore of models/pretrained_agent,
ppo.py:207-216 — the reference ships pretrained artifacts and relies on them
restoring; we additionally pin their outputs).

Run `python -m tests.checkpoint_goldens` to regenerate
tests/golden/checkpoint_goldens.json after DELIBERATELY refreshing an
artifact (retraining the shipped agent/VAE). A failing
tests/test_checkpoint_compat.py means either (a) a refactor changed the
train-state pytree structure or model math — fix the code, or (b) you
refreshed an artifact — rerun this module.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "checkpoint_goldens.json")

LAP_AGENT_DIR = "models/pretrained_agent"
PIXEL_AGENT_DIR = "models/pixel_agent_pretrained"
LATENT_AGENT_DIR = "models/latent_agent_pretrained"
MIXED_AGENT_DIR = "models/mixed_agent_pretrained"
ROUTE_LATENT_DIR = "models/route_latent_pretrained"
TRAFFIC_AGENT_DIR = "models/traffic_agent_pretrained"
PIXEL_TURNKEY_DIR = "models/pixel_turnkey_pretrained"
RGB_LATENT_DIR = "models/rgb_latent_pretrained"
VAE_DIR = "vae/models/seg_bce_cnn_zdim64_beta1_kl_tolerance0.0_data"
DEPROP_VAE_DIR = "vae/models/from_seg_seg_bce_cnn_zdim64_beta1_kl_tolerance0.0_deprop_data"
RGB_DEPROP_VAE_DIR = "vae/models/seg_bce_cnn_zdim64_beta1_kl_tolerance0.0_deprop_data"
RGB_RECON_VAE_DIR = "vae/models/rgb_bce_cnn_zdim64_beta1_kl_tolerance0.0_data"


def synthetic_frame(shape) -> jnp.ndarray:
    """Deterministic class-ramp frame in [0, 1]."""
    n = int(np.prod(shape))
    return (jnp.arange(n, dtype=jnp.float32).reshape(1, *shape) % 13.0) / 12.0


def synthetic_vector_obs(dim: int) -> jnp.ndarray:
    return jnp.linspace(-1.0, 1.0, dim, dtype=jnp.float32)[None, :]


MEASUREMENTS = (0.1, 0.5, 5.0)  # steer, throttle, speed


def compute_lap_agent_outputs(repo_root: str = "."):
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo
    from carla_ppo_tpu.utils.checkpoint import Checkpointer

    model = ActorCritic()
    config = ppo.PPOConfig()
    template = ppo.create_train_state(
        model, config, vector_obs_dim(), jax.random.PRNGKey(0)
    )
    ck = Checkpointer(os.path.join(repo_root, LAP_AGENT_DIR, "checkpoints"))
    restored = ck.restore_latest(template)
    ck.close()
    if restored is None:
        raise FileNotFoundError(LAP_AGENT_DIR)
    obs = synthetic_vector_obs(vector_obs_dim())
    mean, std, value = model.apply(restored.params, obs)
    return {
        "step": int(ck.latest_step() or -1),
        "mean": np.asarray(mean[0]).tolist(),
        "std": np.asarray(std).tolist(),
        "value": float(value[0]),
    }


def compute_pixel_agent_outputs(repo_root: str = ".", agent_dir: str | None = None):
    from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
    from carla_ppo_tpu.training import pixels, ppo
    from carla_ppo_tpu.utils.checkpoint import Checkpointer

    model = PixelActorCritic()
    config = ppo.PPOConfig()
    template = pixels.create_pixel_train_state(model, config, jax.random.PRNGKey(0))
    d = agent_dir or PIXEL_AGENT_DIR
    ck = Checkpointer(os.path.join(repo_root, d, "checkpoints"))
    restored = ck.restore_latest(template)
    ck.close()
    if restored is None:
        raise FileNotFoundError(d)
    frame = synthetic_frame(model.frame_shape)
    meas = jnp.asarray([MEASUREMENTS], jnp.float32)
    mean, std, value = model.apply(
        restored.params, frame, meas, method=model.policy_value
    )
    return {
        "step": int(ck.latest_step() or -1),
        "mean": np.asarray(mean[0]).tolist(),
        "std": np.asarray(std).tolist(),
        "value": float(value[0]),
    }


def compute_vae_outputs(repo_root: str = ".", vae_dir: str | None = None):
    from carla_ppo_tpu.models import vae_common

    model, variables = vae_common.load_vae(
        os.path.join(repo_root, vae_dir or VAE_DIR)
    )
    frame = synthetic_frame(model.source_shape)
    z = model.apply(variables, frame, method=model.encode)
    return {
        "z_prefix": np.asarray(z[0, :8]).tolist(),
        "z_sum": float(z.sum()),
    }


def compute_latent_agent_outputs(repo_root: str = ".", agent_dir: str | None = None):
    """The shipped rich-scene latent agent (config 2): z64 ++ 3 measurements
    consumed by the standard ActorCritic. `agent_dir` overrides for other
    latent-obs agents (the route-latent agent shares the architecture)."""
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo
    from carla_ppo_tpu.utils.checkpoint import Checkpointer

    model = ActorCritic()
    config = ppo.PPOConfig()
    template = ppo.create_train_state(model, config, 67, jax.random.PRNGKey(0))
    d = agent_dir or LATENT_AGENT_DIR
    ck = Checkpointer(os.path.join(repo_root, d, "checkpoints"))
    restored = ck.restore_latest(template)
    ck.close()
    if restored is None:
        raise FileNotFoundError(d)
    obs = synthetic_vector_obs(67)
    mean, std, value = model.apply(restored.params, obs)
    return {
        "step": int(ck.latest_step() or -1),
        "mean": np.asarray(mean[0]).tolist(),
        "std": np.asarray(std).tolist(),
        "value": float(value[0]),
    }


def compute_mixed_agent_outputs(repo_root: str = "."):
    """The round-3 mixed-precision lap agent (bf16 rollout + f32 update,
    kl_target 0.01): standard vector-obs ActorCritic, params stored f32."""
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo
    from carla_ppo_tpu.utils.checkpoint import Checkpointer

    model = ActorCritic()
    config = ppo.PPOConfig()
    template = ppo.create_train_state(
        model, config, vector_obs_dim(), jax.random.PRNGKey(0)
    )
    ck = Checkpointer(os.path.join(repo_root, MIXED_AGENT_DIR, "checkpoints"))
    restored = ck.restore_latest(template)
    ck.close()
    if restored is None:
        raise FileNotFoundError(MIXED_AGENT_DIR)
    obs = synthetic_vector_obs(vector_obs_dim())
    mean, std, value = model.apply(restored.params, obs)
    return {
        "step": int(ck.latest_step() or -1),
        "mean": np.asarray(mean[0]).tolist(),
        "std": np.asarray(std).tolist(),
        "value": float(value[0]),
    }


def compute_traffic_agent_outputs(repo_root: str = "."):
    """The round-3 traffic agent: vector_npc radar observations (ground
    truth ++ nearest-NPC radar channels), standard ActorCritic."""
    from carla_ppo_tpu.envs.observations import vector_npc_obs_dim
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo
    from carla_ppo_tpu.utils.checkpoint import Checkpointer

    model = ActorCritic()
    config = ppo.PPOConfig()
    template = ppo.create_train_state(
        model, config, vector_npc_obs_dim(), jax.random.PRNGKey(0)
    )
    ck = Checkpointer(os.path.join(repo_root, TRAFFIC_AGENT_DIR, "checkpoints"))
    restored = ck.restore_latest(template)
    ck.close()
    if restored is None:
        raise FileNotFoundError(TRAFFIC_AGENT_DIR)
    obs = synthetic_vector_obs(vector_npc_obs_dim())
    mean, std, value = model.apply(restored.params, obs)
    return {
        "step": int(ck.latest_step() or -1),
        "mean": np.asarray(mean[0]).tolist(),
        "std": np.asarray(std).tolist(),
        "value": float(value[0]),
    }


COMPUTE_FNS = {
    "lap_agent": compute_lap_agent_outputs,
    "mixed_agent": compute_mixed_agent_outputs,
    "pixel_agent": compute_pixel_agent_outputs,
    "latent_agent": compute_latent_agent_outputs,
    "route_latent_agent": lambda repo_root=".": compute_latent_agent_outputs(
        repo_root, ROUTE_LATENT_DIR
    ),
    "traffic_agent": compute_traffic_agent_outputs,
    # Round 4: the reference's deployed observation path - RGB camera frames
    # encoded by a frozen VAE (reference: vae_common.py:33-62) - with the
    # de-prop target. Same latent ActorCritic architecture (z64 ++ 3).
    "rgb_latent_agent": lambda repo_root=".": compute_latent_agent_outputs(
        repo_root, RGB_LATENT_DIR
    ),
    "pixel_turnkey_agent": lambda repo_root=".": compute_pixel_agent_outputs(
        repo_root, PIXEL_TURNKEY_DIR
    ),
    "seg_vae": compute_vae_outputs,
    "deprop_vae": lambda repo_root=".": compute_vae_outputs(
        repo_root, DEPROP_VAE_DIR
    ),
    "rgb_deprop_vae": lambda repo_root=".": compute_vae_outputs(
        repo_root, RGB_DEPROP_VAE_DIR
    ),
    # Round 5: the reference's literal rgb->rgb reconstruction artifact
    # (its vae/models/rgb_bce_cnn_zdim64_..., README.md:123-128) - source ==
    # target == shaded pseudo-RGB (benchmarks/train_deprop_vae.py --source
    # rgb --target input; dataset generator + seed pinned in dataset.json).
    "rgb_recon_vae": lambda repo_root=".": compute_vae_outputs(
        repo_root, RGB_RECON_VAE_DIR
    ),
}


def main() -> None:
    # Goldens MUST be generated on the CPU backend: the compat test runs on
    # CPU and TPU matmuls differ at ~1e-3.
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "regenerate goldens on CPU (a non-CPU backend was already initialized)"
    )
    goldens = {}
    for name, fn in COMPUTE_FNS.items():
        try:
            goldens[name] = fn()
            print(f"{name}: ok")
        except FileNotFoundError as e:
            print(f"{name}: MISSING ({e}) — not written")
    # Refuse to silently shrink the golden set: a missing artifact dir means
    # blobs were lost (round 5: the rgb->rgb VAE dir was never git-tracked
    # and a VM reset emptied it) — that must fail loudly here, not vanish
    # from the JSON and pass the suite.
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            prior = set(json.load(f))
        dropped = prior - set(goldens)
        if dropped:
            raise SystemExit(
                f"refusing to write: goldens would drop {sorted(dropped)} "
                "(artifact missing on disk — restore or retrain it first)"
            )
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(goldens, f, indent=2)
    print(f"wrote {GOLDEN_PATH}")


if __name__ == "__main__":
    main()

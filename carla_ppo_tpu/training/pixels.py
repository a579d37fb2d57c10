"""End-to-end pixel PPO with joint VAE auxiliary training (config 4).

The full on-device loop: Pallas/XLA camera renders seg frames -> conv encoder
-> policy, with PPO's clipped surrogate plus the beta-VAE objective on the
SAME minibatch frames, all in one XLA program. The reference can only train
its VAE offline on 10k recorded frames and freeze it (SURVEY.md section 3.4);
joint training is the capability step beyond.

Memory: rollout frames are stored as uint8 class ids ([T, B, H, W], 1.6 GB at
T=128 B=1024) and converted to the /12-normalized float channel per minibatch
- HBM-friendly and exactly the reference's preprocessing (train_vae.py:26-29).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax import Array

from carla_ppo_tpu.envs import lap_bank_env, lap_env, route_env
from carla_ppo_tpu.envs.types import EnvParams, EnvState, TerminationReason
from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
from carla_ppo_tpu.models.policy import gaussian_entropy, gaussian_log_prob
from carla_ppo_tpu.models.vae import vae_loss
from carla_ppo_tpu.ops import gae, rasterizer
from carla_ppo_tpu.training.ppo import (
    PPOConfig,
    TrainState,
    adv_snr_gate,
    make_lr_schedule,
    schedule_value,
)

_ENVS = {"lap": lap_env, "route": route_env, "lap_bank": lap_bank_env}


@dataclasses.dataclass(frozen=True)
class PixelConfig:
    """Extra knobs on top of PPOConfig for the pixel pipeline."""

    vae_scale: float = 1e-4  # aux (recon + beta*kl) weight vs PPO loss
    beta: float = 1.0
    kl_tolerance: float = 0.0
    cam: rasterizer.CameraConfig = rasterizer.CameraConfig()
    # Per-group gradient clipping. A single global clip lets the conv/VAE
    # gradient mass scale the policy-head gradients toward zero (measured:
    # clipped joint runs stall, unclipped runs collapse ~iteration 400);
    # clipping the policy/value heads and the encoder/decoder separately
    # keeps both learning. <= 0 disables a group's clip.
    policy_grad_norm: float = 0.5
    encoder_grad_norm: float = 5.0
    # De-prop auxiliary target: the VAE aux loss reconstructs the PLAIN
    # scene (the ground pass - props/NPCs removed) from the rich input
    # frame, instead of reconstructing the input. The frozen-latent pipeline
    # measured this representation markedly easier to drive from (the
    # de-prop VAE, RESULTS_round2.md); here the target frame is free - it
    # is an intermediate of the same render (rasterizer
    # render_semantic_with_ground). Costs one extra [T, B, H, W] uint8
    # rollout buffer.
    deprop_aux: bool = False


_POLICY_TOPLEVEL = ("pi", "action_mean", "vf", "value", "action_logstd")


def make_pixel_optimizer(config: PPOConfig, pix: PixelConfig):
    """Two-group optimizer: policy/value heads vs conv encoder/decoder,
    each with its own gradient-norm clip, sharing the adam schedule."""
    import optax as _optax

    schedule = make_lr_schedule(config)

    def group_tx(clip_norm):
        clip = clip_norm if clip_norm > 0 else 1e9
        return _optax.chain(
            _optax.clip_by_global_norm(clip), _optax.adam(schedule, eps=1e-8)
        )

    def label_fn(params):
        def label_tree(tree, label):
            return jax.tree.map(lambda _: label, tree)

        return {
            "params": {
                k: label_tree(
                    v, "policy" if k in _POLICY_TOPLEVEL else "encoder"
                )
                for k, v in params["params"].items()
            }
        }

    return _optax.multi_transform(
        {
            "policy": group_tx(pix.policy_grad_norm),
            "encoder": group_tx(pix.encoder_grad_norm),
        },
        label_fn,
    )


@struct.dataclass
class PixelTrajectory:
    frames: Array  # [T, B, H, W] uint8 class ids
    measurements: Array  # [T, B, 3]
    actions: Array
    log_probs: Array
    values: Array
    rewards: Array
    dones: Array
    # De-prop targets (PixelConfig.deprop_aux): [T, B, H, W] uint8 plain
    # (ground-only) frames, or None when reconstructing the input.
    target_frames: Any = None


def _render_and_measure(
    states: EnvState,
    env_params: EnvParams,
    cam,
    env_kind: str,
    with_ground: bool = False,
) -> Tuple[Array, Any, Array]:
    """(frames u8, deprop-target u8 | None, measurements) for an env batch."""
    from carla_ppo_tpu.envs.observations import measurements as measure_fn

    if env_kind == "lap":
        # Batch-level render: on TPU this takes the fused Pallas ground
        # kernel (rasterizer.render_batch docstring).
        if with_ground:
            cls, ground = rasterizer.render_batch_with_ground(
                states, env_params, cam
            )
            return (
                cls.astype(jnp.uint8),
                ground.astype(jnp.uint8),
                jax.vmap(measure_fn)(states),
            )
        cls = rasterizer.render_batch(states, env_params, cam)
        return cls.astype(jnp.uint8), None, jax.vmap(measure_fn)(states)

    def per_env(s):
        # Banked tracks: slice this env's track before rendering
        # (route_id doubles as the lap_bank track id).
        p = env_params.replace(
            track=jax.tree.map(lambda x: x[s.route_id], env_params.track)
        )
        if with_ground:
            cls, ground = rasterizer.render_semantic_with_ground(s, p, cam)
            return cls.astype(jnp.uint8), ground.astype(jnp.uint8), measure_fn(s)
        cls = rasterizer.render_semantic(s, p, cam)
        return cls.astype(jnp.uint8), measure_fn(s)

    if with_ground:
        return jax.vmap(per_env)(states)
    cls, meas = jax.vmap(per_env)(states)
    return cls, None, meas


def pixel_rollout(
    model: PixelActorCritic,
    params: Any,
    env_states: EnvState,
    env_params: EnvParams,
    rng: Array,
    config: PPOConfig,
    pix: PixelConfig,
):
    env = _ENVS[config.env_kind]

    frames0, targets0, meas0 = _render_and_measure(
        env_states, env_params, pix.cam, config.env_kind,
        with_ground=pix.deprop_aux,
    )

    def step_fn(carry, key):
        env_states, frames, targets, meas = carry
        f = frames.astype(jnp.float32)[..., None] / 12.0
        action, logp, value = model.act(params, f, meas, key)
        env_states, out = jax.vmap(
            lambda s, a: env.autoreset_step(s, a, env_params, "vector")
        )(env_states, action)
        next_frames, next_targets, next_meas = _render_and_measure(
            env_states, env_params, pix.cam, config.env_kind,
            with_ground=pix.deprop_aux,
        )
        traj = PixelTrajectory(
            frames=frames,
            measurements=meas,
            actions=action,
            log_probs=logp,
            values=value,
            rewards=out.reward,
            dones=out.done.astype(jnp.float32),
            target_frames=targets,
        )
        ep = (out.done.astype(jnp.float32), out.total_reward,
              out.distance_traveled, out.laps_completed)
        return (env_states, next_frames, next_targets, next_meas), (traj, ep)

    keys = jax.random.split(rng, config.horizon)
    (env_states, last_frames, _, last_meas), (traj, ep) = jax.lax.scan(
        step_fn, (env_states, frames0, targets0, meas0), keys
    )

    f = last_frames.astype(jnp.float32)[..., None] / 12.0
    _, _, bootstrap = model.apply(params, f, last_meas, method=model.policy_value)

    done_w, ep_rew, ep_dist, ep_laps = ep
    n_done = jnp.maximum(done_w.sum(), 1.0)
    episodic = {
        "train/reward": (ep_rew * done_w).sum() / n_done,
        "train/distance_traveled": (ep_dist * done_w).sum() / n_done,
        "train/laps_completed": (ep_laps * done_w).sum() / n_done,
        "train/episodes_finished": done_w.sum(),
    }
    return env_states, traj, bootstrap, episodic


def pixel_loss(
    params: Any,
    model: PixelActorCritic,
    batch: Dict[str, Array],
    config: PPOConfig,
    pix: PixelConfig,
    rng: Array,
    entropy_scale: Array | None = None,
) -> Tuple[Array, Dict[str, Array]]:
    if entropy_scale is None:
        entropy_scale = jnp.float32(config.entropy_scale)
    frames = batch["frames"].astype(jnp.float32)[..., None] / 12.0
    mean, std, value, aux = model.apply(
        params, frames, batch["measurements"], rng
    )
    logp = gaussian_log_prob(batch["actions"], mean, std)
    log_ratio = logp - batch["log_probs"]
    ratio = jnp.exp(log_ratio)
    adv = batch["advantages"]
    policy_loss = jnp.mean(
        jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - config.ppo_epsilon, 1 + config.ppo_epsilon) * adv,
        )
    )
    value_loss = jnp.mean((value - batch["returns"]) ** 2) * config.value_scale
    entropy_loss = jnp.mean(gaussian_entropy(std)) * entropy_scale
    ppo_total = -policy_loss + value_loss - entropy_loss

    metrics = {
        "train_loss/policy": policy_loss,
        "train_loss/value": value_loss,
        "train_loss/entropy": entropy_loss,
        "train/prob_ratio": jnp.mean(ratio),
        # Collapse diagnostics (VERDICT round-2 item 2): track update health
        # so a late-training failure leaves a mechanism trace in TB.
        "train/approx_kl": jnp.mean(ratio - 1.0 - log_ratio),
        "train/ratio_max": jnp.max(ratio),
        "train/value_mean": jnp.mean(value),
        "train/value_abs_max": jnp.max(jnp.abs(value)),
        "train/action_std_min": jnp.min(std),
    }

    total = ppo_total
    if model.with_decoder:
        # De-prop aux (PixelConfig.deprop_aux): reconstruct the plain-scene
        # target instead of the rich input.
        target = frames
        if batch.get("target_frames") is not None:
            target = batch["target_frames"].astype(jnp.float32)[..., None] / 12.0
        v_loss, v_metrics = vae_loss(
            aux["recon_logits"], target, aux["z_mean"], aux["z_logstd_sq"],
            pix.beta, pix.kl_tolerance, model.z_dim, "bce",
        )
        total = ppo_total + pix.vae_scale * v_loss
        metrics["train_loss/vae_recon"] = v_metrics["reconstruction_loss"]
        metrics["train_loss/vae_kl"] = v_metrics["kl_loss"]
    metrics["train_loss/loss"] = total
    return total, metrics


def pixel_train_iteration_core(
    train_state: TrainState,
    env_states: EnvState,
    env_params: EnvParams,
    model: PixelActorCritic,
    config: PPOConfig,
    pix: PixelConfig = PixelConfig(),
    axis_name: str | None = None,
    freeze=None,
) -> Tuple[TrainState, EnvState, Dict[str, Array]]:
    """One fused pixel-PPO iteration; with `axis_name` set (inside shard_map
    over a device mesh) gradients/statistics are psum'd so every device
    applies identical updates while rendering only its own env shard."""
    rng, roll_key, perm_key, loss_key = jax.random.split(train_state.rng, 4)
    if axis_name is not None:
        # De-correlate per-device rollouts; keep permutation/loss keys in
        # lockstep so the update schedule is identical across devices.
        roll_key = jax.random.fold_in(roll_key, jax.lax.axis_index(axis_name))

    env_states, traj, bootstrap, episodic = pixel_rollout(
        model, train_state.params, env_states, env_params, roll_key, config, pix
    )

    advantages = gae.compute_gae(
        traj.rewards, traj.values, bootstrap, traj.dones,
        config.discount_factor, config.gae_lambda,
    )
    returns = advantages + traj.values
    adv_snr, stop0 = adv_snr_gate(advantages, returns, config, axis_name)
    if freeze is not None:
        # Solve-aware freeze (TrainerSettings.freeze_on_solve): dynamic
        # scalar, no recompile on flip; frozen iterations roll out but
        # apply no update (policy AND the VAE aux path hold).
        stop0 = jnp.logical_or(stop0, freeze)
    if config.normalize_advantage:
        if axis_name is None:
            advantages = gae.normalize_advantages(advantages)
        else:
            n_local = jnp.float32(advantages.size)
            n_tot = jax.lax.psum(n_local, axis_name)
            mean = jax.lax.psum(advantages.sum(), axis_name) / n_tot
            var = jax.lax.psum(((advantages - mean) ** 2).sum(), axis_name) / n_tot
            advantages = (advantages - mean) / (jnp.sqrt(var) + 1e-8)

    T, B = traj.rewards.shape
    n = T * B
    H, W = traj.frames.shape[-2:]
    # Same env-axis minibatching as ppo.train_iteration_core (see
    # PPOConfig.minibatch_axis): permute envs, gather contiguous horizons.
    env_axis = config.minibatch_axis == "env" and B % config.num_minibatches == 0
    if env_axis:
        data = {
            "frames": traj.frames.swapaxes(0, 1),
            "measurements": traj.measurements.swapaxes(0, 1),
            "actions": traj.actions.swapaxes(0, 1),
            "log_probs": traj.log_probs.swapaxes(0, 1),
            "returns": returns.swapaxes(0, 1),
            "advantages": advantages.swapaxes(0, 1),
        }
        if traj.target_frames is not None:
            data["target_frames"] = traj.target_frames.swapaxes(0, 1)
        perm_size = B
    else:
        data = {
            "frames": traj.frames.reshape(n, H, W),
            "measurements": traj.measurements.reshape(n, -1),
            "actions": traj.actions.reshape(n, -1),
            "log_probs": traj.log_probs.reshape(n),
            "returns": returns.reshape(n),
            "advantages": advantages.reshape(n),
        }
        if traj.target_frames is not None:
            data["target_frames"] = traj.target_frames.reshape(n, H, W)
        perm_size = n

    tx = make_pixel_optimizer(config, pix)
    ent_scale = schedule_value(
        config.entropy_schedule, config.entropy_scale, train_state.iteration
    )

    def minibatch_step(carry, xs):
        params, opt_state, stop = carry
        idx, key = xs
        if env_axis:
            batch = jax.tree.map(
                lambda x: x[idx].reshape((-1,) + x.shape[2:]), data
            )
        else:
            batch = jax.tree.map(lambda x: x[idx], data)
        (_, metrics), grads = jax.value_and_grad(pixel_loss, has_aux=True)(
            params, model, batch, config, pix, key, ent_scale
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        # Pre-clip per-group gradient norms (collapse diagnostics: which
        # group's gradients spike when training degrades?).
        gp = grads["params"]
        metrics["train_grad/policy_norm"] = optax.global_norm(
            [v for k, v in gp.items() if k in _POLICY_TOPLEVEL]
        )
        metrics["train_grad/encoder_norm"] = optax.global_norm(
            [v for k, v in gp.items() if k not in _POLICY_TOPLEVEL]
        )
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if config.kl_target > 0 or config.adv_snr_min > 0 or freeze is not None:
            # KL-guard, identical to ppo.train_iteration_core: freeze the
            # params once the policy diverges kl_target from the rollout
            # behavior policy (the post-solve collapse fix; the VAE aux
            # gradients stop too - perception only moves with the policy).
            # approx_kl is this minibatch's PRE-update divergence, so the
            # check gates the current update too. The advantage-SNR gate
            # (ppo.adv_snr_gate) seeds `stop` at the iteration level.
            if config.kl_target > 0:
                stop = jnp.logical_or(
                    stop, metrics["train/approx_kl"] > config.kl_target
                )
            keep = jnp.logical_not(stop)
            sel = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(keep, a, b), new, old
            )
            new_params = sel(new_params, params)
            new_opt_state = sel(new_opt_state, opt_state)
            metrics["train/update_skipped"] = 1.0 - keep.astype(jnp.float32)
        return (new_params, new_opt_state, stop), metrics

    def epoch_step(carry, keys):
        perm_k, mb_keys = keys
        perm = jax.random.permutation(perm_k, perm_size)
        batches = perm.reshape(config.num_minibatches, -1)
        return jax.lax.scan(minibatch_step, carry, (batches, mb_keys))

    epoch_perm_keys = jax.random.split(perm_key, config.num_epochs)
    mb_keys = jax.random.split(
        loss_key, config.num_epochs * config.num_minibatches
    ).reshape(config.num_epochs, config.num_minibatches, -1)
    (params, opt_state, _), metrics = jax.lax.scan(
        epoch_step,
        (train_state.params, train_state.opt_state, stop0),
        (epoch_perm_keys, mb_keys),
    )

    metrics = jax.tree.map(lambda x: x.mean(), metrics)
    if config.adv_snr_min > 0:
        metrics["train/adv_snr"] = adv_snr
    if axis_name is not None:
        episodic = jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), episodic)
        episodic["train/episodes_finished"] = (
            episodic["train/episodes_finished"] * jax.lax.axis_size(axis_name)
        )
    metrics.update(episodic)
    metrics["train/entropy_scale"] = ent_scale
    metrics["train/learning_rate"] = schedule_value(
        config.lr_schedule, config.learning_rate, train_state.iteration
    ) if config.lr_schedule else jnp.float32(
        config.learning_rate
    ) * config.lr_decay ** train_state.iteration

    n_global = n if axis_name is None else n * jax.lax.axis_size(axis_name)
    new_state = TrainState(
        params=params,
        opt_state=opt_state,
        iteration=train_state.iteration + 1,
        train_step=train_state.train_step + config.updates_per_iteration,
        total_env_steps=train_state.total_env_steps + jnp.float32(n_global),
        episodes_done=train_state.episodes_done
        + episodic["train/episodes_finished"].astype(jnp.int32),
        rng=rng,
        reward_norm=train_state.reward_norm,
    )
    return new_state, env_states, metrics


@partial(jax.jit, static_argnames=("model", "config", "pix"))
def pixel_train_iteration(
    train_state: TrainState,
    env_states: EnvState,
    env_params: EnvParams,
    model: PixelActorCritic,
    config: PPOConfig,
    pix: PixelConfig = PixelConfig(),
    freeze=None,
) -> Tuple[TrainState, EnvState, Dict[str, Array]]:
    """Single-device fused pixel iteration (see pixel_train_iteration_core)."""
    return pixel_train_iteration_core(
        train_state, env_states, env_params, model, config, pix,
        axis_name=None, freeze=freeze,
    )


def create_pixel_train_state(
    model: PixelActorCritic,
    config: PPOConfig,
    rng: Array,
    pix: PixelConfig = PixelConfig(),
) -> TrainState:
    h, w, c = model.frame_shape
    from carla_ppo_tpu.ops.running_stats import RunningMoments

    params = model.init(
        rng,
        jnp.zeros((1, h, w, c), jnp.float32),
        jnp.zeros((1, model.num_measurements), jnp.float32),
        jax.random.PRNGKey(0),
    )
    opt_state = make_pixel_optimizer(config, pix).init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        iteration=jnp.int32(0),
        train_step=jnp.int32(0),
        total_env_steps=jnp.float32(0.0),
        episodes_done=jnp.int32(0),
        rng=rng,
        reward_norm=RunningMoments.create(),
    )


def warm_start_from_vae(train_state: TrainState, vae_variables) -> TrainState:
    """Initialize the pixel agent's perception stack from a trained seg-VAE.

    Copies encoder convs, z heads, and (when present) the decoder from a
    `models/vae.VAE` checkpoint into the PixelActorCritic params - both use
    the same ConvEncoder/ConvDecoder modules, so the subtrees are
    shape-identical. Policy/value trunks keep their fresh init. This is the
    capability the reference pipeline implies (its agent always starts from
    a pretrained VAE, vae_common.py:6-27) carried over to joint training:
    perception starts trained, PPO shapes it from there.
    """
    import flax

    src = vae_variables["params"]
    params = flax.core.unfreeze(train_state.params)
    p = params["params"]
    mapping = {"encoder": "encoder", "z_mean": "mean", "z_logstd_sq": "logstd_square"}
    if "decoder" in p and "decoder" in src:
        mapping["decoder"] = "decoder"

    def adapt(dst_leaf, src_leaf):
        if dst_leaf.shape == src_leaf.shape:
            return jnp.asarray(src_leaf)
        # Channel adaptation: the reference-parity VAE is RGB->seg (3-channel
        # source) while the pixel agent reads 1-channel seg frames. Sum the
        # first conv's kernel over the input-channel axis (preserves the
        # response to channel-replicated inputs); same trick for a decoder
        # head with a different channel count is not attempted.
        if (
            dst_leaf.ndim == 4
            and src_leaf.ndim == 4
            and dst_leaf.shape[:2] == src_leaf.shape[:2]
            and dst_leaf.shape[3] == src_leaf.shape[3]
            and dst_leaf.shape[2] == 1
        ):
            return jnp.asarray(src_leaf).sum(axis=2, keepdims=True)
        raise ValueError(
            f"shape mismatch warm-starting: {dst_leaf.shape} vs {src_leaf.shape}"
        )

    for dst_key, src_key in mapping.items():
        try:
            p[dst_key] = jax.tree.map(adapt, p[dst_key], src[src_key])
        except ValueError:
            if dst_key == "decoder":
                continue  # channel-incompatible decoder: keep fresh init
            raise
    return train_state.replace(
        params=flax.core.freeze(params)
        if isinstance(train_state.params, flax.core.FrozenDict)
        else params
    )


def _evaluate_snaps(
    params: Any,
    env_params: EnvParams,
    model: PixelActorCritic,
    keys: Array,
    track_ids: Array | None,
    max_steps: Array,
    config: PPOConfig,
    pix: PixelConfig,
    chunk: int,
):
    """Per-env greedy-eval core for the pixel pipeline: (snap dict, done).

    Mirror of ppo._evaluate_snaps (same data-parallel contract: pure per-env
    function of reset key + replicated params)."""
    env = _ENVS[config.env_kind]
    num_envs = keys.shape[0]
    if config.env_kind == "lap_bank":
        states = jax.vmap(
            lambda k, t: env.reset(env_params, k, is_training=False, track_id=t)
        )(keys, track_ids)
    else:
        states = jax.vmap(
            lambda k: env.reset(env_params, k, is_training=False)
        )(keys)
    frames0, _, meas0 = _render_and_measure(
        states, env_params, pix.cam, config.env_kind
    )

    def step_fn(carry, _):
        states, frames, meas, done, snap, t = carry
        active = jnp.logical_and(jnp.logical_not(done), t < max_steps)
        f = frames.astype(jnp.float32)[..., None] / 12.0
        mean, _, _ = model.apply(
            params, f, meas, method=model.policy_value
        )
        next_states, out = jax.vmap(
            lambda s, a: env.step(s, a, env_params, "vector")
        )(states, mean)
        newly = jnp.logical_and(out.done, active)

        snap = jax.tree.map(
            lambda old, new: jnp.where(newly, new, old),
            snap,
            {
                "reward": out.total_reward,
                "distance": out.distance_traveled,
                "deviation": out.center_lane_deviation,
                "speed_accum": out.speed_accum,
                "laps": out.laps_completed,
                "steps": out.step_count.astype(jnp.float32),
                "overtakes": out.npc_overtakes,
                "reason": out.termination_reason.astype(jnp.float32),
            },
        )
        done = jnp.logical_or(done, newly)
        states = jax.tree.map(
            lambda old, new: jnp.where(
                active.reshape((-1,) + (1,) * (new.ndim - 1)) if new.ndim > 1
                else active,
                new,
                old,
            ),
            states,
            next_states,
        )
        next_frames, _, next_meas = _render_and_measure(
            states, env_params, pix.cam, config.env_kind
        )
        return (states, next_frames, next_meas, done, snap, t + 1), None

    snap0 = {
        "reward": jnp.zeros(num_envs),
        "distance": jnp.zeros(num_envs),
        "deviation": jnp.zeros(num_envs),
        "speed_accum": jnp.zeros(num_envs),
        "laps": jnp.zeros(num_envs),
        "steps": jnp.zeros(num_envs),
        "overtakes": jnp.zeros(num_envs),
        "reason": jnp.zeros(num_envs),
    }

    def chunk_cond(carry):
        _, _, _, done, _, t = carry
        return jnp.logical_and(t < max_steps, jnp.logical_not(jnp.all(done)))

    def chunk_body(carry):
        carry, _ = jax.lax.scan(step_fn, carry, None, length=chunk)
        return carry

    states, _, _, done, snap, _ = jax.lax.while_loop(
        chunk_cond,
        chunk_body,
        (states, frames0, meas0, jnp.zeros(num_envs, bool), snap0,
         jnp.int32(0)),
    )
    snap = jax.tree.map(
        lambda latched, live: jnp.where(done, latched, live),
        snap,
        {
            "reward": states.total_reward,
            "distance": states.distance_traveled,
            "deviation": states.center_lane_deviation,
            "speed_accum": states.speed_accum,
            "laps": states.laps_completed,
            "steps": states.step_count.astype(jnp.float32),
            "overtakes": states.npc_overtakes,
            # Budget survivors report RUNNING (0): they never terminated.
            "reason": states.termination_reason.astype(jnp.float32),
        },
    )
    return snap, done


@partial(
    jax.jit,
    static_argnames=("model", "config", "pix", "chunk"),
)
def _evaluate_snaps_jit(
    params, env_params, model, keys, track_ids, max_steps, config, pix, chunk
):
    return _evaluate_snaps(
        params, env_params, model, keys, track_ids, max_steps, config, pix,
        chunk,
    )


def evaluate(
    params: Any,
    env_params: EnvParams,
    model: PixelActorCritic,
    rng: Array,
    num_envs: int = 8,
    max_steps: int = 26_000,
    config: PPOConfig = PPOConfig(),
    pix: PixelConfig = PixelConfig(),
    chunk: int = 256,
) -> Dict[str, Array]:
    """Greedy evaluation of a pixel agent (reference: run_eval.py:30-73).

    Mirror of ppo.evaluate for the pixel pipeline: resets with
    is_training=False, acts on the action mean from rendered frames, runs
    as a while_loop of `chunk`-step scans with a DYNAMIC max_steps (no
    per-budget recompiles), exits early once every env finished, and latches
    the first terminal snapshot per env. Aggregation shares
    ppo._evaluate_metrics (identical metric names and executable)."""
    from carla_ppo_tpu.training import ppo as ppo_mod

    keys = jax.random.split(rng, num_envs)
    track_ids, n_tracks = ppo_mod._eval_track_ids(num_envs, env_params, config)
    snap, done = _evaluate_snaps_jit(
        params, env_params, model, keys, track_ids,
        jnp.asarray(max_steps, jnp.int32), config, pix, chunk,
    )
    return ppo_mod._evaluate_metrics(snap, done, track_ids, n_tracks)

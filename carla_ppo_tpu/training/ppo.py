"""PPO: rollout -> GAE -> clipped-surrogate updates, fused into one XLA program.

Re-designs reference: ppo.py + the driver loop in train.py:117-207 for TPU.
The reference interleaves batch-of-1 sess.run policy samples with CARLA RPC
ticks at ~30 steps/s; here `train_iteration` is a single jitted function that
scans the env+policy over the horizon for B vectorized envs, computes GAE, and
runs num_epochs x num_minibatches Adam updates - all without leaving HBM.

Loss parity (reference: ppo.py:115-132):
    ratio        = exp(logpi(a|s;theta) - logpi(a|s;theta_old))
    policy_loss  = mean(min(ratio * A, clip(ratio, 1-eps, 1+eps) * A))
    value_loss   = mean((V - R)^2) * value_scale
    entropy_loss = mean(sum(entropy, -1)) * entropy_scale
    loss         = -policy_loss + value_loss - entropy_loss

theta_old bookkeeping: the reference copies theta -> theta_old after the
rollout, before the epochs (train.py:192; ppo.py:147), so theta_old during the
updates is exactly the rollout policy; we therefore store the rollout log-probs
instead of keeping a second parameter copy and re-running the network
(identical math, half the FLOPs and memory).

LR schedule: exponential decay per iteration, staircase, like the reference's
per-episode decay (ppo.py:142); default decay 1.0 (train.py:225).
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
from carla_ppo_tpu.models.policy import ActorCritic, gaussian_entropy, gaussian_log_prob
from carla_ppo_tpu.ops import gae


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters; defaults = reference CLI defaults (train.py:224-235)."""

    learning_rate: float = 1e-4
    lr_decay: float = 1.0
    discount_factor: float = 0.99
    gae_lambda: float = 0.95
    ppo_epsilon: float = 0.2
    initial_std: float = 1.0
    value_scale: float = 1.0
    entropy_scale: float = 0.01
    horizon: int = 128
    num_epochs: int = 3
    num_envs: int = 1024
    # Vectorized analog of the reference's minibatch 32 over 128 samples:
    # 1/4 of the batch per minibatch, 4 minibatches per epoch.
    num_minibatches: int = 4
    normalize_advantage: bool = True
    # VecNormalize-style reward scaling by running return std (the route
    # config trains with this; BASELINE.json config 3).
    normalize_rewards: bool = False
    obs_fn: str = "vector"
    # Which functional env family to drive: "lap" (CarlaLapEnv analog) or
    # "route" (CarlaRouteEnv analog; reference: train.py:15-20 switches by a
    # module constant).
    env_kind: str = "lap"
    max_grad_norm: float = 0.0  # 0 disables clipping (reference has none)
    use_associative_gae: bool = False
    # Piecewise-constant schedules keyed by ITERATION: ((start, value), ...)
    # pairs sorted ascending by start (the first pair should start at 0).
    # Empty = use learning_rate/lr_decay and entropy_scale as before. These
    # encode multi-phase recipes (e.g. the pixel config's "lr 3e-4, then
    # 1e-4 + entropy 0.002 from iteration 800" - RESULTS_round2.md) so a
    # solve is ONE CLI invocation with no mid-run hand-editing; the phase
    # switch happens inside the compiled program / optimizer schedule and
    # survives checkpoint resume (boundaries count optimizer updates).
    lr_schedule: Tuple[Tuple[int, float], ...] = ()
    entropy_schedule: Tuple[Tuple[int, float], ...] = ()
    # Minibatch shuffling axis. "env" (default) permutes the env axis and
    # keeps each env's horizon contiguous: the gather moves [horizon, D]
    # blocks instead of n scattered rows, which is 2.7x faster at 8192 envs
    # on a v5e (357 -> 134 ms/update; benchmarks/profile_update.py). The
    # reference flat-shuffles, but its buffer is ONE env's 128 steps
    # (train.py:193-207) - with >=256 envs per minibatch the env-axis
    # shuffle is at least as decorrelated as the reference's. "sample"
    # reproduces the flat per-sample permutation.
    minibatch_axis: str = "env"
    # Trust-region early stop: once a minibatch's approx KL(old||new) (k3
    # estimator, measured BEFORE applying that minibatch's update) exceeds
    # this, the remaining updates of the iteration are skipped (branchless:
    # the update is computed but where'd away). 0 disables. This is the
    # structural fix for the post-solve collapse (VERDICT round-2 item 2):
    # on a solved task advantages are noise-dominated and the action std is
    # small, so one noisy batch can produce a single large coherent update
    # off the solved manifold (measured signature at the collapse: mean
    # prob_ratio 0.95, |policy surrogate| 40x normal, value loss spiking to
    # 126 the next iteration); bounding per-iteration divergence prevents
    # the first step of that spiral. The reference has no analog (plain
    # fixed-epoch PPO, ppo.py:218-229).
    kl_target: float = 0.0
    # Advantage signal-to-noise gate (EXPERIMENTAL, off by default): freeze
    # an ENTIRE iteration's updates when std(raw advantages) / std(raw
    # returns) falls below this threshold, BEFORE advantage normalization
    # rescales noise to unit variance. 0 disables (bit-identical).
    # Motivation: round-3 forensics showed the KL guard alone is
    # insufficient post-solve - each iteration's FIRST minibatch always
    # applies (its pre-update KL is ~0 by construction), and ~100 such
    # steps walked a solved 3.00-lap pixel policy into a never-moves
    # attractor while 90%+ of later minibatches were frozen. HONEST STATUS:
    # measured SNR on the lap vector config does NOT separate solved
    # (0.17-0.50) from learning (0.07-0.19) phases, so no universal
    # threshold exists; the production post-solve answer is the Trainer's
    # solve-aware freeze (TrainerSettings.freeze_on_solve), which reuses
    # this gate's freeze plumbing with an eval-based trigger instead.
    adv_snr_min: float = 0.0

    @property
    def updates_per_iteration(self) -> int:
        return self.num_epochs * self.num_minibatches


def _env_module(config: "PPOConfig"):
    return {"lap": lap_env, "route": route_env, "lap_bank": lap_bank_env}[
        config.env_kind
    ]


@dataclasses.dataclass(frozen=True)
class LatentObs:
    """Frozen-VAE latent observation spec (static part).

    When passed to train_iteration/rollout together with the VAE variables,
    observations become z_mean(z_dim) ++ [steer, throttle, speed] computed
    from the on-device camera inside the rollout (the reference's config:
    vae_common.py:33-62 with a frozen VAE).
    """

    vae_model: Any  # VAE (flax Modules hash by config -> valid static arg)
    source: str = "seg"  # "seg" | "rgb"
    measurements: Tuple[str, ...] = ("steer", "throttle", "speed")

    @property
    def obs_dim(self) -> int:
        return self.vae_model.z_dim + len(self.measurements)


def make_obs_fn(latent_obs, vae_variables, config: "PPOConfig"):
    """Batched obs builder: (env_states, env_params) -> [B, obs_dim]."""
    env = _env_module(config)
    if latent_obs is None:
        return jax.vmap(
            lambda s, p: env.observe(s, p, config.obs_fn), in_axes=(0, None)
        )
    from carla_ppo_tpu.models.vae_common import create_encode_batch_fn

    # Batch-level renderer for both seg and rgb sources so the fused Pallas
    # ground kernel can take the whole batch on TPU (rasterizer render_batch /
    # render_batch_banked / render_rgb_batch; the per-env vmapped path cannot
    # dispatch it).
    return create_encode_batch_fn(
        latent_obs.vae_model,
        vae_variables,
        measurements_to_include=latent_obs.measurements,
        banked=config.env_kind in ("route", "lap_bank"),
        source=latent_obs.source,
    )


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    iteration: Array  # [] int32, analog of the episode counter (ppo.py:103)
    train_step: Array  # [] int32, # minibatch updates (ppo.py:101)
    total_env_steps: Array  # [] int64-ish float for logging
    episodes_done: Array  # [] int32 cumulative finished episodes
    rng: Array
    # Scalar running moments for reward normalization. ALWAYS present (a
    # 3-scalar no-op when config.normalize_rewards is off) so the checkpoint
    # pytree structure is identical across configs - models stay loadable by
    # eval/inspect tools and resumable after flag changes.
    reward_norm: Any = None


@struct.dataclass
class Trajectory:
    obs: Array  # [T, B, D]
    actions: Array  # [T, B, A]
    log_probs: Array  # [T, B]
    values: Array  # [T, B]
    rewards: Array  # [T, B]
    dones: Array  # [T, B]


def schedule_value(
    schedule: Tuple[Tuple[int, float], ...], default: float, iteration: Array
) -> Array:
    """Piecewise-constant value of `schedule` at `iteration` (traced scalar);
    falls back to `default` when the schedule is empty."""
    if not schedule:
        return jnp.float32(default)
    val = jnp.float32(schedule[0][1])
    for start, v in schedule[1:]:
        val = jnp.where(iteration >= start, jnp.float32(v), val)
    return val


def make_lr_schedule(config: PPOConfig) -> optax.Schedule:
    """Optimizer lr by UPDATE count: the piecewise `lr_schedule` when set
    (iteration boundaries x updates_per_iteration), else the reference's
    per-iteration exponential decay (ppo.py:142)."""
    if config.lr_schedule:
        return optax.join_schedules(
            [optax.constant_schedule(v) for _, v in config.lr_schedule],
            [int(s) * config.updates_per_iteration for s, _ in config.lr_schedule[1:]],
        )
    return optax.exponential_decay(
        init_value=config.learning_rate,
        transition_steps=config.updates_per_iteration,
        decay_rate=config.lr_decay,
        staircase=True,
    )


def make_optimizer(config: PPOConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(config)
    # Always chain the clip (a no-op at a huge threshold when disabled) so the
    # optimizer-state pytree structure is invariant to max_grad_norm - orbax
    # restore templates built from a default config must match any checkpoint.
    clip = config.max_grad_norm if config.max_grad_norm > 0 else 1e9
    return optax.chain(
        optax.clip_by_global_norm(clip), optax.adam(schedule, eps=1e-8)
    )


def create_train_state(
    model: ActorCritic, config: PPOConfig, obs_dim: int, rng: Array
) -> TrainState:
    params = model.init(rng, jnp.zeros((1, obs_dim), jnp.float32))
    opt_state = make_optimizer(config).init(params)
    from carla_ppo_tpu.ops.running_stats import RunningMoments

    reward_norm = RunningMoments.create()
    return TrainState(
        params=params,
        opt_state=opt_state,
        iteration=jnp.int32(0),
        train_step=jnp.int32(0),
        total_env_steps=jnp.float32(0.0),
        episodes_done=jnp.int32(0),
        rng=rng,
        reward_norm=reward_norm,
    )


def rollout(
    model: ActorCritic,
    params: Any,
    env_states: EnvState,
    env_params: EnvParams,
    rng: Array,
    horizon: int,
    config: PPOConfig,
    latent_obs: Any = None,
    vae_variables: Any = None,
) -> Tuple[EnvState, Trajectory, Array, Dict[str, Array]]:
    """Scan the policy+env for `horizon` steps over the whole env batch.

    Returns (env_states, trajectory, bootstrap_value, episodic_metrics).
    Episodic metrics are means over episodes that *finished* during the
    rollout (the snapshots StepOutput carries at done=True), mirroring the
    per-episode scalars the reference logs (train.py:210-215).

    With `latent_obs` (+ frozen `vae_variables`), each step renders the
    on-device camera and encodes it - camera, VAE, policy, and env fuse into
    the same scan.
    """
    env = _env_module(config)
    obs_builder = make_obs_fn(latent_obs, vae_variables, config)
    obs0 = obs_builder(env_states, env_params)

    def step_fn(carry, key):
        env_states, obs = carry
        action, logp, value = model.sample(params, obs, key)
        env_states, out = jax.vmap(
            lambda s, a: env.autoreset_step(s, a, env_params, config.obs_fn)
        )(env_states, action)
        if latent_obs is not None:
            out = out.replace(obs=obs_builder(env_states, env_params))
        traj = Trajectory(
            obs=obs,
            actions=action,
            log_probs=logp,
            values=value,
            rewards=out.reward,
            dones=out.done.astype(jnp.float32),
        )
        ep = (
            out.done.astype(jnp.float32),
            out.total_reward,
            out.distance_traveled,
            out.speed_accum,
            out.center_lane_deviation,
            out.laps_completed,
            out.step_count.astype(jnp.float32),
            out.npc_overtakes,
        )
        return (env_states, out.obs), (traj, ep)

    keys = jax.random.split(rng, horizon)
    (env_states, last_obs), (traj, ep) = jax.lax.scan(
        step_fn, (env_states, obs0), keys
    )

    _, _, bootstrap_value = model.apply(params, last_obs)

    done_w, ep_rew, ep_dist, ep_speed, ep_dev, ep_laps, ep_len, ep_ot = ep
    n_done = jnp.maximum(done_w.sum(), 1.0)

    def ep_mean(x):
        return (x * done_w).sum() / n_done

    safe_len = jnp.maximum(ep_len, 1.0)
    safe_dev = jnp.maximum(ep_dev, 1e-6)
    episodic = {
        "train/reward": ep_mean(ep_rew),
        "train/distance_traveled": ep_mean(ep_dist),
        "train/average_speed": ep_mean(3.6 * ep_speed / safe_len),
        "train/center_lane_deviation": ep_mean(ep_dev),
        "train/average_center_lane_deviation": ep_mean(ep_dev / safe_len),
        "train/distance_over_deviation": ep_mean(ep_dist / safe_dev),
        "train/laps_completed": ep_mean(ep_laps),
        "train/episode_length": ep_mean(ep_len),
        "train/episodes_finished": done_w.sum(),
        "train/overtakes": ep_mean(ep_ot),
    }
    return env_states, traj, bootstrap_value, episodic


def ppo_loss(
    params: Any,
    model: ActorCritic,
    batch: Dict[str, Array],
    config: PPOConfig,
    entropy_scale: Array | None = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Clipped-surrogate loss on a flat minibatch (reference: ppo.py:115-132).

    `entropy_scale` may be a traced scalar (the entropy_schedule value at the
    current iteration); None uses the static config value.
    """
    if entropy_scale is None:
        entropy_scale = jnp.float32(config.entropy_scale)
    mean, std, value = model.apply(params, batch["obs"])
    logp = gaussian_log_prob(batch["actions"], mean, std)
    log_ratio = logp - batch["log_probs"]
    ratio = jnp.exp(log_ratio)

    adv = batch["advantages"]
    policy_loss = jnp.mean(
        jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1.0 - config.ppo_epsilon, 1.0 + config.ppo_epsilon)
            * adv,
        )
    )
    value_loss = jnp.mean((value - batch["returns"]) ** 2) * config.value_scale
    entropy_loss = jnp.mean(gaussian_entropy(std)) * entropy_scale
    loss = -policy_loss + value_loss - entropy_loss

    metrics = {
        "train_loss/policy": policy_loss,
        "train_loss/value": value_loss,
        "train_loss/entropy": entropy_loss,
        "train_loss/loss": loss,
        "train/prob_ratio": jnp.mean(ratio),
        # Update-health diagnostics (k3 estimator for KL(old||new); see
        # RESULTS_round2.md pixel-collapse investigation).
        "train/approx_kl": jnp.mean(ratio - 1.0 - log_ratio),
        "train/ratio_max": jnp.max(ratio),
        "train/returns": jnp.mean(batch["returns"]),
        "train/advantage": jnp.mean(adv),
        "train_actor/action_0/mean": jnp.mean(mean[:, 0]),
        "train_actor/action_1/mean": jnp.mean(mean[:, 1]),
        "train_actor/action_0/std": std[0],
        "train_actor/action_1/std": std[1],
        "train_actor/action_0/taken_actions": jnp.mean(batch["actions"][:, 0]),
        "train_actor/action_1/taken_actions": jnp.mean(batch["actions"][:, 1]),
    }
    return loss, metrics


def adv_snr_gate(advantages, returns, config, axis_name):
    """(snr, stop0) for the advantage-SNR gate (PPOConfig.adv_snr_min).

    snr = std(raw advantages) / std(raw returns), computed BEFORE advantage
    normalization; stop0 seeds the update scan's freeze flag so a
    noise-dominated iteration applies NO updates at all (the KL guard can't
    gate the first minibatch - its pre-update KL is 0 by construction).
    Under data parallelism the moments are global, so replicas freeze in
    lockstep. Shared by the vector/latent scan (train_iteration_core) and
    the pixel scan (pixels.pixel_train_iteration_core)."""
    import jax.numpy as jnp  # local alias for clarity; module-level jnp exists

    if config.adv_snr_min <= 0:
        return jnp.float32(0.0), jnp.bool_(False)
    if axis_name is None:
        a_var = advantages.var()
        r_var = returns.var()
    else:
        n = jax.lax.psum(jnp.float32(advantages.size), axis_name)

        def gvar(x):
            m = jax.lax.psum(x.sum(), axis_name) / n
            return jax.lax.psum(((x - m) ** 2).sum(), axis_name) / n

        a_var = gvar(advantages)
        r_var = gvar(returns)
    snr = jnp.sqrt(a_var) / (jnp.sqrt(r_var) + 1e-8)
    return snr, snr < config.adv_snr_min


def train_iteration_core(
    train_state: TrainState,
    env_states: EnvState,
    env_params: EnvParams,
    model: ActorCritic,
    config: PPOConfig,
    axis_name: str | None = None,
    latent_obs: Any = None,
    vae_variables: Any = None,
    rollout_model: ActorCritic | None = None,
    freeze: Array | None = None,
) -> Tuple[TrainState, EnvState, Dict[str, Array]]:
    """One fused PPO iteration: rollout(horizon) -> GAE -> epochs of updates.

    With `axis_name` set (inside shard_map/pmap over a device mesh), the env
    batch is the local shard: gradients and statistics are psum'd over the
    axis so every device applies identical updates (the TPU-native analog of
    the all-reduce the reference never had; SURVEY.md section 2.3).

    `rollout_model` optionally substitutes a different COMPUTE configuration
    of the same parameter tree for the rollout (the "mixed" precision
    recipe: a bfloat16-trunk twin acts as the behavior policy while the
    update path stays float32). This is exact importance sampling, not an
    approximation - the stored log-probs are the true behavior-policy
    log-probs of the actions taken, and PPO's ratio corrects the rest.
    """
    rng, roll_key, perm_key = jax.random.split(train_state.rng, 3)
    if axis_name is not None:
        # De-correlate per-device rollouts; keep permutation keys identical so
        # update order stays in lockstep.
        roll_key = jax.random.fold_in(roll_key, jax.lax.axis_index(axis_name))

    env_states, traj, bootstrap, episodic = rollout(
        rollout_model if rollout_model is not None else model,
        train_state.params,
        env_states,
        env_params,
        roll_key,
        config.horizon,
        config,
        latent_obs=latent_obs,
        vae_variables=vae_variables,
    )

    reward_norm = train_state.reward_norm
    rewards = traj.rewards
    if config.normalize_rewards:
        from carla_ppo_tpu.ops import running_stats

        rewards, reward_norm, ret_carry = running_stats.normalize_rewards(
            reward_norm, env_states.vecnorm_return, rewards, traj.dones,
            config.discount_factor,
        )
        env_states = env_states.replace(vecnorm_return=ret_carry)
        if axis_name is not None:
            # Keep the (replicated) moments identical across devices; the
            # per-env return carries stay shard-local in EnvState.
            reward_norm = jax.tree.map(
                lambda x: jax.lax.pmean(x, axis_name), reward_norm
            )

    gae_fn = gae.compute_gae_associative if config.use_associative_gae else gae.compute_gae
    advantages = gae_fn(
        rewards,
        traj.values,
        bootstrap,
        traj.dones,
        config.discount_factor,
        config.gae_lambda,
    )
    returns = advantages + traj.values  # (reference: train.py:176)
    adv_snr, stop0 = adv_snr_gate(advantages, returns, config, axis_name)
    if freeze is not None:
        # Solve-aware freeze (TrainerSettings.freeze_on_solve): a DYNAMIC
        # scalar, so flipping it between iterations never recompiles; the
        # frozen iteration still rolls out (metrics/eval continue) but
        # applies no update - exactly lr=0 without touching the optimizer.
        stop0 = jnp.logical_or(stop0, freeze)
    if config.normalize_advantage:
        if axis_name is None:
            advantages = gae.normalize_advantages(advantages)  # (train.py:177)
        else:
            # Global moments over all devices' shards.
            n_local = jnp.float32(advantages.size)
            n_tot = jax.lax.psum(n_local, axis_name)
            mean = jax.lax.psum(advantages.sum(), axis_name) / n_tot
            var = jax.lax.psum(((advantages - mean) ** 2).sum(), axis_name) / n_tot
            advantages = (advantages - mean) / (jnp.sqrt(var) + 1e-8)

    T, B = traj.rewards.shape
    n = T * B
    # Env-major layout gathers contiguous [T, ...] blocks per env; flat
    # layout gathers n scattered rows (see PPOConfig.minibatch_axis).
    env_axis = config.minibatch_axis == "env" and B % config.num_minibatches == 0
    if env_axis:
        data = {
            "obs": traj.obs.swapaxes(0, 1),
            "actions": traj.actions.swapaxes(0, 1),
            "log_probs": traj.log_probs.swapaxes(0, 1),
            "returns": returns.swapaxes(0, 1),
            "advantages": advantages.swapaxes(0, 1),
        }
        perm_size = B
    else:
        data = {
            "obs": traj.obs.reshape(n, -1),
            "actions": traj.actions.reshape(n, -1),
            "log_probs": traj.log_probs.reshape(n),
            "returns": returns.reshape(n),
            "advantages": advantages.reshape(n),
        }
        perm_size = n

    tx = make_optimizer(config)
    ent_scale = schedule_value(
        config.entropy_schedule, config.entropy_scale, train_state.iteration
    )

    def minibatch_step(carry, idx):
        params, opt_state, stop = carry
        if env_axis:
            # [mb_envs, T, ...] -> flat [mb_envs * T, ...]
            batch = jax.tree.map(
                lambda x: x[idx].reshape((-1,) + x.shape[2:]), data
            )
        else:
            batch = jax.tree.map(lambda x: x[idx], data)
        (_, metrics), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
            params, model, batch, config, ent_scale
        )
        if axis_name is not None:
            # Data-parallel all-reduce over ICI (replaces nothing in the
            # reference - it is single-process; SURVEY.md section 2.3).
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if config.kl_target > 0 or config.adv_snr_min > 0 or freeze is not None:
            # KL-guard (see PPOConfig.kl_target): freeze params once the
            # policy has diverged kl_target from the rollout behavior
            # policy. approx_kl here is this minibatch's PRE-update
            # divergence, so the check gates the current update too; it is
            # already pmean'd, so every device stops in lockstep. The
            # advantage-SNR gate (PPOConfig.adv_snr_min) seeds `stop` at
            # the iteration level through the same freeze machinery.
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

    def epoch_step(carry, key):
        perm = jax.random.permutation(key, perm_size)
        batches = perm.reshape(config.num_minibatches, -1)
        return jax.lax.scan(minibatch_step, carry, batches)

    epoch_keys = jax.random.split(perm_key, config.num_epochs)
    (params, opt_state, _), metrics = jax.lax.scan(
        epoch_step,
        (train_state.params, train_state.opt_state, stop0),
        epoch_keys,
    )

    # Episodic means over all updates of this iteration (the reference
    # averages its tf.metrics.mean over an episode, ppo.py:149-163).
    metrics = jax.tree.map(lambda x: x.mean(), metrics)
    if config.adv_snr_min > 0:
        metrics["train/adv_snr"] = adv_snr
    if axis_name is not None:
        episodic = jax.tree.map(
            lambda x: jax.lax.pmean(x, axis_name), episodic
        )
        episodic["train/episodes_finished"] = (
            episodic["train/episodes_finished"] * jax.lax.axis_size(axis_name)
        )
    metrics.update(episodic)
    if config.lr_schedule:
        lr = schedule_value(
            config.lr_schedule, config.learning_rate, train_state.iteration
        )
    else:
        lr = config.learning_rate * config.lr_decay ** train_state.iteration
    metrics["train/learning_rate"] = lr
    metrics["train/entropy_scale"] = ent_scale

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
        reward_norm=reward_norm,
    )
    return new_state, env_states, metrics


@partial(
    jax.jit, static_argnames=("model", "config", "latent_obs", "rollout_model")
)
def train_iteration(
    train_state: TrainState,
    env_states: EnvState,
    env_params: EnvParams,
    model: ActorCritic,
    config: PPOConfig,
    latent_obs: Any = None,
    vae_variables: Any = None,
    rollout_model: ActorCritic | None = None,
    freeze: Array | None = None,
) -> Tuple[TrainState, EnvState, Dict[str, Array]]:
    """Single-device fused PPO iteration (see train_iteration_core)."""
    return train_iteration_core(
        train_state, env_states, env_params, model, config, axis_name=None,
        latent_obs=latent_obs, vae_variables=vae_variables,
        rollout_model=rollout_model, freeze=freeze,
    )


def _evaluate_snaps(
    params: Any,
    env_params: EnvParams,
    model: ActorCritic,
    keys: Array,
    track_ids: Array | None,
    max_steps: Array,
    config: PPOConfig,
    latent_obs: Any,
    vae_variables: Any,
    chunk: int,
):
    """Per-env greedy-eval core: (snap dict of [n] arrays, done [n]).

    Every env's rollout is a pure function of its own reset key + the
    (replicated) params, so this core is trivially data-parallel: shard the
    keys/track_ids and each device evaluates its slice (make_dp_evaluate) -
    the per-env snaps are bit-identical to a single-device run.
    """
    env = _env_module(config)
    obs_builder = make_obs_fn(latent_obs, vae_variables, config)
    num_envs = keys.shape[0]
    if config.env_kind == "lap_bank":
        states = jax.vmap(
            lambda k, t: env.reset(env_params, k, is_training=False, track_id=t)
        )(keys, track_ids)
    else:
        states = jax.vmap(
            lambda k: env.reset(env_params, k, is_training=False)
        )(keys)
    obs0 = obs_builder(states, env_params)

    def step_fn(carry, _):
        states, obs, done, snap, t = carry
        # Frozen = finished OR past the step budget (budget is dynamic).
        active = jnp.logical_and(jnp.logical_not(done), t < max_steps)
        mean, _, _ = model.apply(params, obs)
        next_states, out = jax.vmap(
            lambda s, a: env.step(s, a, env_params, config.obs_fn)
        )(states, mean)
        if latent_obs is not None:
            out = out.replace(obs=obs_builder(next_states, env_params))
        # Latch the first terminal snapshot per env.
        newly = jnp.logical_and(out.done, active)

        def latch(old, new):
            return jnp.where(newly, new, old)

        snap = jax.tree.map(
            latch,
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
        # Freeze inactive envs (finished or past budget).
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
        obs = jnp.where(active[:, None], out.obs, obs)
        return (states, obs, done, snap, t + 1), None

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
        _, _, done, _, t = carry
        return jnp.logical_and(t < max_steps, jnp.logical_not(jnp.all(done)))

    def chunk_body(carry):
        carry, _ = jax.lax.scan(step_fn, carry, None, length=chunk)
        return carry

    states, _, done, snap, _ = jax.lax.while_loop(
        chunk_cond,
        chunk_body,
        (states, obs0, jnp.zeros(num_envs, bool), snap0, jnp.int32(0)),
    )
    # Envs that never finished: use their live accumulators.
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


@partial(jax.jit, static_argnames=("n_tracks",))
def _evaluate_metrics(
    snap: Dict[str, Array],
    done: Array,
    track_ids: Array | None,
    n_tracks: int,
) -> Dict[str, Array]:
    """Aggregate per-env eval snaps into the reference's metric set
    (train.py:124-129). Its OWN jit program (not fused into the rollout), so
    the single-device and dp paths aggregate with the exact same executable -
    that is what makes dp eval metrics bit-identical, not just close (a
    mean fused into a sharded program reduces in a different order)."""
    steps = jnp.maximum(snap["steps"], 1.0)
    dev = jnp.maximum(snap["deviation"], 1e-6)
    metrics = {
        "eval/reward": snap["reward"].mean(),
        "eval/distance_traveled": snap["distance"].mean(),
        "eval/average_speed": (3.6 * snap["speed_accum"] / steps).mean(),
        "eval/center_lane_deviation": snap["deviation"].mean(),
        "eval/average_center_lane_deviation": (snap["deviation"] / steps).mean(),
        "eval/distance_over_deviation": (snap["distance"] / dev).mean(),
        "eval/laps_completed": snap["laps"].mean(),
        "eval/episode_steps": snap["steps"].mean(),
        "eval/finished": done.astype(jnp.float32).mean(),
        "eval/overtakes": snap["overtakes"].mean(),
        # Per-cause episode counts ([len(TerminationReason)] array; the
        # Trainer's writer flattens it to eval/termination_reasons/<id>).
        # Index order follows envs.types.TerminationReason; budget survivors
        # count under RUNNING (0).
        "eval/termination_reasons": jax.nn.one_hot(
            snap["reason"].astype(jnp.int32),
            len(TerminationReason),
            dtype=jnp.float32,
        ).sum(axis=0),
    }
    if n_tracks:
        # Per-track mean laps (round-robin assignment covers the bank).
        onehot = jax.nn.one_hot(track_ids, n_tracks, dtype=jnp.float32)
        counts = jnp.maximum(onehot.sum(axis=0), 1.0)
        metrics["eval/laps_per_track"] = (snap["laps"] @ onehot) / counts
    return metrics


def _eval_track_ids(num_envs: int, env_params, config: PPOConfig):
    """(track_ids or None, n_tracks): lap_bank evals cover the bank
    round-robin."""
    if config.env_kind == "lap_bank":
        n_tracks = env_params.track.pos.shape[0]
        return jnp.arange(num_envs, dtype=jnp.int32) % n_tracks, n_tracks
    return None, 0


@partial(
    jax.jit,
    static_argnames=("model", "config", "latent_obs", "chunk"),
)
def _evaluate_snaps_jit(
    params, env_params, model, keys, track_ids, max_steps, config,
    latent_obs, vae_variables, chunk,
):
    return _evaluate_snaps(
        params, env_params, model, keys, track_ids, max_steps, config,
        latent_obs, vae_variables, chunk,
    )


def evaluate(
    params: Any,
    env_params: EnvParams,
    model: ActorCritic,
    rng: Array,
    num_envs: int = 1,
    max_steps: int = 3000,
    config: PPOConfig = PPOConfig(),
    latent_obs: Any = None,
    vae_variables: Any = None,
    chunk: int = 256,
) -> Dict[str, Array]:
    """Greedy evaluation episode(s) (reference: run_eval.py:30-73).

    Resets with is_training=False (spawn at route start), acts with the action
    mean (std=0), runs until done, returns the eval metric set the reference
    logs (train.py:124-129).

    Compiled as a `while_loop` over `chunk`-step scans with `max_steps` as a
    DYNAMIC operand: changing max_steps never recompiles (only num_envs /
    chunk do), and the loop exits early once every env has finished - a 26k
    step budget costs only as many chunks as the slowest env actually needs.

    lap_bank envs are assigned bank tracks round-robin, so one eval covers
    every track; `eval/laps_per_track` (an [n_tracks] array) reports each
    track's mean laps alongside the scalar means.

    Multi-device runs: see parallel.train_dp.make_dp_evaluate - same core,
    keys sharded over the mesh, bit-identical metrics.
    """
    keys = jax.random.split(rng, num_envs)
    track_ids, n_tracks = _eval_track_ids(num_envs, env_params, config)
    snap, done = _evaluate_snaps_jit(
        params, env_params, model, keys, track_ids,
        jnp.asarray(max_steps, jnp.int32), config, latent_obs, vae_variables,
        chunk,
    )
    return _evaluate_metrics(snap, done, track_ids, n_tracks)


def init_env_batch(
    env_params: EnvParams,
    num_envs: int,
    rng: Array,
    env_kind: str = "lap",
) -> EnvState:
    if env_kind == "lap_bank":
        return lap_bank_env.init_env_batch(env_params, num_envs, rng)
    env = {"lap": lap_env, "route": route_env}[env_kind]
    keys = jax.random.split(rng, num_envs)
    return jax.vmap(lambda k: env.reset(env_params, k))(keys)

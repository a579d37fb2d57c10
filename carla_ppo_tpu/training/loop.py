"""Training orchestration: the host-side loop around the fused iteration.

Re-designs reference: train.py:23-216. What the reference does once per
episode (eval every `eval_interval`, checkpoint on best eval reward,
TensorBoard scalars, videos of greedy episodes) happens here once per
*iteration* (one fused rollout+update over the whole env batch); counters
live inside the checkpointed TrainState so resume continues numbering
transparently (reference: ppo.py:101-103, train.py:107-118).
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from carla_ppo_tpu.envs import route_env, route_planner, track as track_mod
from carla_ppo_tpu.envs.observations import vector_obs_dim
from carla_ppo_tpu.envs.types import EnvParams
from carla_ppo_tpu.models.policy import ActorCritic
from carla_ppo_tpu.training import ppo
from carla_ppo_tpu.utils.checkpoint import Checkpointer
from carla_ppo_tpu.utils.metrics import MetricsWriter


@dataclasses.dataclass
class TrainerSettings:
    """Driver-level knobs (reference CLI: train.py:218-266)."""

    model_name: str = "ppo_lap"
    models_root: str = "models"
    num_iterations: int = 0  # <= 0: train forever (train.py:235 num_episodes)
    eval_interval: int = 5  # iterations between evals (train.py:258)
    record_eval: bool = False  # host video rendering (train.py:259-261)
    eval_envs: int = 4
    # The lap episode only terminates after 3 laps (~3.5 km); a too-small cap
    # truncates eval episodes of a slow-but-stable policy and under-reports
    # laps/reward. 26k steps covers 3 laps at 15+ km/h.
    eval_max_steps: int = 26_000
    checkpoint_interval: int = 25  # periodic safety checkpoint
    seed: int = 0
    track_seed: int = 0
    # Multi-chip data parallelism: shard the env batch over this many devices
    # (shard_map + psum over ICI). 1 = single device; <= 0 = all attached
    # devices (SURVEY.md section 2.3 "Multi-chip scaling" - an owned
    # component the reference has no analog of).
    num_devices: int = 1
    # lap_bank (config 5): number of domain-randomized tracks in the bank.
    num_tracks: int = 16
    # Scene richness: bake roadside props (13-class world) into the track and
    # spawn NPC traffic. Props only affect rendered observations; NPCs add
    # real vehicle-vehicle collisions (terminate_on_collision turns on with
    # num_npcs > 0 so hitting one actually ends the episode).
    rich_scene: bool = True
    num_npcs: int = 0
    # NPC cruise-speed range (m/s); per-NPC speeds draw uniformly at reset.
    npc_min_speed: float = 4.0
    npc_max_speed: float = 7.0
    fps: int = 30
    action_smoothing: float = 0.0  # train.py:247 default
    reward_fn: str = "reward_speed_centering_angle_multiply"
    # Observation pipeline: "vector" (ground-truth state), "latent"
    # (frozen-VAE z ++ measurements, config 2), or "pixels" (end-to-end conv
    # policy with joint-VAE auxiliary training, config 4). None = infer:
    # latent when vae_model is set, else vector. The reference selects its
    # pipeline the same way - one driver, observation injected at
    # construction (train.py:69-76).
    obs: Optional[str] = None
    # VAE latent observations (config 2): path to a trained VAE model dir.
    vae_model: Optional[str] = None
    vae_model_type: Optional[str] = None
    vae_z_dim: Optional[int] = None
    vae_source: str = "seg"
    # Pixel pipeline (config 4) knobs.
    vae_scale: float = 1e-4  # joint-VAE auxiliary loss weight
    # De-prop auxiliary target (pixels): reconstruct the plain ground-only
    # scene instead of the rich input (training/pixels.PixelConfig).
    deprop_aux: bool = False
    # Trained VAE model dir to initialize the pixel agent's encoder/z-heads/
    # decoder from (fresh runs only; resumes keep their checkpoint).
    warm_start_vae: Optional[str] = None
    # Compute dtype for the policy/value MLP matmuls. Params and the
    # Gaussian log-prob/entropy math stay float32 (ActorCritic casts its
    # outputs back), so checkpoints are dtype-invariant; bfloat16 keeps the
    # big-batch update matmuls on the MXU's fast path (~1.5x at 8192 envs,
    # benchmarks/profile_update.py --dtype bfloat16). "mixed" = bfloat16
    # ROLLOUT (behavior policy + frozen VAE encoder ride the fast path) with
    # a float32 UPDATE - exact importance sampling, so it keeps f32's
    # convergence quality while shedding most of bf16's speed win's cost
    # (pure bf16 plateaus ~2.4-2.8 laps where f32 reaches 3.00;
    # RESULTS_round2.md). Round 3 made "mixed" the CLI default after the
    # 3.00-lap solve reproduced twice with the KL guard (VERDICT item 4:
    # "making bf16 the safe default"); this library-level default stays
    # float32 so programmatic TrainerSettings keep reference semantics.
    policy_dtype: str = "float32"
    # Solve-aware training freeze: after this many CONSECUTIVE evals at
    # >= solve_laps laps, iterations stop applying updates (the freeze seeds
    # the update scan's stop flag - rollouts, metrics and evals continue and
    # the policy holds bit-exactly); any later eval below the bar unfreezes
    # and training resumes. 0 = off. This is the production post-solve
    # answer (round-3 forensics: the KL guard alone cannot stop drift - the
    # first minibatch of every iteration applies unconditionally, and on a
    # solved task those updates are pure noise; see PPOConfig.kl_target /
    # adv_snr_min). Not persisted: a resume re-earns the streak, engaging
    # again after freeze_on_solve evals. The reference has no analog (it
    # relies on keep-best-checkpoint alone, train.py:130-132).
    freeze_on_solve: int = 0
    solve_laps: float = 3.0
    # Solve bar metric for freeze_on_solve: "laps" (eval laps_completed -
    # routes_completed on the route env rides the same slot), "distance"
    # (eval distance_traveled >= solve_distance; the route config's 3000 m
    # budget is distance-keyed, carla_route_env.py:381-383), or "auto":
    # distance for route, laps otherwise.
    solve_metric: str = "auto"
    solve_distance: float = 2995.0
    # Best-checkpoint ranking: "progress" = (laps, reward), the round-2
    # criterion; "finished_first" = (finished, laps, reward), which ranks
    # any eval that actually CONCLUDED its episodes (finished, crashed, or
    # hit the distance budget) above budget-survivors - killing the
    # slow-crawler artifact where a 13.8 km/h NPC-follower out-"laps" fast
    # imperfect drivers by farming the whole 26k-step eval budget
    # (RESULTS_round3.md, traffic_npc_r3). A true solve terminates its
    # episode, so the final ranking is unchanged; only crawlers demote.
    best_key: str = "progress"
    # Reward-shape overrides (None = RewardParams defaults). The traffic
    # configs need the speed-reward plateau ABOVE NPC cruise pace: with the
    # default trapezoid (full reward on [15, 20] km/h) and NPCs at
    # 14.4-25.2 km/h, following the slowest NPC already earns the maximum
    # speed reward and overtaking is pure collision risk (round-4 finding).
    reward_min_speed: Optional[float] = None
    reward_target_speed: Optional[float] = None
    reward_max_speed: Optional[float] = None
    pass_bonus: Optional[float] = None
    # Blocked-reward gate (RewardParams.blocked_scale/block_range): scale the
    # positive shaping terms while queued in-lane behind an NPC. The round-5
    # anti-pacing lever - raising the speed plateau alone (above) measurably
    # did NOT defeat pacing (round-4 fine-tunes: 0.0 overtakes at best).
    blocked_scale: Optional[float] = None
    block_range: Optional[float] = None
    # Speed floor (km/h; RewardParams.low_speed_threshold, stored in m/s).
    # The round-5 structural anti-pacing lever: with a positive per-step
    # shaping reward, total return is ~reward_rate x episode LENGTH, so a
    # slow finisher out-earns a fast one as long as it fits the step budget
    # - the r5 overtaker run converged to 15 km/h cruising, BELOW the
    # slowest NPC (never blocked, never passing, 3.00 laps, 0.0 overtakes,
    # 69k reward vs ~37k for driving the plateau). Reward shaping cannot fix
    # that ordering; termination can: a floor above npc_max_speed makes
    # "keep up with traffic or the episode ends" part of the task, so the
    # only surviving policies overtake. The low-speed grace period
    # (RewardParams.low_speed_timeout, 5 s) still covers the standing start.
    low_speed_threshold: Optional[float] = None
    # NPC lane keeping (EnvParams.npc_keep_lat/npc_keep_gain): spring pulling
    # each NPC's lateral wander toward a home offset. Defaults preserve the
    # round-4 free walk; overtaker configs use a keep-right home so a
    # passing corridor reliably exists.
    npc_keep_lat: float = 0.0
    npc_keep_gain: float = 0.0
    # Stall watchdog: exit the process (code utils.watchdog.STALL_EXIT_CODE)
    # when no iteration completes for this many seconds - the recovery for
    # the axon platform's occasional wedged-RPC futex hang (ROADMAP item 7;
    # scripts/train_unattended.sh relaunches and training auto-resumes).
    # 0 = off.
    stall_timeout_s: float = 0.0
    # Route env: probability a training reset spawns just before a junction
    # (EnvParams.junction_spawn_prob; failure-driven junction curriculum).
    junction_spawn_prob: float = 0.0
    # Generalization eval (route / lap_bank configs; round-4 VERDICT item 5:
    # nothing measured whether the route agent memorized its bank). Every
    # heldout_eval-th eval additionally evaluates on NEVER-TRAINED worlds:
    #   eval_heldout/*      route: a fresh route bank (disjoint route seed)
    #                       in the SAME town; lap_bank: a bank of unseen
    #                       track seeds.
    #   eval_unseen_town/*  route only: a route bank from a DIFFERENT town.
    # 0 disables. The reference's analog is its per-reset fresh A* routes
    # (carla_route_env.py:213-240) - it never trains on a fixed pool, so
    # generalization is implicit there and must be measured here.
    heldout_eval: int = 1
    # Seed offset for the held-out worlds (any value whose banks are
    # disjoint from track_seed's).
    heldout_seed_offset: int = 4097


class Trainer:
    def __init__(
        self,
        settings: TrainerSettings,
        config: ppo.PPOConfig,
        restart: bool = False,
        env_params: Optional[EnvParams] = None,
    ):
        self.settings = settings
        self.config = config

        self.model_dir = os.path.join(settings.models_root, settings.model_name)
        if restart and os.path.isdir(self.model_dir):
            shutil.rmtree(self.model_dir)  # (reference: train.py:107-110)
        self.checkpoint_dir = os.path.join(self.model_dir, "checkpoints")
        self.log_dir = os.path.join(self.model_dir, "logs")
        self.video_dir = os.path.join(self.model_dir, "videos")
        for d in (self.checkpoint_dir, self.log_dir, self.video_dir):
            os.makedirs(d, exist_ok=True)

        # Env params.
        env_common = dict(
            dt=1.0 / settings.fps,
            action_smoothing=settings.action_smoothing,
            reward_fn=settings.reward_fn,
            num_npcs=settings.num_npcs,
            npc_min_speed=jnp.float32(settings.npc_min_speed),
            npc_max_speed=jnp.float32(settings.npc_max_speed),
            terminate_on_collision=settings.num_npcs > 0,
            render_npc_billboards=settings.num_npcs > 0,
            npc_keep_lat=jnp.float32(settings.npc_keep_lat),
            npc_keep_gain=jnp.float32(settings.npc_keep_gain),
            junction_spawn_prob=jnp.float32(settings.junction_spawn_prob),
        )
        rp_overrides = {
            k: jnp.float32(v)
            for k, v in dict(
                min_speed=settings.reward_min_speed,
                target_speed=settings.reward_target_speed,
                max_speed=settings.reward_max_speed,
                pass_bonus=settings.pass_bonus,
                blocked_scale=settings.blocked_scale,
                block_range=settings.block_range,
                # Settings keep the reference's km/h convention; the
                # RewardParams field is m/s (compared against vehicle.speed).
                low_speed_threshold=(
                    settings.low_speed_threshold / 3.6
                    if settings.low_speed_threshold is not None
                    else None
                ),
            ).items()
            if v is not None
        }
        self._heldout_params: Dict[str, EnvParams] = {}
        off = settings.heldout_seed_offset
        if env_params is not None:
            self.env_params = env_params
        elif config.env_kind == "route":
            town = route_planner.make_town(seed=settings.track_seed)
            bank = route_planner.make_route_bank(
                town, seed=settings.track_seed, props=settings.rich_scene
            )
            self.env_params = route_env.route_env_params(bank, **env_common)
            if settings.heldout_eval > 0:
                # Same town, never-trained routes (disjoint route seed)...
                ho = route_planner.make_route_bank(
                    town, seed=settings.track_seed + off,
                    props=settings.rich_scene,
                )
                self._heldout_params["eval_heldout"] = (
                    route_env.route_env_params(ho, **env_common)
                )
                # ...and a different town entirely.
                town2 = route_planner.make_town(seed=settings.track_seed + off)
                ho2 = route_planner.make_route_bank(
                    town2, seed=settings.track_seed + off,
                    props=settings.rich_scene,
                )
                self._heldout_params["eval_unseen_town"] = (
                    route_env.route_env_params(ho2, **env_common)
                )
        elif config.env_kind == "lap_bank":
            from carla_ppo_tpu.envs import lap_bank_env

            bank = lap_bank_env.make_lap_bank(
                n_tracks=settings.num_tracks,
                base_seed=settings.track_seed,
                props=settings.rich_scene,
            )
            self.env_params = lap_bank_env.lap_bank_params(bank, **env_common)
            if settings.heldout_eval > 0:
                ho = lap_bank_env.make_lap_bank(
                    n_tracks=settings.num_tracks,
                    base_seed=settings.track_seed + off,
                    props=settings.rich_scene,
                )
                self._heldout_params["eval_heldout"] = (
                    lap_bank_env.lap_bank_params(ho, **env_common)
                )
        else:
            self.env_params = EnvParams(
                track=track_mod.make_lap_track(
                    seed=settings.track_seed, props=settings.rich_scene
                ),
                **env_common,
            )

        # Reward-shape overrides compose with whatever reward the resolved
        # env_params carries (incl. a caller-supplied env_params, whose
        # overrides used to be silently dropped - round-4 advisor finding)
        # instead of replacing it with a fresh RewardParams.
        if rp_overrides:
            self.env_params = self.env_params.replace(
                reward=self.env_params.reward.replace(**rp_overrides)
            )
            self._heldout_params = {
                k: p.replace(reward=p.reward.replace(**rp_overrides))
                for k, p in self._heldout_params.items()
            }

        # Observations: ground-truth vector, frozen-VAE latent, or pixels.
        self.obs_mode = settings.obs or (
            "latent" if settings.vae_model else "vector"
        )
        if self.obs_mode not in ("vector", "latent", "pixels"):
            raise ValueError(f"unknown obs mode {self.obs_mode!r}")
        if self.obs_mode == "latent" and not settings.vae_model:
            raise ValueError("--obs latent requires --vae_model")
        self.latent_obs = None
        self.vae_variables = None
        self.pix = None
        if self.obs_mode == "pixels":
            from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
            from carla_ppo_tpu.training import pixels as pixels_mod

            self._pixels = pixels_mod
            self.pix = pixels_mod.PixelConfig(
                vae_scale=settings.vae_scale, deprop_aux=settings.deprop_aux
            )
            self.model = PixelActorCritic(initial_std=config.initial_std)
            rng = jax.random.PRNGKey(settings.seed)
            self.train_state = pixels_mod.create_pixel_train_state(
                self.model, config, rng, self.pix
            )
            self.env_states = ppo.init_env_batch(
                self.env_params, config.num_envs, rng, env_kind=config.env_kind
            )
        elif self.obs_mode == "latent":
            from carla_ppo_tpu.models import vae_common

            # policy_dtype doubles as the compute dtype of the frozen VAE
            # encoder in the rollout (one precision knob for the whole
            # inference stack; checkpoints stay float32 either way). The
            # encoder only ever runs in the rollout, so "mixed" puts it in
            # bfloat16 with the behavior policy.
            vae_dtype = (
                jnp.bfloat16
                if settings.policy_dtype == "mixed"
                else jnp.dtype(settings.policy_dtype)
            )
            vae, vae_vars = vae_common.load_vae(
                settings.vae_model,
                settings.vae_z_dim,
                settings.vae_model_type,
                dtype=vae_dtype,
            )
            self.latent_obs = ppo.LatentObs(vae_model=vae, source=settings.vae_source)
            self.vae_variables = vae_vars
            obs_dim = self.latent_obs.obs_dim
        else:
            from carla_ppo_tpu.envs.observations import obs_dim_for

            obs_dim = obs_dim_for(config.obs_fn)

        self.rollout_model = None
        if self.obs_mode != "pixels":
            mixed = settings.policy_dtype == "mixed"
            update_dtype = jnp.float32 if mixed else jnp.dtype(settings.policy_dtype)
            self.model = ActorCritic(
                initial_std=config.initial_std, dtype=update_dtype
            )
            if mixed:
                # Behavior-policy twin: same params, bfloat16 trunk compute.
                self.rollout_model = ActorCritic(
                    initial_std=config.initial_std, dtype=jnp.bfloat16
                )
            rng = jax.random.PRNGKey(settings.seed)
            self.train_state = ppo.create_train_state(
                self.model, config, obs_dim, rng
            )
            self.env_states = ppo.init_env_batch(
                self.env_params, config.num_envs, rng, env_kind=config.env_kind
            )

        # Device mesh: data-parallel sharding of the env batch over chips.
        self.mesh = None
        self._dp_evaluate = None  # built lazily on first dp eval
        n_dev = settings.num_devices
        if n_dev <= 0:
            n_dev = len(jax.devices())
        if n_dev > 1:
            from carla_ppo_tpu.parallel import train_dp
            from carla_ppo_tpu.parallel.mesh import make_mesh

            if config.num_envs % n_dev:
                raise ValueError(
                    f"num_envs={config.num_envs} not divisible by "
                    f"num_devices={n_dev}"
                )
            self.mesh = make_mesh(n_dev)
            self._train_dp = train_dp
            wf = settings.freeze_on_solve > 0
            if self.obs_mode == "pixels":
                self._dp_iteration = train_dp.make_dp_pixel_train_iteration(
                    self.mesh, self.model, config, self.env_params,
                    pix=self.pix, with_freeze=wf,
                )
            else:
                self._dp_iteration = train_dp.make_dp_train_iteration(
                    self.mesh,
                    self.model,
                    config,
                    self.env_params,
                    latent_obs=self.latent_obs,
                    vae_variables=self.vae_variables,
                    rollout_model=self.rollout_model,
                    with_freeze=wf,
                )
            self.env_states = train_dp.shard_env_batch(self.env_states, self.mesh)
            self.train_state = train_dp.replicate(self.train_state, self.mesh)

        # Two checkpoint streams: `checkpoints/` holds best-eval models only
        # (the reference's save-on-best behavior, train.py:130-132);
        # `autosave/` holds periodic crash-recovery snapshots. They must be
        # separate managers or the periodic saves garbage-collect the best.
        self.checkpointer = Checkpointer(self.checkpoint_dir)
        self.autosaver = Checkpointer(os.path.join(self.model_dir, "autosave"))
        restored = None
        for ck in (self.autosaver, self.checkpointer):
            candidate = ck.restore_latest(self.train_state)
            if candidate is not None and (
                restored is None
                or int(candidate.iteration) > int(restored.iteration)
            ):
                restored = candidate
        if restored is not None:
            self.train_state = restored  # resume (reference: train.py:111-113)
            if self.mesh is not None:  # restored arrays are single-device
                self.train_state = self._train_dp.replicate(
                    self.train_state, self.mesh
                )
        elif self.obs_mode == "pixels" and settings.warm_start_vae:
            from carla_ppo_tpu.models import vae_common

            _, vae_vars = vae_common.load_vae(settings.warm_start_vae)
            self.train_state = self._pixels.warm_start_from_vae(
                self.train_state, vae_vars
            )
            if self.mesh is not None:
                self.train_state = self._train_dp.replicate(
                    self.train_state, self.mesh
                )
            print(
                f"warm-started perception from {settings.warm_start_vae}",
                flush=True,
            )

        self.writer = MetricsWriter(self.log_dir)
        hparams = {**dataclasses.asdict(settings), **dataclasses.asdict(config)}
        self.writer.write_hparams(hparams)

        # The best-eval score persists in a sidecar (best_score.json): a
        # resumed run must NOT reset it, or the best-only checkpoint stream
        # admits post-resume entries that are worse than the historical
        # best and run_eval's "best" (= newest best-stream entry) regresses
        # (observed round 3: a resume saved a 1.66-route eval over the
        # original run's 1.82).
        self._best_score_path = os.path.join(self.model_dir, "best_score.json")
        score_len = {"finished_first": 3, "finished_overtakes": 4}.get(
            settings.best_key, 2
        )
        self.best_eval_score = (-float("inf"),) * score_len
        if os.path.exists(self._best_score_path):
            try:
                import json as _json

                with open(self._best_score_path) as f:
                    loaded = tuple(_json.load(f))
                if len(loaded) == score_len:
                    self.best_eval_score = loaded
                else:
                    print(
                        f"best_score.json has {len(loaded)} components but "
                        f"best_key={settings.best_key!r} ranks by {score_len};"
                        " starting the best-checkpoint bar fresh",
                        flush=True,
                    )
            except (ValueError, OSError):
                pass
        # Solve bar metric ("auto": the route config's solve is its 3000 m
        # distance budget; everything else is laps-keyed).
        self._solve_metric = settings.solve_metric
        if self._solve_metric == "auto":
            self._solve_metric = (
                "distance" if config.env_kind == "route" else "laps"
            )
        if self._solve_metric not in ("laps", "distance"):
            raise ValueError(f"unknown solve_metric {settings.solve_metric!r}")
        # Solve-aware freeze state (host-side, not checkpointed).
        self._solve_streak = 0
        self._frozen = False
        self._eval_rng = jax.random.PRNGKey(settings.seed + 1)
        self._eval_count = 0
        self._nan_events = 0
        self._watchdog = None
        if settings.stall_timeout_s > 0:
            from carla_ppo_tpu.utils.watchdog import StallWatchdog

            self._watchdog = StallWatchdog(settings.stall_timeout_s)

    @property
    def iteration(self) -> int:
        return int(self.train_state.iteration)

    def evaluate(self) -> Dict[str, float]:
        # Fresh key per eval: with randomized spawns enabled, reusing one key
        # would score every eval on the same spawn draw and best-checkpoint
        # selection would overfit to it.
        self._eval_rng, eval_key = jax.random.split(self._eval_rng)
        if self.obs_mode == "pixels":
            if (
                self.mesh is not None
                and self.settings.eval_envs % self.mesh.devices.size == 0
            ):
                if self._dp_evaluate is None:
                    from carla_ppo_tpu.parallel.train_dp import (
                        make_dp_pixel_evaluate,
                    )

                    self._dp_evaluate = make_dp_pixel_evaluate(
                        self.mesh,
                        self.model,
                        self.config,
                        self.env_params,
                        num_envs=self.settings.eval_envs,
                        pix=self.pix,
                    )
                metrics = self._dp_evaluate(
                    self.train_state.params,
                    eval_key,
                    self.settings.eval_max_steps,
                )
            else:
                metrics = self._pixels.evaluate(
                    self.train_state.params,
                    self.env_params,
                    self.model,
                    eval_key,
                    num_envs=self.settings.eval_envs,
                    max_steps=self.settings.eval_max_steps,
                    config=self.config,
                    pix=self.pix,
                )
        elif (
            self.mesh is not None
            and self.settings.eval_envs % self.mesh.devices.size == 0
        ):
            # dp eval: shard the eval envs over the mesh (VERDICT round-3
            # item 7 - the dp story no longer stops at train_iteration).
            # Discrete outcomes match the single-device path exactly; float
            # metrics to last-ULP (make_dp_evaluate docstring).
            if self._dp_evaluate is None:
                from carla_ppo_tpu.parallel.train_dp import make_dp_evaluate

                self._dp_evaluate = make_dp_evaluate(
                    self.mesh,
                    self.model,
                    self.config,
                    self.env_params,
                    num_envs=self.settings.eval_envs,
                    latent_obs=self.latent_obs,
                    vae_variables=self.vae_variables,
                )
            metrics = self._dp_evaluate(
                self.train_state.params,
                eval_key,
                self.settings.eval_max_steps,
            )
        else:
            metrics = ppo.evaluate(
                self.train_state.params,
                self.env_params,
                self.model,
                eval_key,
                num_envs=self.settings.eval_envs,
                max_steps=self.settings.eval_max_steps,
                config=self.config,
                latent_obs=self.latent_obs,
                vae_variables=self.vae_variables,
            )
        # Generalization evals on never-trained worlds (route/lap_bank; see
        # TrainerSettings.heldout_eval). Single-device on purpose: the
        # held-out banks are operands to the already-compiled evaluate
        # program, and eval_envs is small.
        self._eval_count += 1
        if (
            self._heldout_params
            and self.settings.heldout_eval > 0
            and self._eval_count % self.settings.heldout_eval == 0
        ):
            for prefix, hp in self._heldout_params.items():
                if self.obs_mode == "pixels":
                    hm = self._pixels.evaluate(
                        self.train_state.params, hp, self.model, eval_key,
                        num_envs=self.settings.eval_envs,
                        max_steps=self.settings.eval_max_steps,
                        config=self.config, pix=self.pix,
                    )
                else:
                    hm = ppo.evaluate(
                        self.train_state.params, hp, self.model, eval_key,
                        num_envs=self.settings.eval_envs,
                        max_steps=self.settings.eval_max_steps,
                        config=self.config, latent_obs=self.latent_obs,
                        vae_variables=self.vae_variables,
                    )
                metrics.update(
                    {k.replace("eval/", prefix + "/"): v for k, v in hm.items()}
                )

        # Expand array-valued metrics (e.g. eval/laps_per_track for lap_bank)
        # into one scalar per element so the writer sees flat scalars.
        flat: Dict[str, float] = {}
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                flat[k] = float(arr)
            else:
                for i, x in enumerate(arr.ravel()):
                    flat[f"{k}/{i}"] = float(x)
        return flat

    def record_eval_video(self, filename: str, max_steps: int = 1500) -> float:
        """Greedy episode through the interactive env, rendered to video
        (reference: run_eval.py:30-73). Returns the episode reward."""
        from carla_ppo_tpu.training.eval_host import run_eval
        from carla_ppo_tpu.envs.gym_api import CarlaLapEnv, CarlaRouteEnv

        if not hasattr(self, "_video_env"):
            cls = CarlaRouteEnv if self.config.env_kind == "route" else CarlaLapEnv
            os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
            self._video_env = cls(
                obs_res=(160, 80),
                encode_state_fn="vector" if self.latent_obs is None else None,
                action_smoothing=self.settings.action_smoothing,
                fps=self.settings.fps,
                track_seed=self.settings.track_seed,
                reward_fn=self.settings.reward_fn,
            )
        return run_eval(
            self._video_env,
            self._predict_fn(),
            video_filename=filename,
            max_steps=max_steps,
        )

    def _predict_fn(self):
        model, params = self.model, self.train_state.params
        latent = self.latent_obs
        vae_vars = self.vae_variables

        if self.obs_mode == "pixels":
            from carla_ppo_tpu.envs.observations import measurements as measure_fn
            from carla_ppo_tpu.ops import rasterizer

            pix = self.pix

            @jax.jit
            def predict_px(state, env_params):
                cls = rasterizer.render_semantic(state, env_params, pix.cam)
                f = cls.astype(jnp.float32)[None, ..., None] / 12.0
                meas = measure_fn(state)[None]
                mean, _, value = model.apply(
                    params, f, meas, method=model.policy_value
                )
                return mean[0], value[0]

            def fn(env):
                p = env.params
                if self.config.env_kind == "route":
                    p = p.replace(
                        track=route_env.route_track(p.track, env.state.route_id)
                    )
                a, v = predict_px(env.state, p)
                return np.asarray(a), float(v)

            return fn

        if latent is None:
            from carla_ppo_tpu.envs import lap_env as le

            obs_fn = self.config.obs_fn

            @jax.jit
            def predict(state, env_params):
                obs = le.observe(state, env_params, obs_fn)
                mean, _, value = model.apply(params, obs[None])
                return mean[0], value[0]

            def fn(env):
                p = env.params
                if self.config.env_kind == "route":
                    p = p.replace(
                        track=route_env.route_track(p.track, env.state.route_id)
                    )
                a, v = predict(env.state, p)
                return np.asarray(a), float(v)

            return fn

        from carla_ppo_tpu.models.vae_common import create_encode_state_fn

        encode = create_encode_state_fn(
            latent.vae_model, vae_vars, source=latent.source
        )

        @jax.jit
        def predict_latent(state, env_params):
            obs = encode(state, env_params)
            mean, _, value = model.apply(params, obs[None])
            return mean[0], value[0]

        def fn(env):
            p = env.params
            if self.config.env_kind == "route":
                p = p.replace(
                    track=route_env.route_track(p.track, env.state.route_id)
                )
            a, v = predict_latent(env.state, p)
            return np.asarray(a), float(v)

        return fn

    def train(self, num_iterations: Optional[int] = None) -> Dict[str, float]:
        """Main loop (reference: train.py:117-216). Returns last metrics."""
        target = num_iterations or self.settings.num_iterations
        metrics: Dict[str, float] = {}
        while target <= 0 or self.iteration < target:
            it = self.iteration
            if self._watchdog is not None:
                self._watchdog.beat()

            # eval_interval <= 0 disables periodic eval entirely (the
            # reference has no such switch; useful for pure-throughput runs).
            ei = self.settings.eval_interval
            if ei > 0 and it % ei == 0:
                eval_metrics = self.evaluate()
                if self._watchdog is not None:
                    self._watchdog.beat()  # evals can legitimately take long
                self.writer.write_scalars(eval_metrics, it)
                eval_reward = eval_metrics["eval/reward"]
                print(
                    f"Iteration {it} (step {int(self.train_state.train_step)}): "
                    f"eval reward {eval_reward:.1f}, "
                    f"distance {eval_metrics['eval/distance_traveled']:.0f} m, "
                    f"laps {eval_metrics['eval/laps_completed']:.2f}",
                    flush=True,
                )  # (reference prints per episode, train.py:138)
                if self.settings.record_eval:
                    video = os.path.join(self.video_dir, f"iteration{it}.avi")
                    self.record_eval_video(video)
                    if self._watchdog is not None:
                        # Cold-compile video renders can legitimately take
                        # minutes on the remote path, same as evals.
                        self._watchdog.beat()
                # Best-checkpoint criterion: task completion first, reward as
                # the tie-breaker. The reference keys on reward alone
                # (train.py:130-132), but completing the task ENDS the
                # episode, capping its reward below an almost-done episode
                # that farms per-step reward for the whole eval budget - a
                # reward-only rule would keep the non-finisher.
                progress = round(eval_metrics.get("eval/laps_completed", 0.0), 2)
                if self.settings.best_key == "finished_first":
                    # Concluded episodes outrank budget-survivors (see the
                    # best_key docstring; kills the slow-crawler artifact).
                    eval_score = (
                        round(eval_metrics.get("eval/finished", 0.0), 2),
                        progress,
                        eval_reward,
                    )
                elif self.settings.best_key == "finished_overtakes":
                    # Traffic configs: reward-as-tiebreaker prefers SLOW
                    # finishers (per-step reward is positive, so a pacing
                    # agent farms more steps per lap than an overtaking
                    # one); rank completed overtakes ahead of it so the
                    # best checkpoint is the agent that actually passes
                    # traffic (round-4 finding: a car-following fine-tune
                    # solved 3.00 laps with 0.0 overtakes by queueing NPCs
                    # behind itself).
                    eval_score = (
                        round(eval_metrics.get("eval/finished", 0.0), 2),
                        progress,
                        round(eval_metrics.get("eval/overtakes", 0.0), 2),
                        eval_reward,
                    )
                else:
                    eval_score = (progress, eval_reward)
                if eval_score > self.best_eval_score:
                    self.best_eval_score = eval_score
                    self.checkpointer.save(it, self.train_state)  # best-only
                    import json as _json

                    with open(self._best_score_path, "w") as f:
                        _json.dump(list(eval_score), f)

                if self.settings.freeze_on_solve > 0:
                    if self._solve_metric == "distance":
                        solved = (
                            eval_metrics.get("eval/distance_traveled", 0.0)
                            >= self.settings.solve_distance
                        )
                    else:
                        solved = (
                            eval_metrics.get("eval/laps_completed", 0.0)
                            >= self.settings.solve_laps - 1e-2
                        )
                    self._solve_streak = self._solve_streak + 1 if solved else 0
                    should = (
                        self._solve_streak >= self.settings.freeze_on_solve
                    )
                    if should and not self._frozen:
                        print(
                            f"Iteration {it}: task solved for "
                            f"{self._solve_streak} consecutive evals - "
                            "freezing updates (rollout/eval continue)",
                            flush=True,
                        )
                    elif self._frozen and not should:
                        bar = (
                            f"{self.settings.solve_distance} m"
                            if self._solve_metric == "distance"
                            else f"{self.settings.solve_laps} laps"
                        )
                        print(
                            f"Iteration {it}: eval fell below {bar} - "
                            "unfreezing",
                            flush=True,
                        )
                    self._frozen = should

            freeze = (
                jnp.bool_(self._frozen)
                if self.settings.freeze_on_solve > 0
                else None
            )
            if self.mesh is not None:
                args = (self.train_state, self.env_states)
                if freeze is not None:
                    args = args + (freeze,)
                new_state, new_envs, m = self._dp_iteration(*args)
            elif self.obs_mode == "pixels":
                new_state, new_envs, m = self._pixels.pixel_train_iteration(
                    self.train_state,
                    self.env_states,
                    self.env_params,
                    self.model,
                    self.config,
                    self.pix,
                    freeze=freeze,
                )
            else:
                new_state, new_envs, m = ppo.train_iteration(
                    self.train_state,
                    self.env_states,
                    self.env_params,
                    self.model,
                    self.config,
                    latent_obs=self.latent_obs,
                    vae_variables=self.vae_variables,
                    rollout_model=self.rollout_model,
                    freeze=freeze,
                )
            metrics = {k: float(v) for k, v in m.items()}
            if freeze is not None:
                metrics["train/frozen"] = float(self._frozen)

            # Failure detection: a non-finite loss poisons the params; roll
            # back to the last checkpoint (or skip the update) instead of
            # continuing. (The reference has no equivalent - a NaN would
            # propagate silently; SURVEY.md section 5.)
            if not np.isfinite(metrics["train_loss/loss"]):
                self._nan_events += 1
                self.writer.write_scalar("train/nan_events", self._nan_events, it)
                print(
                    f"Iteration {it}: non-finite loss detected; "
                    f"rolling back ({self._nan_events} events)",
                    flush=True,
                )
                restored = self.autosaver.restore_latest(
                    self.train_state
                ) or self.checkpointer.restore_latest(self.train_state)
                if restored is not None:
                    self.train_state = restored
                # Fresh envs + new rng stream either way.
                self.train_state = self.train_state.replace(
                    rng=jax.random.fold_in(self.train_state.rng, it),
                    iteration=jnp.int32(it + 1),
                )
                self.env_states = ppo.init_env_batch(
                    self.env_params,
                    self.config.num_envs,
                    jax.random.fold_in(self.train_state.rng, 1),
                    env_kind=self.config.env_kind,
                )
                if self.mesh is not None:
                    self.train_state = self._train_dp.replicate(
                        self.train_state, self.mesh
                    )
                    self.env_states = self._train_dp.shard_env_batch(
                        self.env_states, self.mesh
                    )
                continue

            self.train_state, self.env_states = new_state, new_envs
            self.writer.write_scalars(metrics, it)

            if (
                self.settings.checkpoint_interval > 0
                and (it + 1) % self.settings.checkpoint_interval == 0
            ):
                self.autosaver.save(it + 1, self.train_state)
        self.writer.flush()
        return metrics

    def close(self) -> None:
        if self._watchdog is not None:
            self._watchdog.stop()
        self.writer.close()
        if hasattr(self, "_video_env"):
            self._video_env.close()
        self.checkpointer.close()
        self.autosaver.close()

"""Data-parallel PPO over a device mesh via shard_map.

Each device owns a shard of the vectorized env batch (the whole simulator is
on-device, so "sharding the environment" is just sharding its state pytree),
runs the fused rollout->GAE->update iteration locally, and all-reduces
gradients / statistics over ICI with psum/pmean. Parameters and optimizer
state stay replicated and bit-identical across devices because every
collective happens before `optax.apply_updates`.

This is the component inventory's "multi-chip scaling" row (SURVEY.md
section 2.3) - the reference has no distributed machinery at all.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import Array

from carla_ppo_tpu.envs.types import EnvParams, EnvState
from carla_ppo_tpu.models.policy import ActorCritic
from carla_ppo_tpu.parallel.mesh import DATA_AXIS, batch_sharding
from carla_ppo_tpu.training import ppo
from carla_ppo_tpu.training.ppo import PPOConfig, TrainState


def make_dp_train_iteration(
    mesh: Mesh,
    model: ActorCritic,
    config: PPOConfig,
    env_params: EnvParams,
    axis_name: str = DATA_AXIS,
    latent_obs=None,
    vae_variables=None,
    rollout_model=None,
    with_freeze: bool = False,
):
    """Build a jitted data-parallel train iteration bound to `mesh`.

    Returns fn(train_state, env_states) -> (train_state, env_states, metrics)
    where env_states is sharded on its leading axis and train_state is
    replicated. With `latent_obs` (+ frozen `vae_variables`), each shard
    renders its own envs' camera frames and encodes them locally - only the
    gradient/statistic psums cross ICI (config 2 at multi-chip scale).
    `rollout_model` = the mixed-precision behavior-policy twin
    (ppo.train_iteration_core docstring). `with_freeze` builds the variant
    taking a third replicated bool arg (the Trainer's solve-aware freeze;
    kept opt-in so the default program and metric set stay bit-identical).
    """

    if with_freeze:

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P()),
            out_specs=(P(), P(axis_name), P()),
            check_vma=False,
        )
        def dp_iteration_f(train_state, env_states, freeze):
            return ppo.train_iteration_core(
                train_state, env_states, env_params, model, config,
                axis_name=axis_name,
                latent_obs=latent_obs, vae_variables=vae_variables,
                rollout_model=rollout_model, freeze=freeze,
            )

        return jax.jit(dp_iteration_f)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P(axis_name), P()),
        check_vma=False,
    )
    def dp_iteration(
        train_state: TrainState, env_states: EnvState
    ) -> Tuple[TrainState, EnvState, Dict[str, Array]]:
        return ppo.train_iteration_core(
            train_state, env_states, env_params, model, config,
            axis_name=axis_name,
            latent_obs=latent_obs, vae_variables=vae_variables,
            rollout_model=rollout_model,
        )

    return jax.jit(dp_iteration)


def make_dp_pixel_train_iteration(
    mesh: Mesh,
    model,
    config: PPOConfig,
    env_params: EnvParams,
    pix=None,
    axis_name: str = DATA_AXIS,
    with_freeze: bool = False,
):
    """Data-parallel variant of the end-to-end pixel iteration (config 4):
    per-shard rendering + conv policy, psum'd gradients over ICI.
    `with_freeze`: see make_dp_train_iteration."""
    from carla_ppo_tpu.training import pixels as pixels_mod

    if pix is None:
        pix = pixels_mod.PixelConfig()

    if with_freeze:

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis_name), P()),
            out_specs=(P(), P(axis_name), P()),
            check_vma=False,
        )
        def dp_iteration_f(train_state, env_states, freeze):
            return pixels_mod.pixel_train_iteration_core(
                train_state, env_states, env_params, model, config, pix,
                axis_name=axis_name, freeze=freeze,
            )

        return jax.jit(dp_iteration_f)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P(axis_name), P()),
        check_vma=False,
    )
    def dp_iteration(train_state: TrainState, env_states: EnvState):
        return pixels_mod.pixel_train_iteration_core(
            train_state, env_states, env_params, model, config, pix,
            axis_name=axis_name,
        )

    return jax.jit(dp_iteration)


def make_dp_evaluate(
    mesh: Mesh,
    model: ActorCritic,
    config: PPOConfig,
    env_params: EnvParams,
    num_envs: int,
    chunk: int = 256,
    axis_name: str = DATA_AXIS,
    latent_obs=None,
    vae_variables=None,
):
    """Build a jitted data-parallel greedy evaluation bound to `mesh`.

    Returns fn(params, rng, max_steps) -> the ppo.evaluate metric dict.
    Each device evaluates num_envs/n_devices envs (each env's rollout is a
    pure function of its reset key + the replicated params, so the shards
    never communicate); the per-env snaps are gathered and aggregated by the
    same _evaluate_metrics executable as the single-device path (VERDICT
    round-3 item 7). `num_envs` must divide by the mesh size.

    Parity vs single-device ppo.evaluate with the same rng: the DISCRETE
    per-env outcomes (laps, steps, termination reasons, finished flags)
    match exactly; float accumulators (reward/distance/deviation) agree to
    within last-ULP rounding. True bit-identity across decompositions is
    not achievable: XLA vectorizes a [num_envs/n]-wide program differently
    from the [num_envs]-wide one (measured: [1]-per-shard vs [8] batched
    CPU matmuls differ by 1 ulp in the policy mean), and no reduction
    ordering fix can undo per-step rounding inside the rollout.
    """
    def snap_core(params, keys, tids, max_steps):
        return ppo._evaluate_snaps(
            params, env_params, model, keys, tids, max_steps,
            config, latent_obs, vae_variables, chunk,
        )

    return _build_dp_evaluate(
        mesh, snap_core, num_envs, env_params, config, axis_name
    )


def make_dp_pixel_evaluate(
    mesh: Mesh,
    model,
    config: PPOConfig,
    env_params: EnvParams,
    num_envs: int,
    pix=None,
    chunk: int = 256,
    axis_name: str = DATA_AXIS,
):
    """Data-parallel greedy evaluation for the pixel pipeline - same contract
    as make_dp_evaluate (see its docstring for the parity guarantees)."""
    from carla_ppo_tpu.training import pixels as pixels_mod

    if pix is None:
        pix = pixels_mod.PixelConfig()

    def snap_core(params, keys, tids, max_steps):
        return pixels_mod._evaluate_snaps(
            params, env_params, model, keys, tids, max_steps, config, pix,
            chunk,
        )

    return _build_dp_evaluate(
        mesh, snap_core, num_envs, env_params, config, axis_name
    )


def _build_dp_evaluate(
    mesh: Mesh, snap_core, num_envs: int, env_params, config, axis_name: str
):
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    track_ids, n_tracks = ppo._eval_track_ids(num_envs, env_params, config)
    use_tracks = track_ids is not None

    if use_tracks:
        eval_shard = jax.jit(
            partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P(), P(axis_name), P(axis_name), P()),
                out_specs=(P(axis_name), P(axis_name)),
                check_vma=False,
            )(snap_core)
        )
    else:
        eval_shard = jax.jit(
            partial(
                jax.shard_map,
                mesh=mesh,
                in_specs=(P(), P(axis_name), P()),
                out_specs=(P(axis_name), P(axis_name)),
                check_vma=False,
            )(lambda params, keys, max_steps: snap_core(
                params, keys, None, max_steps
            ))
        )

    def dp_evaluate(params, rng, max_steps):
        keys = jax.random.split(rng, num_envs)
        ms = jnp.asarray(max_steps, jnp.int32)
        if use_tracks:
            snap, done = eval_shard(params, keys, track_ids, ms)
        else:
            snap, done = eval_shard(params, keys, ms)
        # Gather the (tiny, [num_envs]) snaps to host so the shared
        # _evaluate_metrics executable sees unsharded inputs - the same
        # aggregation program as the single-device path.
        snap = jax.tree.map(np.asarray, snap)
        return ppo._evaluate_metrics(
            snap, np.asarray(done), track_ids, n_tracks
        )

    return dp_evaluate


def shard_env_batch(env_states: EnvState, mesh: Mesh) -> EnvState:
    """Place an env-state batch with its leading axis sharded over the mesh."""
    return jax.device_put(env_states, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    from carla_ppo_tpu.parallel.mesh import replicated

    return jax.device_put(tree, replicated(mesh))

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


def shard_env_batch(env_states: EnvState, mesh: Mesh) -> EnvState:
    """Place an env-state batch with its leading axis sharded over the mesh."""
    return jax.device_put(env_states, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    from carla_ppo_tpu.parallel.mesh import replicated

    return jax.device_put(tree, replicated(mesh))

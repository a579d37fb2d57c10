"""Pallas rasterizer kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import numpy as np
import pytest

from carla_ppo_tpu.envs import lap_env, track as track_mod
from carla_ppo_tpu.envs.types import EnvParams
from carla_ppo_tpu.ops import rasterizer as R
from carla_ppo_tpu.ops.rasterizer_pallas import render_batch_pallas


@pytest.fixture(scope="module")
def batch(lap_params):
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    return states


def test_pallas_matches_reference(lap_params, batch):
    ref = np.asarray(R.render_batch(batch, lap_params))
    pal = np.asarray(render_batch_pallas(batch, lap_params, interpret=True))
    # Allow rare single-pixel boundary disagreements (fma association).
    match = (ref == pal).mean()
    assert match > 0.97, match


def test_pallas_after_driving(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(1))
    import jax.numpy as jnp

    for _ in range(60):
        s, _ = lap_env.step(s, jnp.array([0.15, 1.0]), lap_params)
    states = jax.tree.map(lambda x: x[None], s)
    ref = np.asarray(R.render_batch(states, lap_params))
    pal = np.asarray(render_batch_pallas(states, lap_params, interpret=True))
    assert (ref == pal).mean() > 0.97


def test_pallas_v2_matches_reference(lap_params, batch):
    from carla_ppo_tpu.ops.rasterizer_pallas import render_batch_pallas_v2

    ref = np.asarray(R.render_batch(batch, lap_params))
    v2 = np.asarray(render_batch_pallas_v2(batch, lap_params, interpret=True))
    assert (ref == v2).mean() > 0.96

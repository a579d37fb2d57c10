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


@pytest.mark.xfail(
    reason="Pallas kernels classify with one symmetric half_width; the XLA "
    "renderer draws asymmetric left/right widths on dual-lane route tracks "
    "(documented limitation, ops/rasterizer_pallas.py module docstring)",
    strict=False,
)
def test_pallas_route_track_parity():
    from carla_ppo_tpu.envs import route_env, route_planner

    town = route_planner.make_town(seed=0)
    bank = route_planner.make_route_bank(town, n_routes=8, capacity=1024, seed=0)
    params = route_env.route_env_params(bank)
    state = route_env.reset(params, jax.random.PRNGKey(0))

    # Find the waypoint with the largest width asymmetry across the bank and
    # park the vehicle there, looking down the road - the view the kernels'
    # single symmetric half_width cannot reproduce.
    lw = np.asarray(params.track.left_width)
    rw = np.asarray(params.track.right_width)
    live = np.arange(lw.shape[1])[None, :] < np.asarray(params.track.length)[:, None]
    asym = np.where(live, np.abs(lw - rw), 0.0)
    route, wp = np.unravel_index(np.argmax(asym), asym.shape)
    assert asym[route, wp] > 0.5, "route bank has no dual-lane asymmetry"
    trk = route_env.route_track(params.track, jax.numpy.int32(route))
    pos = np.asarray(trk.pos)[wp]
    fwd = np.asarray(trk.fwd)[wp]
    state = state.replace(
        route_id=jax.numpy.int32(route),
        waypoint_idx=jax.numpy.int32(wp),
        vehicle=state.vehicle.replace(
            pos=jax.numpy.asarray(pos, jax.numpy.float32),
            yaw=jax.numpy.float32(np.arctan2(fwd[1], fwd[0])),
        ),
    )
    p0 = params.replace(track=trk)
    single = jax.tree.map(lambda x: x[None], state)
    ref = np.asarray(R.render_batch(single, p0))
    pal = np.asarray(render_batch_pallas(single, p0, interpret=True))
    assert (ref == pal).mean() > 0.97

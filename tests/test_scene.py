"""Scene-richness tests: roadside props, NPC vehicles, real collisions.

The reference's camera sees CARLA Town07's full 13-class world (palette:
reference vae/vae_plots.py:49-71); round 2 brings the on-device renderer to
that richness via baked prop tables + a billboard pass, and makes collision
a real vehicle-vehicle event instead of only a roadside proxy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import lap_env, track as track_mod
from carla_ppo_tpu.envs.types import (
    NUM_NPC_SLOTS,
    EnvParams,
    SegClass,
    TerminationReason,
)
from carla_ppo_tpu.ops import rasterizer as R


@pytest.fixture(scope="module")
def rich_params():
    return EnvParams(
        track=track_mod.make_lap_track(seed=0, props=True),
        num_npcs=6,
        terminate_on_collision=True,
    )


def test_bake_props_fills_classes():
    t = track_mod.make_lap_track(seed=0, props=True)
    classes = set(np.unique(np.asarray(t.prop_class)))
    for c in (
        SegClass.BUILDINGS, SegClass.FENCES, SegClass.POLES, SegClass.WALLS,
        SegClass.TRAFFICSIGNS, SegClass.PEDESTRIANS, SegClass.VEHICLES,
    ):
        assert int(c) in classes, f"missing prop class {c.name}"
    # Lateral offsets clear the road (beyond the half width).
    occupied = np.asarray(t.prop_class) != int(SegClass.NONE)
    lat = np.abs(np.asarray(t.prop_lateral)[occupied])
    assert lat.min() > float(t.left_width[0])


def test_rich_frames_contain_ten_plus_classes(rich_params):
    """Driving a lap must expose >= 10 of the 13 CARLA classes on screen
    (VERDICT round-1 item 4's done-criterion)."""
    s = lap_env.reset(rich_params, jax.random.PRNGKey(0))
    seen = set()
    for i in range(300):
        s, out = lap_env.step(s, jnp.array([0.0, 0.6]), rich_params)
        if out.done:
            break
        if i % 25 == 0:
            frame = np.asarray(R.render_semantic(s, rich_params))
            seen |= set(np.unique(frame))
    assert len(seen) >= 10, f"only {sorted(seen)}"


def test_billboards_rise_above_horizon(rich_params):
    """Buildings must occupy sky rows (a pure ground renderer cannot)."""
    s = lap_env.reset(rich_params, jax.random.PRNGKey(0))
    found = False
    for _ in range(200):
        s, _ = lap_env.step(s, jnp.array([0.0, 0.6]), rich_params)
        frame = np.asarray(R.render_semantic(s, rich_params))
        above = frame[:39]
        if (above == int(SegClass.BUILDINGS)).sum() > 20:
            found = True
            break
    assert found, "no building pixels above the horizon in 200 steps"


def test_propless_track_renders_unchanged(lap_params):
    """Empty prop tables + num_npcs=0 must render exactly as before."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    with_props = np.asarray(
        R.render_semantic(s, lap_params, R.CameraConfig(render_props=True))
    )
    without = np.asarray(
        R.render_semantic(s, lap_params, R.CameraConfig(render_props=False))
    )
    np.testing.assert_array_equal(with_props, without)


def test_npcs_advance_and_render(rich_params):
    s = lap_env.reset(rich_params, jax.random.PRNGKey(1))
    s0 = s.npc_s
    for _ in range(30):
        s, _ = lap_env.step(s, jnp.array([0.0, 0.0]), rich_params)
    moved = np.asarray(s.npc_s - s0)
    assert (moved[:6] > 0.5).all()  # active NPCs drive forward
    # Park an NPC right in front of the camera: it must paint VEHICLES.
    s = s.replace(
        npc_s=s.npc_s.at[0].set(s.waypoint_idx.astype(jnp.float32) + 10.0),
        npc_lateral=s.npc_lateral.at[0].set(jnp.float32(0.0)),
    )
    frame = np.asarray(R.render_semantic(s, rich_params))
    assert (frame == int(SegClass.VEHICLES)).sum() > 30


def test_npc_collision_terminates(rich_params):
    """Real vehicle-vehicle collision: overlapping an NPC ends the episode
    with COLLISION (reference sensor semantics, CarlaEnv/wrappers.py:85-115)."""
    s = lap_env.reset(rich_params, jax.random.PRNGKey(2))
    # Place NPC 0 directly on top of the ego in road coordinates.
    s = s.replace(
        npc_s=s.npc_s.at[0].set(s.waypoint_idx.astype(jnp.float32) + 1.0),
        npc_lateral=s.npc_lateral.at[0].set(jnp.float32(0.0)),
        npc_speed=s.npc_speed.at[0].set(jnp.float32(0.0)),
    )
    s2, out = lap_env.step(s, jnp.array([0.0, 1.0]), rich_params)
    assert bool(out.done)
    assert int(s2.termination_reason) == int(TerminationReason.COLLISION)
    assert bool(s2.collision)


def test_npcs_inert_by_default(lap_params):
    """num_npcs=0 (default): no movement effect, no collision possible."""
    s = lap_env.reset(lap_params, jax.random.PRNGKey(3))
    s = s.replace(
        npc_s=jnp.full((NUM_NPC_SLOTS,), s.waypoint_idx.astype(jnp.float32)),
        npc_lateral=jnp.zeros((NUM_NPC_SLOTS,)),
    )
    s2, out = lap_env.step(s, jnp.array([0.0, 1.0]), lap_params)
    assert not bool(s2.collision)


def test_vector_npc_obs_radar(rich_params):
    """vector_npc: radar features report the nearest NPC ahead/behind;
    without traffic the radar reads 'nothing in range'."""
    from carla_ppo_tpu.envs import observations as obs_mod

    s = lap_env.reset(rich_params, jax.random.PRNGKey(0))
    ego_s = s.waypoint_idx.astype(jnp.float32)
    # Park NPC 0 exactly 20 m ahead in-lane, slower than a moving ego;
    # NPC 1 10 m behind, offset 1 m left.
    s = s.replace(
        npc_s=s.npc_s.at[0].set(ego_s + 20.0).at[1].set(ego_s - 10.0),
        npc_lateral=s.npc_lateral.at[0].set(0.0).at[1].set(1.0),
        npc_speed=s.npc_speed.at[0].set(0.0).at[1].set(0.0),
    )
    # Push the others out of radar range.
    far = ego_s + 200.0
    for i in range(2, s.npc_s.shape[0]):
        s = s.replace(npc_s=s.npc_s.at[i].set(far))

    obs = np.asarray(obs_mod.vector_npc_obs(s, rich_params))
    base_dim = obs_mod.vector_obs_dim()
    assert obs.shape == (obs_mod.vector_npc_obs_dim(),)
    gap_ahead, lat_ahead, closing_ahead, gap_behind, lat_behind, _ = obs[base_dim:]
    assert gap_ahead == pytest.approx(20.0 / obs_mod.NPC_RADAR_RANGE, abs=1e-5)
    assert abs(lat_ahead) < 0.2  # in-lane, ego near center
    assert gap_behind == pytest.approx(10.0 / obs_mod.NPC_RADAR_RANGE, abs=1e-5)
    assert lat_behind > 0.0  # offset to the left

    # No active NPCs: radar reads max-range, zero lat/closing.
    plain = EnvParams(track=rich_params.track)
    obs0 = np.asarray(obs_mod.vector_npc_obs(s, plain))
    np.testing.assert_allclose(
        obs0[base_dim:], [1.0, 0.0, 0.0, 1.0, 0.0, 0.0], atol=1e-6
    )
    # The base features are untouched.
    np.testing.assert_allclose(
        obs0[:base_dim], np.asarray(obs_mod.vector_obs(s, plain)), atol=1e-6
    )


def test_vector_npc_trains(rich_params):
    """A train_iteration with obs_fn='vector_npc' runs end to end."""
    from carla_ppo_tpu.envs.observations import obs_dim_for
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo as ppo_mod

    config = ppo_mod.PPOConfig(
        horizon=4, num_envs=4, num_minibatches=2, obs_fn="vector_npc"
    )
    model = ActorCritic()
    rng = jax.random.PRNGKey(0)
    ts = ppo_mod.create_train_state(
        model, config, obs_dim_for("vector_npc"), rng
    )
    envs = ppo_mod.init_env_batch(rich_params, 4, rng)
    ts2, _, metrics = ppo_mod.train_iteration(
        ts, envs, rich_params, model, config
    )
    assert int(ts2.iteration) == 1
    assert np.isfinite(float(metrics["train_loss/loss"]))


def test_npc_billboard_prune_bit_identical(rich_params):
    """render_npc_billboards=False (the Trainer's num_npcs=0 program) must
    render EXACTLY what the default program renders when no NPC is active:
    every NPC slot is class NONE, so the pruned pass drops only provably
    invisible candidates."""
    no_npc = rich_params.replace(num_npcs=0)
    pruned = no_npc.replace(render_npc_billboards=False)
    s = lap_env.reset(no_npc, jax.random.PRNGKey(4))
    for _ in range(40):
        s, _ = lap_env.step(s, jnp.array([0.1, 0.7]), no_npc)
    full = np.asarray(R.render_semantic(s, no_npc))
    fast = np.asarray(R.render_semantic(s, pruned))
    np.testing.assert_array_equal(full, fast)
    # The pruned program must still paint props (only NPC slots go away).
    assert (fast == int(SegClass.BUILDINGS)).any() or (
        fast == int(SegClass.FENCES)
    ).any()

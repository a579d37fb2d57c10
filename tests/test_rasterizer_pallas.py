"""Pallas ground-pass kernels vs the XLA reference (interpret mode on CPU).

v3d is the production TPU ground pass (dispatched by rasterizer.render_batch);
v3c is the any-batch-size variant. Both are expected BIT-IDENTICAL to the XLA
path - unlike the deleted v1/v2 kernels, the v3 family evaluates the same
arithmetic in the same layout (see ops/rasterizer_pallas.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import lap_env
from carla_ppo_tpu.ops import rasterizer as R
from carla_ppo_tpu.ops.rasterizer_pallas import (
    GROUP,
    render_batch_pallas_v3c,
    render_batch_pallas_v3d,
    render_batch_pallas_v4,
)


@pytest.fixture(scope="module")
def batch(lap_params):
    keys = jax.random.split(jax.random.PRNGKey(0), GROUP)
    return jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)


def test_v3c_matches_reference(lap_params, batch):
    ref = np.asarray(R.render_batch(batch, lap_params))
    v = np.asarray(render_batch_pallas_v3c(batch, lap_params, interpret=True))
    assert (ref == v).mean() == 1.0


def test_v3d_matches_reference(lap_params, batch):
    ref = np.asarray(R.render_batch(batch, lap_params))
    v = np.asarray(render_batch_pallas_v3d(batch, lap_params, interpret=True))
    assert (ref == v).mean() == 1.0


def test_v4_matches_reference(lap_params, batch):
    """v4 (the production kernel: tail/ladder batched over the program's
    GROUP envs via component-major scratch) is bit-identical to the XLA
    path, like v3d."""
    ref = np.asarray(R.render_batch(batch, lap_params))
    v = np.asarray(render_batch_pallas_v4(batch, lap_params, interpret=True))
    assert (ref == v).mean() == 1.0


def test_v4_after_driving_scattered(lap_params):
    """v4 parity on a batch scattered around the track (each env's stripe
    windows differ, exercising every scratch row)."""
    import dataclasses

    keys = jax.random.split(jax.random.PRNGKey(7), GROUP)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    states = dataclasses.replace(
        states,
        waypoint_idx=(
            jnp.arange(GROUP, dtype=jnp.int32) * 97
        ) % lap_params.track.length,
    )
    ref = np.asarray(R.render_batch(states, lap_params))
    v = np.asarray(render_batch_pallas_v4(states, lap_params, interpret=True))
    assert (ref == v).mean() == 1.0


def test_rgb_batch_matches_vmapped_render_rgb(lap_params, batch):
    """render_rgb_batch (the --vae_source rgb rollout renderer) equals
    vmap(render_rgb) on the CPU/XLA path (noise off)."""
    ref = np.asarray(
        jax.vmap(lambda s: R.render_rgb(s, lap_params))(batch)
    )
    got = np.asarray(R.render_rgb_batch(batch, lap_params))
    # Same math, but render_rgb_batch is jitted: XLA fusion may re-round the
    # shading arithmetic - tolerance instead of bit equality.
    np.testing.assert_allclose(ref, got, atol=1e-5)


def test_v3d_after_driving(lap_params):
    s = lap_env.reset(lap_params, jax.random.PRNGKey(1))
    for _ in range(60):
        s, _ = lap_env.step(s, jnp.array([0.15, 1.0]), lap_params)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (GROUP,) + x.shape), s
    )
    ref = np.asarray(R.render_batch(states, lap_params))
    v = np.asarray(render_batch_pallas_v3d(states, lap_params, interpret=True))
    assert (ref == v).mean() == 1.0


def test_v3_route_track_asymmetric_widths():
    """The v3 payload carries per-waypoint left/right widths, so dual-lane
    route tracks render correctly - the case the deleted v1/v2 could not
    handle (they classified with one symmetric half width)."""
    from carla_ppo_tpu.envs import route_env, route_planner

    town = route_planner.make_town(seed=0)
    bank = route_planner.make_route_bank(town, n_routes=8, capacity=1024, seed=0)
    params = route_env.route_env_params(bank)
    state = route_env.reset(params, jax.random.PRNGKey(0))

    lw = np.asarray(params.track.left_width)
    rw = np.asarray(params.track.right_width)
    live = np.arange(lw.shape[1])[None, :] < np.asarray(params.track.length)[:, None]
    asym = np.where(live, np.abs(lw - rw), 0.0)
    route, wp = np.unravel_index(np.argmax(asym), asym.shape)
    assert asym[route, wp] > 0.5, "route bank has no dual-lane asymmetry"
    trk = route_env.route_track(params.track, jnp.int32(route))
    pos = np.asarray(trk.pos)[wp]
    fwd = np.asarray(trk.fwd)[wp]
    state = state.replace(
        route_id=jnp.int32(route),
        waypoint_idx=jnp.int32(wp),
        vehicle=state.vehicle.replace(
            pos=jnp.asarray(pos, jnp.float32),
            yaw=jnp.float32(np.arctan2(fwd[1], fwd[0])),
        ),
    )
    p0 = params.replace(track=trk)
    single = jax.tree.map(lambda x: x[None], state)
    ref = np.asarray(R.render_batch(single, p0))
    v = np.asarray(render_batch_pallas_v3c(single, p0, interpret=True))
    assert (ref == v).mean() == 1.0


def test_composed_rich_scene_with_billboards():
    """The production composition render_batch takes on TPU: v3d ground +
    XLA billboard pass over static depth/sky maps. Must be bit-identical to
    the vmapped render_semantic reference on the full rich scene."""
    from carla_ppo_tpu.envs import track as track_mod
    from carla_ppo_tpu.envs.types import EnvParams

    params = EnvParams(track=track_mod.make_lap_track(seed=0, props=True))
    keys = jax.random.split(jax.random.PRNGKey(2), GROUP)
    states = jax.vmap(lambda k: lap_env.reset(params, k))(keys)
    # CPU -> XLA fallback path for both returns (rich + de-prop ground).
    ref_rich, ref_ground = R.render_batch_with_ground(states, params)
    comp_rich, comp_ground = R._render_batch_pallas_composed(
        states, params, R.CameraConfig(), R.RoadStyle(), interpret=True
    )
    assert (np.asarray(ref_rich) == np.asarray(comp_rich)).mean() == 1.0
    assert (np.asarray(ref_ground) == np.asarray(comp_ground)).mean() == 1.0


def test_render_batch_cpu_fallback(lap_params, batch):
    """On the CPU backend render_batch must take the XLA path (Mosaic does
    not target CPU) - this simply asserts the dispatch does not crash and
    produces a valid frame batch."""
    assert not R._pallas_ground_eligible(batch, lap_params)
    out = R.render_batch(batch, lap_params)
    assert out.shape == (GROUP, 80, 160)


def test_v3d_banked_tracks_matches_reference():
    """Banked batches (route bank sliced by route_id) take the same v3d
    kernel - the prep vmaps over per-env track slices. Bit-identical to the
    per-env XLA renderer across a batch spanning several routes."""
    from carla_ppo_tpu.envs import route_env, route_planner

    town = route_planner.make_town(seed=0)
    bank = route_planner.make_route_bank(town, n_routes=8, capacity=1024, seed=0)
    params = route_env.route_env_params(bank)
    keys = jax.random.split(jax.random.PRNGKey(3), GROUP)
    states = jax.vmap(lambda k: route_env.reset(params, k))(keys)
    # Walk each env forward so windows differ per route.
    for _ in range(30):
        states, _ = jax.vmap(
            lambda s, a: route_env.step(s, a, params)
        )(states, jnp.tile(jnp.array([0.05, 0.9]), (GROUP, 1)))
    assert np.unique(np.asarray(states.route_id)).size > 1

    tracks = jax.tree.map(lambda x: x[states.route_id], params.track)
    v = np.asarray(
        render_batch_pallas_v3d(states, params, interpret=True, tracks=tracks)
    )
    ref = np.asarray(R.render_batch_banked(states, params))  # CPU -> XLA path
    assert (ref == v).mean() == 1.0


def test_v5_flat_matches_reference(lap_params, batch):
    """v5 (flat natural-order output, the production layout) reshapes to the
    exact XLA frames - same per-stripe math as v4, aligned flat stores."""
    from carla_ppo_tpu.ops.rasterizer_pallas import render_batch_pallas_v5

    ref = np.asarray(R.render_batch(batch, lap_params))
    B = ref.shape[0]
    v = np.asarray(
        render_batch_pallas_v5(batch, lap_params, interpret=True)
    ).reshape(B, 80, 160)
    assert (ref == v).mean() == 1.0


def test_v5_composed_rich_scene_matches_billboard_pass():
    """The full v5 path (flat kernel + lane-perfect flat billboard composite)
    equals the per-env XLA billboard_pass on a rich scene with NPC slots -
    the production render for latent/pixel training."""
    import dataclasses

    from carla_ppo_tpu.envs import track as track_mod
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.ops.rasterizer import (
        _render_batch_pallas_composed,
        render_semantic_with_ground,
    )

    params = EnvParams(
        track=track_mod.make_lap_track(seed=3, props=True), num_npcs=2
    )
    keys = jax.random.split(jax.random.PRNGKey(5), GROUP)
    states = jax.vmap(lambda k: lap_env.reset(params, k))(keys)
    states = dataclasses.replace(
        states,
        waypoint_idx=(jnp.arange(GROUP, dtype=jnp.int32) * 113)
        % params.track.length,
    )
    ref_rich, ref_ground = jax.vmap(
        lambda s: render_semantic_with_ground(s, params)
    )(states)
    got_rich, got_ground = _render_batch_pallas_composed(
        states, params, R.CameraConfig(), R.RoadStyle(), interpret=True
    )
    assert (np.asarray(ref_ground) == np.asarray(got_ground)).mean() == 1.0
    assert (np.asarray(ref_rich) == np.asarray(got_rich)).mean() == 1.0

    # The flat composite's depth/sky returns (the RGB shading inputs) match
    # the per-env billboard_pass outputs bit-for-bit too.
    from carla_ppo_tpu.ops.rasterizer import (
        _composite_billboards_flat,
        _ground_pass,
        _static_depth_sky,
        billboard_pass,
    )

    cam = R.CameraConfig()
    depth0, sky0 = _static_depth_sky(cam)
    ref_cls, ref_depth, ref_sky = jax.vmap(
        lambda s: billboard_pass(
            _ground_pass(s, params, cam, R.RoadStyle())[0],
            depth0, sky0, s, params, cam,
        )
    )(states)
    flat_ground = jnp.asarray(got_ground).reshape(GROUP, -1)
    got_cls, got_depth, got_sky = _composite_billboards_flat(
        flat_ground, states, params, cam, return_depth_sky=True
    )
    H, W = cam.height, cam.width
    assert (np.asarray(ref_cls) == np.asarray(got_cls).reshape(-1, H, W)).all()
    np.testing.assert_array_equal(
        np.asarray(ref_depth), np.asarray(got_depth).reshape(-1, H, W)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_sky), np.asarray(got_sky).reshape(-1, H, W)
    )


def test_v5_rgb_batch_matches_vmapped_render_rgb():
    """render_rgb_batch's v5 flat path (--vae_source rgb rollouts) equals
    vmap(render_rgb) on a rich scene (noise off)."""
    from carla_ppo_tpu.envs import track as track_mod
    from carla_ppo_tpu.envs.types import EnvParams

    params = EnvParams(track=track_mod.make_lap_track(seed=3, props=True))
    keys = jax.random.split(jax.random.PRNGKey(6), GROUP)
    states = jax.vmap(lambda k: lap_env.reset(params, k))(keys)
    ref = np.asarray(jax.vmap(lambda s: R.render_rgb(s, params))(states))
    got = np.asarray(R.render_rgb_batch(states, params))
    np.testing.assert_allclose(ref, got, atol=1e-5)


def test_v6_flat_matches_v5(lap_params, batch):
    """v6 (window fetch + camera rotation folded into the kernel behind a
    double-buffered DMA) is bit-identical to v5 on a fresh reset batch."""
    from carla_ppo_tpu.ops.rasterizer_pallas import (
        render_batch_pallas_v5,
        render_batch_pallas_v6,
    )

    v5 = np.asarray(render_batch_pallas_v5(batch, lap_params, interpret=True))
    v6 = np.asarray(render_batch_pallas_v6(batch, lap_params, interpret=True))
    assert (v5 == v6).mean() == 1.0


def test_v6_wrap_boundary_scattered(lap_params):
    """v6's wrap-baked doubled table reproduces v5's per-step modular gather
    at every loop-track corner: idx < window_behind (behind-window wraps
    backward) and idx near length-1 (ahead-window wraps forward)."""
    import dataclasses

    from carla_ppo_tpu.ops.rasterizer_pallas import (
        render_batch_pallas_v5,
        render_batch_pallas_v6,
    )

    N = int(lap_params.track.length)
    behind = R.CameraConfig().window_behind
    keys = jax.random.split(jax.random.PRNGKey(11), GROUP)
    states = jax.vmap(lambda k: lap_env.reset(lap_params, k))(keys)
    idx = jnp.asarray(
        [0, 1, behind - 1, behind, N // 2, N - 2, N - 1, 7 * N // 8],
        jnp.int32,
    )
    states = dataclasses.replace(states, waypoint_idx=idx)
    v5 = np.asarray(render_batch_pallas_v5(states, lap_params, interpret=True))
    v6 = np.asarray(render_batch_pallas_v6(states, lap_params, interpret=True))
    assert (v5 == v6).mean() == 1.0


def test_v6_open_track_clamp():
    """On a non-loop (route) track the baked table's open-clamp rows equal
    v5's clamped gather, including waypoint_idx < window_behind (the
    behind-window saturates at row 0, not a wrap)."""
    import dataclasses

    from carla_ppo_tpu.envs import route_env, route_planner
    from carla_ppo_tpu.ops.rasterizer_pallas import (
        render_batch_pallas_v5,
        render_batch_pallas_v6,
    )

    town = route_planner.make_town(seed=0)
    bank = route_planner.make_route_bank(
        town, n_routes=2, capacity=1024, seed=0
    )
    params = route_env.route_env_params(bank)
    trk = route_env.route_track(params.track, jnp.int32(0))
    p0 = params.replace(track=trk)
    assert not bool(trk.is_loop)
    state = route_env.reset(params, jax.random.PRNGKey(0))
    L = int(np.asarray(trk.length))
    behind = R.CameraConfig().window_behind
    idx = jnp.asarray(
        [0, 1, behind - 1, behind, L // 2, L - 2, L - 1, L // 3], jnp.int32
    )
    pos = jnp.asarray(np.asarray(trk.pos)[np.asarray(idx)], jnp.float32)
    fwd = np.asarray(trk.fwd)[np.asarray(idx)]
    yaw = jnp.asarray(np.arctan2(fwd[:, 1], fwd[:, 0]), jnp.float32)
    batch = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (GROUP,) + x.shape), state
    )
    batch = dataclasses.replace(
        batch,
        waypoint_idx=idx,
        vehicle=batch.vehicle.replace(pos=pos, yaw=yaw),
    )
    v5 = np.asarray(render_batch_pallas_v5(batch, p0, interpret=True))
    v6 = np.asarray(render_batch_pallas_v6(batch, p0, interpret=True))
    assert (v5 == v6).mean() == 1.0


def test_composite_kernel_variants_bit_identical():
    """The Pallas billboard-composite kernel (all variants) is bit-identical
    to the production XLA flat composite, with and without NPC slots.

    The kernel is a MEASURED NEGATIVE for production (round 5,
    benchmarks/profile_composite.py: loop 3.45 ms / rows 3.63 ms vs the XLA
    fused composite's 1.17 ms at B=1024) and is retained as the design
    record + this parity pin; production stays on
    rasterizer._composite_billboards_flat."""
    from carla_ppo_tpu.envs import track as track_mod
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.ops.rasterizer_pallas import (
        composite_billboards_pallas,
    )
    from carla_ppo_tpu.training import ppo

    for npcs in (0, 3):
        params = EnvParams(
            track=track_mod.make_lap_track(seed=0, props=True),
            num_npcs=npcs,
            render_npc_billboards=npcs > 0,
        )
        states = ppo.init_env_batch(params, GROUP, jax.random.PRNGKey(7))

        def body(s, _):
            a = jnp.stack(
                [jnp.zeros(GROUP), jnp.full((GROUP,), 0.7)], axis=1
            )
            s2, _o = jax.vmap(
                lambda ss, aa: lap_env.autoreset_step(ss, aa, params, "vector")
            )(s, a)
            return s2, None

        states, _ = jax.lax.scan(body, states, None, length=40)
        cam = R.CameraConfig()
        ground = np.random.RandomState(npcs).randint(
            0, 13, (GROUP, cam.height * cam.width), dtype=np.int32
        )
        ground = jnp.asarray(ground)
        ref = np.asarray(
            R._composite_billboards_flat(ground, states, params, cam)
        )
        for variant in ("loop", "reduce3d", "rows"):
            got = np.asarray(
                composite_billboards_pallas(
                    ground, states, params, cam,
                    interpret=True, variant=variant,
                )
            )
            np.testing.assert_array_equal(ref, got, err_msg=f"{variant}")

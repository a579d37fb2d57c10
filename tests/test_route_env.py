"""Route planner + route env tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carla_ppo_tpu.envs import route_env, route_planner
from carla_ppo_tpu.envs.types import RoadOption, TerminationReason


@pytest.fixture(scope="module")
def town():
    return route_planner.make_town(seed=0)


@pytest.fixture(scope="module")
def bank(town):
    return route_planner.make_route_bank(town, n_routes=8, capacity=1024, seed=0)


@pytest.fixture(scope="module")
def rparams(bank):
    return route_env.route_env_params(bank)


def test_town_connected(town):
    import networkx as nx

    g = town.to_networkx()
    assert nx.is_connected(g)
    assert len(town.nodes) == 25


def test_route_waypoints_resolution(town):
    pos, fwd, man, _, _ = route_planner.compute_route_waypoints(town, 0, 24)
    seg = np.linalg.norm(np.diff(pos, axis=0), axis=1)
    np.testing.assert_allclose(seg, 1.0, atol=0.05)
    np.testing.assert_allclose(np.linalg.norm(fwd, axis=1), 1.0, atol=1e-4)
    # A cross-town route passes junctions: must contain turn maneuvers.
    assert set(man.tolist()) - {int(RoadOption.LANEFOLLOW)}


def test_route_is_shortest_ish(town):
    """A* route length is at least the straight-line distance and not
    absurdly longer."""
    pos, _, _, _, _ = route_planner.compute_route_waypoints(town, 0, 24)
    direct = np.linalg.norm(town.nodes[24] - town.nodes[0])
    assert direct <= len(pos) <= 2.5 * direct


def test_bank_shapes(bank):
    assert bank.pos.shape == (8, 1024, 2)
    assert bank.length.shape == (8,)
    assert int(bank.length.min()) >= 150
    assert not bool(bank.is_loop.any())


def test_reset_random_route(rparams):
    s0 = route_env.reset(rparams, jax.random.PRNGKey(0))
    s1 = route_env.reset(rparams, jax.random.PRNGKey(99))
    assert float(s0.distance_from_center) < 0.2
    # Different keys eventually give different routes.
    ids = {
        int(route_env.reset(rparams, jax.random.PRNGKey(k)).route_id)
        for k in range(10)
    }
    assert len(ids) > 1


def test_step_advances(rparams):
    s = route_env.reset(rparams, jax.random.PRNGKey(1))

    def body(s, _):
        obs = route_env.observe(s, rparams)
        steer = jnp.clip(-0.5 * obs[0] + 2.0 * obs[6] + 1.0 * obs[8], -1, 1)
        throttle = jnp.where(3.6 * s.vehicle.speed < 19.0, 1.0, 0.1)
        s, out = route_env.step(s, jnp.stack([steer, throttle]), rparams)
        return s, out

    s, outs = jax.lax.scan(body, s, None, length=300)
    assert int(s.waypoint_idx) > 20
    assert float(s.distance_from_center) < 1.5
    assert not bool(s.terminal)
    # routes_completed is fractional progress on route 1 of 1+.
    assert 0.0 < float(s.laps_completed) < 2.0


def test_route_chaining(rparams, bank):
    """Reaching the end of a route must teleport onto a fresh one and bump
    num_routes_completed (reference: carla_route_env.py:300-302)."""
    s = route_env.reset(rparams, jax.random.PRNGKey(2))
    rid = int(s.route_id)
    end_idx = int(bank.length[rid]) - 1
    s = s.replace(waypoint_idx=jnp.int32(end_idx))
    s2, out = route_env.step(s, jnp.array([0.0, 0.5]), rparams)
    assert int(s2.num_routes_completed) == 1
    assert int(s2.waypoint_idx) < 10
    # Vehicle teleported to the new route's start.
    new_track = route_env.route_track(bank, s2.route_id)
    assert float(jnp.linalg.norm(s2.vehicle.pos - new_track.pos[0])) < 2.0
    # Metrics persist across route chaining (same episode).
    assert float(s2.distance_traveled) >= float(s.distance_traveled)


def test_max_distance_terminates(rparams):
    s = route_env.reset(rparams, jax.random.PRNGKey(3))
    s = s.replace(
        distance_traveled=jnp.float32(2999.8),
        vehicle=s.vehicle.replace(vx=jnp.float32(8.0)),
    )
    s2, out = route_env.step(s, jnp.array([0.0, 1.0]), rparams)
    assert bool(out.done)
    assert int(s2.termination_reason) == TerminationReason.MAX_DISTANCE


def test_autoreset(rparams):
    """A step that trips the 3000 m terminal re-spawns within the step."""
    s = route_env.reset(rparams, jax.random.PRNGKey(4))
    s = s.replace(
        distance_traveled=jnp.float32(2999.9),
        vehicle=s.vehicle.replace(vx=jnp.float32(8.0)),
    )
    s2, out = route_env.autoreset_step(s, jnp.array([0.0, 1.0]), rparams)
    assert bool(out.done)
    assert float(out.distance_traveled) >= 3000.0  # finished episode's metric
    assert float(s2.distance_traveled) < 1.0  # fresh episode carried forward
    assert int(s2.step_count) == 0
    assert not bool(s2.terminal)


def test_vmap_batch(rparams):
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    states = jax.vmap(lambda k: route_env.reset(rparams, k))(keys)
    actions = jnp.tile(jnp.array([0.0, 1.0]), (B, 1))
    states, outs = jax.vmap(
        lambda s, a: route_env.autoreset_step(s, a, rparams)
    )(states, actions)
    assert outs.obs.shape == (B, 18)
    assert bool(jnp.all(jnp.isfinite(outs.obs)))


def test_route_chaining_resets_low_speed_grace(rparams, bank):
    """Completing a route teleports to a standstill start; the low-speed
    timer must restart or the episode dies instantly (a reference quirk we
    fix; see route_env.step)."""
    s = route_env.reset(rparams, jax.random.PRNGKey(7))
    rid = int(s.route_id)
    end_idx = int(bank.length[rid]) - 1
    s = s.replace(
        waypoint_idx=jnp.int32(end_idx),
        low_speed_timer=jnp.float32(60.0),  # long successful episode
        vehicle=s.vehicle.replace(vx=jnp.float32(6.0)),
    )
    s2, out = route_env.step(s, jnp.array([0.0, 1.0]), rparams)
    assert int(s2.num_routes_completed) == 1
    assert not bool(out.done)  # fresh grace period, no instant kill
    assert float(s2.low_speed_timer) < 1.0


# --- lane-change routing (reference: global_route_planner.py:169, 263-322) ---


def _route_with_lane_change(town, rng_seed=0):
    """Find (a, b) whose route contains a CHANGELANE maneuver."""
    rng = np.random.default_rng(rng_seed)
    for _ in range(300):
        a, b = rng.choice(len(town.nodes), 2, replace=False)
        out = route_planner.compute_route_waypoints(town, int(a), int(b))
        if int(RoadOption.CHANGELANELEFT) in set(out[2].tolist()):
            return out
    return None


def test_lane_change_routes_exist(town):
    """Dual-lane edges + left turns force mid-edge lane changes; the planner
    must emit CHANGELANELEFT maneuvers with a real lateral shift."""
    out = _route_with_lane_change(town)
    assert out is not None, "no route with a lane change in 300 samples"
    pos, fwd, man, lw, rw = out
    change = man == int(RoadOption.CHANGELANELEFT)
    assert change.sum() >= 5  # painted over a ~10-20 m span
    # The change happens between junctions, not inside turn paint.
    assert not np.any(change & (man == int(RoadOption.LEFT)))


def test_dual_lane_widths_asymmetric(town):
    """On a dual-lane edge the road extends on the side of the other lane:
    per-waypoint widths become asymmetric, summing to ~two lanes."""
    out = _route_with_lane_change(town)
    assert out is not None
    pos, fwd, man, lw, rw = out
    asym = np.abs(lw - rw) > 2.0
    assert asym.sum() >= 20, "no asymmetric-width section found"
    total = lw + rw
    # Within the dual section the paved width approaches two lanes.
    assert float(total.max()) > 1.8 * 2 * route_planner.track_mod.DEFAULT_HALF_WIDTH
    # Widths stay continuous (no >1 m steps between 1 m-spaced waypoints).
    assert float(np.abs(np.diff(lw)).max()) < 1.0
    assert float(np.abs(np.diff(rw)).max()) < 1.0


def test_lane_change_geometry_drivable(town):
    """The lane-shift section stays smooth: forward vectors rotate slowly."""
    out = _route_with_lane_change(town)
    assert out is not None
    pos, fwd, man, lw, rw = out
    heading = np.arctan2(fwd[:, 1], fwd[:, 0])
    dh = np.abs(np.diff(np.unwrap(heading)))
    assert float(dh.max()) < 0.15  # < ~8.6 deg per meter everywhere


def test_route_bank_carries_widths(town):
    bank = route_planner.make_route_bank(town, n_routes=16, capacity=1024, seed=0)
    lw = np.asarray(bank.left_width)
    rw = np.asarray(bank.right_width)
    assert lw.shape == (16, 1024) and rw.shape == (16, 1024)
    # With dual_lane_prob ~0.3, some route in the bank crosses a dual edge.
    assert bool((np.abs(lw - rw) > 2.0).any())


def test_dual_lane_road_renders_wider(town):
    """Rendered frames on a lane-change section show road pixels well left of
    the driven lane (the other lane), i.e. the renderer honors asymmetric
    widths."""
    import jax.numpy as jnp

    from carla_ppo_tpu.envs import lap_env
    from carla_ppo_tpu.envs.types import EnvParams, SegClass
    from carla_ppo_tpu.envs import track as track_mod
    from carla_ppo_tpu.ops import rasterizer as R

    out = _route_with_lane_change(town)
    assert out is not None
    pos, fwd, man, lw, rw = out
    # Build a single-route track carrying the asymmetric widths.
    n = len(pos)
    cap = 1024
    pad = lambda a, fill: np.concatenate([a, np.broadcast_to(fill, (cap - n, *a.shape[1:]))])
    from carla_ppo_tpu.envs.types import PROP_STRIDE, TrackData, RoadOption
    t = TrackData(
        pos=jnp.asarray(pad(pos, pos[-1])),
        fwd=jnp.asarray(pad(fwd, fwd[-1])),
        maneuver=jnp.asarray(pad(man, man[-1])),
        left_width=jnp.asarray(pad(lw, lw[-1])),
        right_width=jnp.asarray(pad(rw, rw[-1])),
        length=jnp.int32(n),
        is_loop=jnp.bool_(False),
        prop_class=jnp.full((cap // PROP_STRIDE, 2), int(SegClass.NONE), jnp.int32),
        prop_lateral=jnp.zeros((cap // PROP_STRIDE, 2), jnp.float32),
        prop_height=jnp.zeros((cap // PROP_STRIDE, 2), jnp.float32),
        prop_halfwidth=jnp.zeros((cap // PROP_STRIDE, 2), jnp.float32),
    )
    params = EnvParams(track=t)
    # Spawn the ego right before the widest (most asymmetric) waypoint.
    wp = int(np.argmax(lw - rw))
    s = lap_env.reset(params, jax.random.PRNGKey(0))
    veh = s.vehicle.replace(
        pos=jnp.asarray(pos[wp]),
        yaw=jnp.float32(np.arctan2(fwd[wp, 1], fwd[wp, 0])),
    )
    s = s.replace(vehicle=veh, waypoint_idx=jnp.int32(wp))
    frame = np.asarray(R.render_semantic(s, params))
    # Bottom rows: road must extend well into the LEFT half of the image
    # (the other lane) - compare the leftmost road column against a
    # symmetric-width render of the same pose.
    sym = t.replace(
        left_width=jnp.full((cap,), 1.75, jnp.float32),
        right_width=jnp.full((cap,), 1.75, jnp.float32),
    )
    frame_sym = np.asarray(R.render_semantic(s, params.replace(track=sym)))
    road = frame == int(SegClass.ROADS)
    road_sym = frame_sym == int(SegClass.ROADS)
    assert road.sum() > road_sym.sum() * 1.3, (road.sum(), road_sym.sum())


def test_junction_spawn_curriculum(rparams):
    """junction_spawn_prob=1: every training reset spawns with a junction
    segment no more than `junction_spawn_backoff` waypoints ahead; eval
    resets stay at the route start (reference parity)."""
    p = rparams.replace(junction_spawn_prob=jnp.float32(1.0))
    keys = jax.random.split(jax.random.PRNGKey(7), 24)
    states = jax.vmap(lambda k: route_env.reset(p, k, is_training=True))(keys)
    idx = np.asarray(states.waypoint_idx)
    rid = np.asarray(states.route_id)
    man = np.asarray(rparams.track.maneuver)
    length = np.asarray(rparams.track.length)
    backoff = int(rparams.junction_spawn_backoff)
    junction = {RoadOption.LEFT, RoadOption.RIGHT, RoadOption.STRAIGHT}
    for i, r in zip(idx, rid):
        window = man[r][i : min(i + backoff + 1, length[r])]
        assert any(int(m) in junction for m in window), (i, r)
    # The bias actually moved spawns (not all routes start at a junction).
    assert (idx > 0).any()
    # start_waypoint_idx follows the spawn (lap fraction counts from here).
    np.testing.assert_array_equal(np.asarray(states.start_waypoint_idx), idx)

    # Eval resets: route start, regardless of the probability.
    ev = jax.vmap(lambda k: route_env.reset(p, k, is_training=False))(keys)
    assert (np.asarray(ev.waypoint_idx) == 0).all()

    # prob=0 (default): training resets also stay at the route start.
    off = jax.vmap(lambda k: route_env.reset(rparams, k, is_training=True))(keys)
    assert (np.asarray(off.waypoint_idx) == 0).all()


def test_junction_spawn_does_not_inflate_routes_metric(rparams):
    """A mid-route curriculum spawn must not count the skipped prefix as
    driven progress: routes_completed starts near 0, and the first chained
    route credits only the driven fraction."""
    p = rparams.replace(junction_spawn_prob=jnp.float32(1.0))
    # Find a seed whose spawn is well past the route start.
    for seed in range(20):
        s = route_env.reset(p, jax.random.PRNGKey(seed), is_training=True)
        if int(s.waypoint_idx) > 30:
            break
    assert int(s.waypoint_idx) > 30
    s2, out = route_env.step(s, jnp.asarray([0.0, 1.0], jnp.float32), p)
    # One step from a deep spawn: ~0 routes completed, NOT spawn/length.
    assert float(out.laps_completed) < 0.02
    # The offset persists across route chaining (total = driven fractions).
    assert float(s2.route_frac_offset) > 0.0

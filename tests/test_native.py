"""Native C++ runtime tests: parity of the ctypes bindings with the numpy /
networkx / device implementations."""

import numpy as np
import pytest

from carla_ppo_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (run make -C native)"
)


def test_bake_track_matches_numpy():
    from carla_ppo_tpu.envs import track as tm

    theta = np.linspace(0, 2 * np.pi, 2048, endpoint=False)
    pts = np.stack([120 * np.cos(theta), 118 * np.sin(theta)], 1)
    pos, fwd, man = native.bake_track(pts, 1.0, True)
    ref = tm.track_from_polyline(pts, closed=True)
    n = int(ref.length)
    assert len(pos) == n
    np.testing.assert_allclose(pos, np.asarray(ref.pos)[:n], atol=1e-4)
    np.testing.assert_allclose(fwd, np.asarray(ref.fwd)[:n], atol=1e-4)
    assert (man == np.asarray(ref.maneuver)[:n]).mean() > 0.99


def test_bake_track_open_polyline():
    pts = np.stack([np.linspace(0, 100, 500), np.zeros(500)], 1)
    pos, fwd, man = native.bake_track(pts, 1.0, False)
    assert 98 <= len(pos) <= 101
    np.testing.assert_allclose(pos[:, 1], 0.0, atol=1e-9)
    np.testing.assert_allclose(fwd[:, 0], 1.0, atol=1e-9)


def test_route_astar_matches_networkx():
    import networkx as nx

    from carla_ppo_tpu.envs import route_planner as rp

    town = rp.make_town(seed=3)
    g = town.to_networkx()
    edges = np.asarray(town.edges, np.int32)

    def plen(path):
        return sum(
            float(np.linalg.norm(town.nodes[path[i + 1]] - town.nodes[path[i]]))
            for i in range(len(path) - 1)
        )

    rng = np.random.default_rng(0)
    for _ in range(10):
        a, b = rng.choice(len(town.nodes), 2, replace=False)
        p_native = native.route_astar(town.nodes, edges, int(a), int(b))
        p_nx = nx.astar_path(
            g, int(a), int(b),
            heuristic=lambda x, y: float(
                np.linalg.norm(town.nodes[x] - town.nodes[y])
            ),
            weight="weight",
        )
        assert p_native[0] == a and p_native[-1] == b
        assert plen(p_native) == pytest.approx(plen(p_nx), rel=1e-9)


def test_route_astar_unreachable():
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [5.0, 5.0]])
    edges = np.array([[0, 1]], np.int32)
    with pytest.raises(ValueError):
        native.route_astar(nodes, edges, 0, 2)


def test_golden_rasterizer_matches_device(lap_params):
    import jax

    from carla_ppo_tpu.envs import lap_env
    from carla_ppo_tpu.ops import rasterizer as R

    s = lap_env.reset(lap_params, jax.random.PRNGKey(0))
    gold = native.render_semantic_cpu(s, lap_params)
    dev = np.asarray(R.render_semantic(s, lap_params))
    assert gold.shape == dev.shape
    # f64 golden vs f32 device: identical up to band-boundary pixels.
    assert (gold == dev).mean() > 0.95
    # Class structure identical: same classes present, sky rows exact.
    assert set(np.unique(gold)) == set(np.unique(dev))
    assert (gold[:39] == dev[:39]).all()

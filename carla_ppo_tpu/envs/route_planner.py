"""Host-side town road network + global route planning.

Replaces the reference's map/planner stack: GlobalRoutePlannerDAO pulling
CARLA's road topology (reference: agents/navigation/global_route_planner_dao.py:26-62),
GlobalRoutePlanner building a networkx DiGraph and A*-searching it
(reference: global_route_planner.py:47-103, 221-237), per-edge turn decisions
(reference: global_route_planner.py:263-322), and `compute_route_waypoints`
densifying the result at 1 m resolution (reference: planner.py:12-126).

Our "town" is a procedurally generated jittered-grid road network (we own the
world, so the map is synthesized rather than parsed from OpenDRIVE). Routes
are A* shortest paths whose interior corners get arc fillets so the geometry
is drivable, then are resampled at 1 m and tagged with maneuvers: the turn
decision at each junction mirrors the reference's cross-product test
(global_route_planner.py:263-322) - |angle| < threshold -> STRAIGHT, sign of
the 2D cross -> LEFT / RIGHT.

Everything runs once at startup in numpy/networkx; the output is a padded
`TrackData` bank with a leading route axis, baked to device arrays. For very
large banks the same A* is implemented natively in
native/carla_ppo_native.cc (see carla_ppo_tpu.utils.native).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

import jax

from carla_ppo_tpu.envs import track as track_mod
from carla_ppo_tpu.envs.types import PROP_STRIDE, RoadOption, SegClass, TrackData

# Junction turn classification threshold (rad); the reference uses its own
# threshold on the angle between entry/exit vectors (global_route_planner.py:289).
_STRAIGHT_THRESHOLD = math.radians(35.0)


@dataclasses.dataclass
class TownMap:
    """A planar road graph: node positions + undirected edges.

    `dual` flags edges that are dual-lane carriageways (two same-direction
    lanes, LANE_WIDTH apart) - the graph feature behind lane-change routing
    (the reference builds lane-change links from CARLA's multi-lane roads,
    global_route_planner.py:169, 263-322)."""

    nodes: np.ndarray  # [N, 2] float
    edges: List[Tuple[int, int]]
    dual: List[bool] | None = None  # aligned with `edges`; None = all single

    def to_networkx(self):
        import networkx as nx

        g = nx.Graph()
        for i, p in enumerate(self.nodes):
            g.add_node(i, pos=tuple(p))
        for a, b in self.edges:
            w = float(np.linalg.norm(self.nodes[a] - self.nodes[b]))
            g.add_edge(a, b, weight=w)
        return g

    def dual_lookup(self) -> Dict[frozenset, bool]:
        if self.dual is None:
            return {}
        return {
            frozenset(e): bool(d) for e, d in zip(self.edges, self.dual)
        }


def make_town(
    seed: int = 0,
    grid: Tuple[int, int] = (5, 5),
    spacing: float = 120.0,
    jitter: float = 18.0,
    drop_edge_prob: float = 0.18,
    dual_lane_prob: float = 0.3,
) -> TownMap:
    """Jittered-grid road network, guaranteed connected; ~`dual_lane_prob` of
    the roads are dual-lane carriageways (lane-change routing happens on
    these)."""
    import networkx as nx

    rng = np.random.default_rng(seed)
    gx, gy = grid
    nodes = np.zeros((gx * gy, 2))
    for ix in range(gx):
        for iy in range(gy):
            nodes[ix * gy + iy] = (
                ix * spacing + rng.uniform(-jitter, jitter),
                iy * spacing + rng.uniform(-jitter, jitter),
            )
    all_edges = []
    for ix in range(gx):
        for iy in range(gy):
            n = ix * gy + iy
            if ix + 1 < gx:
                all_edges.append((n, (ix + 1) * gy + iy))
            if iy + 1 < gy:
                all_edges.append((n, ix * gy + iy + 1))

    keep = [e for e in all_edges if rng.uniform() > drop_edge_prob]
    g = nx.Graph()
    g.add_nodes_from(range(len(nodes)))
    g.add_edges_from(keep)
    # Re-add dropped edges until connected.
    dropped = [e for e in all_edges if e not in set(keep)]
    rng.shuffle(dropped)
    for e in dropped:
        if nx.is_connected(g):
            break
        g.add_edge(*e)
    edges = list(g.edges)
    dual = [bool(rng.uniform() < dual_lane_prob) for _ in edges]
    return TownMap(nodes=nodes, edges=edges, dual=dual)


def _fillet_path(
    points: np.ndarray, radius: float = 14.0, samples_per_arc: int = 24
) -> np.ndarray:
    """Round interior corners of a polyline with circular arc fillets."""
    if len(points) <= 2:
        return points.astype(np.float64)
    out = [points[0]]
    for i in range(1, len(points) - 1):
        p_prev, p, p_next = points[i - 1], points[i], points[i + 1]
        v_in = p - p_prev
        v_out = p_next - p
        l_in, l_out = np.linalg.norm(v_in), np.linalg.norm(v_out)
        u_in, u_out = v_in / l_in, v_out / l_out
        turn = math.atan2(
            u_in[0] * u_out[1] - u_in[1] * u_out[0], np.dot(u_in, u_out)
        )
        if abs(turn) < 1e-3:
            out.append(p)
            continue
        # Fillet tangent length; clamp so short edges still work.
        t = min(radius * abs(math.tan(turn / 2.0)), 0.4 * l_in, 0.4 * l_out)
        r_eff = t / abs(math.tan(turn / 2.0))
        start = p - u_in * t
        out.append(start)
        # Arc from `start`, rotating the heading by `turn`.
        heading = math.atan2(u_in[1], u_in[0])
        sign = 1.0 if turn > 0 else -1.0
        center = start + r_eff * np.array(
            [math.cos(heading + sign * math.pi / 2),
             math.sin(heading + sign * math.pi / 2)]
        )
        a0 = math.atan2(start[1] - center[1], start[0] - center[0])
        for k in range(1, samples_per_arc + 1):
            a = a0 + turn * k / samples_per_arc
            out.append(center + r_eff * np.array([math.cos(a), math.sin(a)]))
    out.append(points[-1])
    return np.asarray(out)


def _junction_maneuvers(
    node_path: Sequence[int], nodes: np.ndarray
) -> List[Tuple[np.ndarray, int]]:
    """(junction position, RoadOption) per interior node - the reference's
    per-junction turn decision (global_route_planner.py:263-322)."""
    out = []
    for i in range(1, len(node_path) - 1):
        p_prev = nodes[node_path[i - 1]]
        p = nodes[node_path[i]]
        p_next = nodes[node_path[i + 1]]
        u_in = p - p_prev
        u_out = p_next - p
        turn = math.atan2(
            u_in[0] * u_out[1] - u_in[1] * u_out[0], float(np.dot(u_in, u_out))
        )
        if abs(turn) < _STRAIGHT_THRESHOLD:
            opt = RoadOption.STRAIGHT
        elif turn > 0:
            opt = RoadOption.LEFT
        else:
            opt = RoadOption.RIGHT
        out.append((p, int(opt)))
    return out


# Lane width (m); CARLA Town07 lanes are ~3.5 m (track.DEFAULT_HALF_WIDTH*2).
LANE_WIDTH = 2.0 * track_mod.DEFAULT_HALF_WIDTH
# Dual-lane edges shorter than this stay single (no room for lane logistics).
_MIN_DUAL_LENGTH = 60.0


def compute_route_waypoints(
    town: TownMap,
    start_node: int,
    end_node: int,
    resolution: float = 1.0,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """A* route -> (pos [n,2], fwd [n,2], maneuver [n], left_width [n],
    right_width [n]) at 1 m resolution.

    Maneuver tagging mirrors the reference's planner: LANEFOLLOW between
    junctions, and the junction's turn decision painted over the waypoints
    within ~15 m of the junction (the reference back-extends maneuvers 5
    waypoints before junctions, planner.py:115-124; our fillets are longer so
    the painted window is wider).

    Lane-change routing (reference: global_route_planner.py:169 builds
    lane-change links; :263-322 emits CHANGELANELEFT/RIGHT): on a dual-lane
    edge the route enters on the RIGHT lane (drive-on-right convention) and,
    when the junction at the edge's far end turns LEFT, shifts to the left
    lane mid-edge - those waypoints are tagged CHANGELANELEFT and the
    per-waypoint widths are asymmetric (the other lane extends the road on
    one side), so the renderer draws a genuine two-lane carriageway.

    The search runs in native C++ when the library is built (utils/native.py),
    falling back to networkx - both produce shortest paths under the same
    euclidean edge weights.
    """
    node_path = None
    if use_native:
        from carla_ppo_tpu.utils import native

        if native.available():
            node_path = native.route_astar(
                town.nodes, np.asarray(town.edges, np.int32),
                int(start_node), int(end_node),
            ).tolist()
    if node_path is None:
        import networkx as nx

        g = town.to_networkx()

        def h(a, b):
            return float(np.linalg.norm(town.nodes[a] - town.nodes[b]))

        node_path = nx.astar_path(
            g, start_node, end_node, heuristic=h, weight="weight"
        )

    dual = town.dual_lookup()
    junctions = _junction_maneuvers(node_path, town.nodes)
    turn_at = {i + 1: opt for i, (_, opt) in enumerate(junctions)}

    # Macro polyline with lane offsets on dual edges.
    pts: List[np.ndarray] = [town.nodes[node_path[0]]]
    lane_changes: List[Tuple[np.ndarray, int, float]] = []  # (mid, opt, span)
    dual_edges: List[Tuple[np.ndarray, np.ndarray]] = []  # (a, b) of dual edges
    for i in range(len(node_path) - 1):
        a = town.nodes[node_path[i]].astype(np.float64)
        b = town.nodes[node_path[i + 1]].astype(np.float64)
        L = float(np.linalg.norm(b - a))
        u = (b - a) / L
        nr = np.array([u[1], -u[0]])  # right normal of the travel direction
        is_dual = dual.get(frozenset((node_path[i], node_path[i + 1])), False)
        if is_dual and L >= _MIN_DUAL_LENGTH:
            off_r = nr * (LANE_WIDTH / 2.0)
            turn_in = turn_at.get(i, int(RoadOption.STRAIGHT))
            turn_out = turn_at.get(i + 1, int(RoadOption.STRAIGHT))
            # Exit on the left lane when the next junction turns left.
            change = turn_out == int(RoadOption.LEFT)
            exit_off = -off_r if change else off_r
            # Keep lane-offset points well away from turning junctions so the
            # corner fillets keep their full radius (a merge point 0.15L from
            # a 90-degree corner clamps the fillet to an undrivable arc).
            enter_frac = 0.40 if turn_in != int(RoadOption.STRAIGHT) else 0.15
            exit_frac = 0.60 if turn_out != int(RoadOption.STRAIGHT) else 0.85
            pts.append(a + u * (enter_frac * L) + off_r)
            if change:
                if enter_frac < 0.45:
                    pts.append(a + u * (0.45 * L) + off_r)
                pts.append(a + u * (0.60 * L) + exit_off)
                lane_changes.append(
                    (a + u * (0.525 * L), int(RoadOption.CHANGELANELEFT), 0.15 * L)
                )
            elif exit_frac > enter_frac:
                pts.append(a + u * (exit_frac * L) + exit_off)
            dual_edges.append((a, b))
        pts.append(b)
    raw = np.asarray(pts)
    smooth = _fillet_path(raw)

    pos = track_mod._resample_polyline(smooth, resolution, closed=False)
    fwd = track_mod._forward_vectors(pos, closed=False)

    maneuver = np.full(pos.shape[0], int(RoadOption.LANEFOLLOW), np.int32)
    for junction_pos, opt in junctions:
        d = np.linalg.norm(pos - junction_pos[None, :], axis=1)
        maneuver[d < 15.0] = opt
    for mid, opt, span in lane_changes:
        d = np.linalg.norm(pos - mid[None, :], axis=1)
        maneuver[d < span / 2.0 + 4.0] = opt

    # Per-waypoint road widths: symmetric single lane by default; on dual
    # edges the OTHER lane extends the road on the side away from the one we
    # drive (continuously, so merges don't step the road edge).
    lw = np.full(pos.shape[0], track_mod.DEFAULT_HALF_WIDTH, np.float32)
    rw = np.full(pos.shape[0], track_mod.DEFAULT_HALF_WIDTH, np.float32)
    for a, b in dual_edges:
        L = float(np.linalg.norm(b - a))
        u = (b - a) / L
        nr = np.array([u[1], -u[0]])
        rel = pos - a[None, :]
        along = rel @ u
        r = rel @ nr  # + = right of the edge axis
        ar = np.abs(r)
        onseg = (along > -2.0) & (along < L + 2.0) & (ar < 2.5 * LANE_WIDTH)
        # Trapezoid in |r|: ramps up to full width at the lane center, holds,
        # and fades out by 2.5 lanes off-axis - every boundary (including the
        # fillet arcs that swing wide near junctions) is continuous.
        frac = np.clip(
            np.minimum(
                ar / (LANE_WIDTH / 2.0),
                (2.5 * LANE_WIDTH - ar) / (1.5 * LANE_WIDTH),
            ),
            0.0,
            1.0,
        )
        # Taper to single-lane width within ~6 m of the edge ends so the
        # road edge never steps discontinuously at junction handoffs.
        taper = np.clip((along + 2.0) / 6.0, 0.0, 1.0) * np.clip(
            (L + 2.0 - along) / 6.0, 0.0, 1.0
        )
        extra = (LANE_WIDTH * frac * taper).astype(np.float32)
        right_lane = onseg & (r > 0)
        left_lane = onseg & (r < 0)
        lw[right_lane] = np.maximum(lw[right_lane], track_mod.DEFAULT_HALF_WIDTH + extra[right_lane])
        rw[left_lane] = np.maximum(rw[left_lane], track_mod.DEFAULT_HALF_WIDTH + extra[left_lane])
    return pos.astype(np.float32), fwd.astype(np.float32), maneuver, lw, rw


def make_route_bank(
    town: TownMap,
    n_routes: int = 64,
    capacity: int = 1024,
    min_length: float = 150.0,
    seed: int = 0,
    half_width: float = track_mod.DEFAULT_HALF_WIDTH,
    props: bool = False,
) -> TrackData:
    """A bank of padded random routes as one stacked TrackData
    (leading axis = route). Replaces the reference's per-reset
    GlobalRoutePlanner call (carla_route_env.py:221-222) with a precomputed
    pool the compiled step samples from."""
    rng = np.random.default_rng(seed)
    n_nodes = len(town.nodes)

    pos_b = np.zeros((n_routes, capacity, 2), np.float32)
    fwd_b = np.zeros((n_routes, capacity, 2), np.float32)
    man_b = np.full((n_routes, capacity), int(RoadOption.LANEFOLLOW), np.int32)
    lw_b = np.full((n_routes, capacity), half_width, np.float32)
    rw_b = np.full((n_routes, capacity), half_width, np.float32)
    len_b = np.zeros((n_routes,), np.int32)

    made = 0
    attempts = 0
    while made < n_routes:
        attempts += 1
        if attempts > n_routes * 50:
            raise RuntimeError("could not sample enough valid routes")
        a, b = rng.choice(n_nodes, size=2, replace=False)
        try:
            pos, fwd, man, lw, rw = compute_route_waypoints(town, int(a), int(b))
        except Exception:
            continue
        n = min(len(pos), capacity)
        if n * 1.0 < min_length:
            continue
        pos_b[made, :n] = pos[:n]
        fwd_b[made, :n] = fwd[:n]
        man_b[made, :n] = man[:n]
        lw_b[made, :n] = lw[:n]
        rw_b[made, :n] = rw[:n]
        # Pad with the final waypoint (keeps gathers on-road).
        pos_b[made, n:] = pos[n - 1]
        fwd_b[made, n:] = fwd[n - 1]
        man_b[made, n:] = man[n - 1]
        lw_b[made, n:] = lw[n - 1]
        rw_b[made, n:] = rw[n - 1]
        len_b[made] = n
        made += 1

    n_slots = capacity // PROP_STRIDE
    routes = []
    for i in range(n_routes):
        t = TrackData(
            pos=jnp.asarray(pos_b[i]),
            fwd=jnp.asarray(fwd_b[i]),
            maneuver=jnp.asarray(man_b[i]),
            left_width=jnp.asarray(lw_b[i]),
            right_width=jnp.asarray(rw_b[i]),
            length=jnp.int32(int(len_b[i])),
            is_loop=jnp.bool_(False),
            prop_class=jnp.full((n_slots, 2), int(SegClass.NONE), jnp.int32),
            prop_lateral=jnp.zeros((n_slots, 2), jnp.float32),
            prop_height=jnp.zeros((n_slots, 2), jnp.float32),
            prop_halfwidth=jnp.zeros((n_slots, 2), jnp.float32),
        )
        if props:  # scene dressing per route (see track.bake_props)
            t = track_mod.bake_props(t, seed=seed * 1009 + i)
        routes.append(t)
    return jax.tree.map(lambda *xs: jnp.stack(xs), *routes)

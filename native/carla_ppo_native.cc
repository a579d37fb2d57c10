// Native host-side runtime for carla_ppo_tpu.
//
// The reference's only native component is the external CARLA server
// (C++/UE4: physics, rendering, HD map). The TPU rebuild moves physics and
// rendering on-device; what remains host-side - map/track preprocessing,
// global route search over the town graph, and a golden-model rasterizer for
// kernel validation - is implemented here in C++ with a plain C ABI consumed
// via ctypes (carla_ppo_tpu/utils/native.py). The numpy implementations in
// envs/track.py and envs/route_planner.py remain as references; this library
// is the fast path when baking thousands of domain-randomized tracks/routes.
//
// Build: make -C native   ->  native/libcarla_ppo_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Track baking: resample a polyline at uniform arc length, emit forward
// vectors and curvature-based maneuver tags.
// (Parity: carla_ppo_tpu/envs/track.py::_resample_polyline/_forward_vectors/
//  _maneuvers_from_curvature; reference semantics: CarlaEnv/planner.py:12-126
//  produces 1 m-spaced waypoints.)
// ---------------------------------------------------------------------------

// RoadOption tags (envs/types.py::RoadOption).
enum { OPT_LEFT = 1, OPT_RIGHT = 2, OPT_LANEFOLLOW = 4 };

static const double kTurnCurvature = 1.0 / 40.0;

// Returns the number of output waypoints written (<= max_out), or -1 if the
// output buffer is too small.
int64_t bake_track(const double* in_xy, int64_t n_in, double resolution,
                   int closed, double* out_xy, double* out_fwd,
                   int32_t* out_maneuver, int64_t max_out) {
  if (n_in < 2) return 0;
  std::vector<double> xs(in_xy, in_xy + 2 * n_in);
  if (closed) {
    xs.push_back(in_xy[0]);
    xs.push_back(in_xy[1]);
  }
  const int64_t n_pts = closed ? n_in + 1 : n_in;

  // Cumulative arc length.
  std::vector<double> s(n_pts, 0.0);
  for (int64_t i = 1; i < n_pts; ++i) {
    const double dx = xs[2 * i] - xs[2 * (i - 1)];
    const double dy = xs[2 * i + 1] - xs[2 * (i - 1) + 1];
    s[i] = s[i - 1] + std::sqrt(dx * dx + dy * dy);
  }
  const double total = s[n_pts - 1];
  const int64_t n_out = static_cast<int64_t>(std::floor(total / resolution));
  if (n_out > max_out) return -1;

  // Linear interpolation at uniform arc length (two-pointer sweep).
  int64_t j = 0;
  for (int64_t i = 0; i < n_out; ++i) {
    const double target = i * resolution;
    while (j + 1 < n_pts - 1 && s[j + 1] < target) ++j;
    const double seg = std::max(s[j + 1] - s[j], 1e-12);
    const double t = (target - s[j]) / seg;
    out_xy[2 * i] = xs[2 * j] * (1 - t) + xs[2 * (j + 1)] * t;
    out_xy[2 * i + 1] = xs[2 * j + 1] * (1 - t) + xs[2 * (j + 1) + 1] * t;
  }

  // Central-difference forward vectors (parity: track.py::_forward_vectors).
  for (int64_t i = 0; i < n_out; ++i) {
    int64_t ip, in_;
    if (closed) {
      ip = (i - 1 + n_out) % n_out;
      in_ = (i + 1) % n_out;
    } else {
      ip = std::max<int64_t>(i - 1, 0);
      in_ = std::min<int64_t>(i + 1, n_out - 1);
    }
    double fx = out_xy[2 * in_] - out_xy[2 * ip];
    double fy = out_xy[2 * in_ + 1] - out_xy[2 * ip + 1];
    const double norm = std::max(std::sqrt(fx * fx + fy * fy), 1e-9);
    out_fwd[2 * i] = fx / norm;
    out_fwd[2 * i + 1] = fy / norm;
  }

  // Signed curvature -> maneuver tags (parity: track.py::_curvature).
  for (int64_t i = 0; i < n_out; ++i) {
    int64_t in_ = closed ? (i + 1) % n_out : std::min<int64_t>(i + 1, n_out - 1);
    const double yaw0 = std::atan2(out_fwd[2 * i + 1], out_fwd[2 * i]);
    const double yaw1 = std::atan2(out_fwd[2 * in_ + 1], out_fwd[2 * in_]);
    double dyaw = yaw1 - yaw0;
    while (dyaw > M_PI) dyaw -= 2 * M_PI;
    while (dyaw < -M_PI) dyaw += 2 * M_PI;
    const double dx = out_xy[2 * in_] - out_xy[2 * i];
    const double dy = out_xy[2 * in_ + 1] - out_xy[2 * i + 1];
    const double ds = std::max(std::sqrt(dx * dx + dy * dy), 1e-9);
    const double kappa = dyaw / ds;
    out_maneuver[i] = kappa > kTurnCurvature    ? OPT_LEFT
                      : kappa < -kTurnCurvature ? OPT_RIGHT
                                                : OPT_LANEFOLLOW;
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// A* over the town road graph.
// (Parity: envs/route_planner.py (networkx astar_path); reference:
//  agents/navigation/global_route_planner.py:221-237.)
// ---------------------------------------------------------------------------

// nodes_xy: [n_nodes, 2]; edges: [n_edges, 2] (undirected).
// out_path: node-id buffer of capacity max_path. Returns path length or -1
// if unreachable / buffer too small.
int64_t route_astar(const double* nodes_xy, int64_t n_nodes,
                    const int32_t* edges, int64_t n_edges, int32_t start,
                    int32_t goal, int32_t* out_path, int64_t max_path) {
  if (start < 0 || goal < 0 || start >= n_nodes || goal >= n_nodes) return -1;
  // Adjacency (CSR-ish).
  std::vector<std::vector<std::pair<int32_t, double>>> adj(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) {
    const int32_t a = edges[2 * e], b = edges[2 * e + 1];
    const double dx = nodes_xy[2 * a] - nodes_xy[2 * b];
    const double dy = nodes_xy[2 * a + 1] - nodes_xy[2 * b + 1];
    const double w = std::sqrt(dx * dx + dy * dy);
    adj[a].push_back({b, w});
    adj[b].push_back({a, w});
  }
  auto h = [&](int32_t n) {
    const double dx = nodes_xy[2 * n] - nodes_xy[2 * goal];
    const double dy = nodes_xy[2 * n + 1] - nodes_xy[2 * goal + 1];
    return std::sqrt(dx * dx + dy * dy);
  };

  const double kInf = 1e30;
  std::vector<double> g(n_nodes, kInf);
  std::vector<int32_t> parent(n_nodes, -1);
  using QItem = std::pair<double, int32_t>;  // (f, node)
  std::priority_queue<QItem, std::vector<QItem>, std::greater<QItem>> open;
  g[start] = 0.0;
  open.push({h(start), start});
  while (!open.empty()) {
    auto [f, n] = open.top();
    open.pop();
    if (n == goal) break;
    if (f > g[n] + h(n) + 1e-9) continue;  // stale entry
    for (auto [m, w] : adj[n]) {
      const double cand = g[n] + w;
      if (cand < g[m]) {
        g[m] = cand;
        parent[m] = n;
        open.push({cand + h(m), m});
      }
    }
  }
  if (g[goal] >= kInf) return -1;

  std::vector<int32_t> rev;
  for (int32_t n = goal; n != -1; n = parent[n]) rev.push_back(n);
  if (static_cast<int64_t>(rev.size()) > max_path) return -1;
  for (size_t i = 0; i < rev.size(); ++i)
    out_path[i] = rev[rev.size() - 1 - i];
  return static_cast<int64_t>(rev.size());
}

// ---------------------------------------------------------------------------
// Golden-model CPU rasterizer (float64): validates the device renderers.
// (Parity: ops/rasterizer.py::render_semantic; one env, one frame.)
// ---------------------------------------------------------------------------

enum {
  SEG_NONE = 0,
  SEG_OTHER = 3,
  SEG_ROADLINES = 6,
  SEG_ROADS = 7,
  SEG_SIDEWALKS = 8,
  SEG_VEGETATION = 9,
};

void render_semantic_cpu(
    // Camera/vehicle pose.
    double pos_x, double pos_y, double yaw, int64_t waypoint_idx,
    // Track (full arrays; the window is taken like the device path).
    const float* track_pos, const float* track_fwd, const float* left_width,
    int64_t track_len, int is_loop,
    // Camera intrinsics.
    int height, int width, double fov_deg, double mount_forward,
    double mount_height, double pitch_deg,
    // Window config.
    int window, int window_behind,
    // Road style.
    double edge_line_width, double center_line_half_width,
    double center_dash_period, double center_dash_duty, double shoulder_width,
    double sidewalk_width,
    // Output [height * width] class ids.
    int32_t* out) {
  const double f = (width / 2.0) / std::tan(fov_deg * M_PI / 360.0);
  const double pitch = std::tan(pitch_deg * M_PI / 180.0);
  const double cos_y = std::cos(yaw), sin_y = std::sin(yaw);
  const double cam_x = pos_x + cos_y * mount_forward;
  const double cam_y = pos_y + sin_y * mount_forward;

  // Gather the waypoint window (wrap on loops, clamp on open routes).
  std::vector<double> wx(window), wy(window), fx(window), fy(window);
  auto wrap_idx = [&](int64_t i) {
    if (is_loop) {
      int64_t m = i % track_len;
      return m < 0 ? m + track_len : m;
    }
    return std::min(std::max<int64_t>(i, 0), track_len - 1);
  };
  for (int k = 0; k < window; ++k) {
    const int64_t i = wrap_idx(waypoint_idx - window_behind + k);
    wx[k] = track_pos[2 * i];
    wy[k] = track_pos[2 * i + 1];
    fx[k] = track_fwd[2 * i];
    fy[k] = track_fwd[2 * i + 1];
  }
  const double half_width = left_width[wrap_idx(waypoint_idx)];
  const double idx0 = static_cast<double>(waypoint_idx - window_behind);

  for (int v = 0; v < height; ++v) {
    for (int u = 0; u < width; ++u) {
      const double lat_ray = (u + 0.5 - width / 2.0) / f;
      const double vert = (height / 2.0 - (v + 0.5)) / f + pitch;
      int32_t cls;
      if (vert >= -1e-6) {
        cls = SEG_NONE;  // sky
      } else {
        const double t = mount_height / -vert;
        const double dx = cos_y + sin_y * lat_ray;
        const double dy = sin_y - cos_y * lat_ray;
        const double px = cam_x + t * dx;
        const double py = cam_y + t * dy;

        // Nearest window waypoint.
        int best = 0;
        double best_d2 = 1e30;
        for (int k = 0; k < window; ++k) {
          const double ddx = px - wx[k], ddy = py - wy[k];
          const double d2 = ddx * ddx + ddy * ddy;
          if (d2 < best_d2) {
            best_d2 = d2;
            best = k;
          }
        }
        const double rel_x = px - wx[best], rel_y = py - wy[best];
        const double lat = fx[best] * rel_y - fy[best] * rel_x;
        const double along = rel_x * fx[best] + rel_y * fy[best];
        const double s = idx0 + best + along;
        const double alat = std::fabs(lat);
        const double nearest_dist = std::sqrt(std::max(best_d2, 0.0));

        const bool on_road = alat <= half_width;
        const bool edge_line =
            std::fabs(alat - half_width) <= edge_line_width / 2.0;
        double smod = std::fmod(s, center_dash_period);
        if (smod < 0) smod += center_dash_period;
        const bool dash_on = smod < center_dash_period * center_dash_duty;
        const bool center_line = alat <= center_line_half_width && dash_on;
        const bool shoulder =
            alat > half_width && alat <= half_width + shoulder_width;
        const double side0 = half_width + shoulder_width;
        const bool sidewalk = alat > side0 && alat <= side0 + sidewalk_width;
        const bool corridor = nearest_dist <= side0 + sidewalk_width + 25.0;

        cls = SEG_VEGETATION;
        if (sidewalk) cls = SEG_SIDEWALKS;
        if (shoulder) cls = SEG_OTHER;
        if (on_road) cls = SEG_ROADS;
        if (on_road && center_line) cls = SEG_ROADLINES;
        if (edge_line) cls = SEG_ROADLINES;
        if (!corridor) cls = SEG_VEGETATION;
      }
      out[v * width + u] = cls;
    }
  }
}

}  // extern "C"

"""Core pytree types for the TPU-native driving environments.

Everything that the reference keeps as mutable Python attributes on its env
objects (reference: CarlaEnv/carla_lap_env.py:233-249, metrics and per-episode
state) lives here in immutable `flax.struct` dataclasses so the whole simulator
state is a single pytree that can be vmapped over thousands of envs, carried
through `lax.scan`, and sharded over a device mesh.
"""

from __future__ import annotations

import enum
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


# Static NPC slot count (array shape; EnvParams.num_npcs enables a prefix).
NUM_NPC_SLOTS = 8


class RoadOption(enum.IntEnum):
    """High-level maneuver annotation for route waypoints.

    Mirrors the enum the reference copies from CARLA's PythonAPI
    (reference: CarlaEnv/agents/navigation/local_planner.py:20-30).
    """

    VOID = -1
    LEFT = 1
    RIGHT = 2
    STRAIGHT = 3
    LANEFOLLOW = 4
    CHANGELANELEFT = 5
    CHANGELANERIGHT = 6


class SegClass(enum.IntEnum):
    """CARLA 0.9.x semantic-segmentation class ids (13 classes).

    The reference's VAE consumes the red channel of CARLA's seg camera divided
    by 12 so values land in [0, 1] (reference: vae/train_vae.py:26-29); the
    palette is listed in reference: vae/vae_plots.py:49-71.
    """

    NONE = 0
    BUILDINGS = 1
    FENCES = 2
    OTHER = 3
    PEDESTRIANS = 4
    POLES = 5
    ROADLINES = 6
    ROADS = 7
    SIDEWALKS = 8
    VEGETATION = 9
    VEHICLES = 10
    WALLS = 11
    TRAFFICSIGNS = 12


NUM_SEG_CLASSES = 13


# One roadside-prop slot per PROP_STRIDE waypoints per side (see track.py
# bake_props and ops/rasterizer billboard pass).
PROP_STRIDE = 4


@struct.dataclass
class TrackData:
    """Device-resident route: a padded polyline of waypoints 1 m apart.

    Replaces the reference's list of `(carla.Waypoint, RoadOption)` tuples
    (reference: CarlaEnv/planner.py:12-126). Built host-side by
    `carla_ppo_tpu.envs.track` and baked to device arrays once.

    All arrays are padded to a static capacity so route banks stack into a
    single ragged-free tensor; `length` gives the live prefix.

    Roadside props (the scene dressing CARLA's Town07 world has: buildings,
    fences, poles, walls, signs, pedestrians, parked vehicles) are stored in
    ROAD coordinates - one slot every PROP_STRIDE waypoints per side, each a
    (class, signed lateral offset, height, half-width) tuple - so the same
    prop tables follow any track geometry and gather with the same windowed
    indexing as the waypoints. All-NONE tables (the default) render nothing.
    """

    pos: jax.Array  # [N, 2] float32 waypoint xy (meters)
    fwd: jax.Array  # [N, 2] float32 unit forward vector per waypoint
    maneuver: jax.Array  # [N] int32 RoadOption per waypoint
    left_width: jax.Array  # [N] float32 distance center -> left road edge
    right_width: jax.Array  # [N] float32 distance center -> right road edge
    length: jax.Array  # [] int32 number of live waypoints
    is_loop: jax.Array  # [] bool, True for the closed lap circuit
    # Roadside props, [N // PROP_STRIDE, 2] per (slot, side): side 0 = left
    # (positive lateral), side 1 = right (negative lateral).
    prop_class: jax.Array  # int32 SegClass (NONE = empty slot)
    prop_lateral: jax.Array  # float32 signed offset from centerline (m)
    prop_height: jax.Array  # float32 billboard height (m)
    prop_halfwidth: jax.Array  # float32 billboard half-width (m)

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def prop_slots(self) -> int:
        return self.prop_class.shape[0]


@struct.dataclass
class VehicleParams:
    """Single-track (bicycle) vehicle model parameters.

    Tuned to behave like the `vehicle.lincoln.mkz2017` the reference spawns
    (reference: CarlaEnv/wrappers.py:189): ~1900 kg sedan, 2.85 m wheelbase,
    reaching the 15-25 km/h reward band within a few seconds of full throttle.
    """

    wheelbase: jax.Array = struct.field(default_factory=lambda: jnp.float32(2.85))
    # Distance from center of gravity to the rear axle.
    lr: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.45))
    mass: jax.Array = struct.field(default_factory=lambda: jnp.float32(1900.0))
    # Maximum front-wheel steer angle (rad) at steer command = +-1.
    max_steer: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.61))
    # Peak tractive force (N) at full throttle and v = 0.
    engine_force: jax.Array = struct.field(default_factory=lambda: jnp.float32(8000.0))
    # Full-brake force (CARLA VehicleControl.brake=1): ~0.54 g for the MKZ.
    # Only the scripted agents' optional 3rd action channel reaches it - the
    # RL action space is [steer, throttle], same as the reference.
    brake_force: jax.Array = struct.field(default_factory=lambda: jnp.float32(10000.0))
    # Top speed (m/s); tractive force fades linearly to 0 at v_max.
    v_max: jax.Array = struct.field(default_factory=lambda: jnp.float32(38.0))
    # Aerodynamic drag: F = drag_coef * v^2  (0.5 * rho * Cd * A).
    drag_coef: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.42))
    # Rolling resistance: F = roll_coef * m * g.
    roll_coef: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.012))
    # Lateral acceleration limit (m/s^2) used by the dynamic grip clamp.
    max_lat_accel: jax.Array = struct.field(default_factory=lambda: jnp.float32(7.5))
    # First-order steering actuator time constant (s); CARLA's steering rack
    # is not instantaneous either.
    steer_tau: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.08))


@struct.dataclass
class VehicleState:
    """Pose + body-frame velocities of one vehicle.

    `vx` is longitudinal body velocity (>= 0, no reverse: the reference action
    space has no brake/reverse, reference: carla_lap_env.py:136), `vy` lateral,
    `yaw_rate` about +z. Scalars are float32 so a vmapped batch is [B]-shaped.
    """

    pos: jax.Array  # [2] float32 world xy
    yaw: jax.Array  # [] float32 heading (rad)
    vx: jax.Array  # [] float32 body-frame longitudinal velocity (m/s)
    vy: jax.Array  # [] float32 body-frame lateral velocity (m/s)
    yaw_rate: jax.Array  # [] float32 (rad/s)
    steer_angle: jax.Array  # [] float32 actual front-wheel angle (rad)

    @property
    def speed(self) -> jax.Array:
        """Ground speed (m/s); reference: CarlaEnv/wrappers.py:212-214."""
        return jnp.sqrt(self.vx**2 + self.vy**2)

    @property
    def velocity(self) -> jax.Array:
        """World-frame velocity vector [2]."""
        c, s = jnp.cos(self.yaw), jnp.sin(self.yaw)
        return jnp.stack(
            [c * self.vx - s * self.vy, s * self.vx + c * self.vy], axis=-1
        )

    @property
    def forward(self) -> jax.Array:
        """World-frame unit forward vector [2]."""
        return jnp.stack([jnp.cos(self.yaw), jnp.sin(self.yaw)], axis=-1)

    @classmethod
    def create(cls, pos, yaw) -> "VehicleState":
        zero = jnp.zeros_like(jnp.asarray(yaw, jnp.float32))
        return cls(
            pos=jnp.asarray(pos, jnp.float32),
            yaw=jnp.asarray(yaw, jnp.float32),
            vx=zero,
            vy=zero,
            yaw_rate=zero,
            steer_angle=zero,
        )


@struct.dataclass
class EnvState:
    """Complete per-env simulator state (one pytree leaf set per env).

    Field-by-field parity with the imperative attributes the reference smears
    over its env instance (reference: carla_lap_env.py:233-249, 310-405):

    - control            <- vehicle.control.{steer, throttle} (smoothed)
    - waypoint_idx       <- current_waypoint_index (monotonic, never wraps)
    - start_waypoint_idx <- start_waypoint_index
    - checkpoint_idx     <- checkpoint_waypoint_index (survives episode reset)
    - low_speed_timer    <- reward_functions.py:4 module global, made per-env
                            (the reference shares one global across envs - a
                            documented bug we do not replicate)
    - metrics            <- total_reward / distance_traveled /
                            center_lane_deviation / speed_accum / laps_completed
    """

    vehicle: VehicleState
    control: jax.Array  # [2] float32 smoothed (steer, throttle)
    waypoint_idx: jax.Array  # [] int32
    start_waypoint_idx: jax.Array  # [] int32
    checkpoint_idx: jax.Array  # [] int32
    route_id: jax.Array  # [] int32 (route env: index into the route bank)
    num_routes_completed: jax.Array  # [] int32 (route env)
    low_speed_timer: jax.Array  # [] float32 seconds
    step_count: jax.Array  # [] int32
    time: jax.Array  # [] float32 sim seconds since episode start
    terminal: jax.Array  # [] bool
    truncated: jax.Array  # [] bool (terminal due to step/time limit only)
    termination_reason: jax.Array  # [] int32 TerminationReason
    is_training: jax.Array  # [] bool (training resets go to checkpoint)
    rng: jax.Array  # PRNG key for domain randomization
    # Step-derived quantities the reward plugins read (reference reads these
    # as env attributes; reward_functions.py:27-33, 84-101).
    distance_from_center: jax.Array  # [] float32
    angle_to_road: jax.Array  # [] float32 signed rad, velocity vs wp forward
    last_reward: jax.Array  # [] float32
    collision: jax.Array  # [] bool (this step)
    lane_invasion: jax.Array  # [] bool (this step)
    prev_pos: jax.Array  # [2] float32 (for distance_traveled)
    # Episodic metric accumulators.
    total_reward: jax.Array  # [] float32
    distance_traveled: jax.Array  # [] float32
    center_lane_deviation: jax.Array  # [] float32 (sum of per-step deviation)
    speed_accum: jax.Array  # [] float32 (sum of per-step speed, m/s)
    laps_completed: jax.Array  # [] float32 (fraction; route env: routes)
    # Per-env discounted-return estimate for VecNormalize-style reward
    # scaling (ops/running_stats); lives here (per-env state) so the
    # checkpointed TrainState stays shape-stable across env-batch sizes.
    vecnorm_return: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    # NPC traffic (other vehicles - the reference world has them, ours gains
    # them in round 2): arc position along the track (waypoint units ~ m,
    # monotonic), speed (m/s) and signed lateral offset per slot. Slots
    # beyond EnvParams.num_npcs are inactive.
    npc_s: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((NUM_NPC_SLOTS,), jnp.float32)
    )
    npc_speed: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((NUM_NPC_SLOTS,), jnp.float32)
    )
    npc_lateral: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((NUM_NPC_SLOTS,), jnp.float32)
    )
    # Overtake bookkeeping (traffic configs): NPCs whose along-track gap
    # sign-flipped ahead->behind THIS step, and the episode's cumulative
    # count (an episodic metric; reward_traffic_add pays
    # RewardParams.pass_bonus per event).
    npc_just_passed: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    npc_overtakes: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    # Route env: fractional-route credit of the episode's SPAWN position
    # (start_waypoint_idx / route length at reset; 0 unless the junction
    # curriculum spawned mid-route). Subtracted from routes_completed so a
    # mid-route spawn doesn't count its skipped prefix as driven progress.
    route_frac_offset: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )


class TerminationReason(enum.IntEnum):
    """Why an episode ended; mirrors the HUD `terminal_reason` strings
    (reference: reward_functions.py:22-40) plus the causes the reference logs
    but never acts on (collision / lane invasion, carla_lap_env.py:453-459)."""

    RUNNING = 0
    VEHICLE_STOPPED = 1  # "Vehicle stopped"
    OFF_TRACK = 2  # "Off-track"
    TOO_FAST = 3  # "Too fast"
    LAPS_DONE = 4  # 3 laps completed (carla_lap_env.py:392-395)
    MAX_DISTANCE = 5  # route env 3000 m budget (carla_route_env.py:381-383)
    COLLISION = 6
    LANE_INVASION = 7
    TIME_LIMIT = 8


@struct.dataclass
class RewardParams:
    """Constants of the reward/termination plugin layer
    (reference: reward_functions.py:4-6, 80-81, 98-101)."""

    max_distance: jax.Array = struct.field(default_factory=lambda: jnp.float32(3.0))
    target_speed: jax.Array = struct.field(default_factory=lambda: jnp.float32(20.0))
    min_speed: jax.Array = struct.field(default_factory=lambda: jnp.float32(15.0))
    max_speed: jax.Array = struct.field(default_factory=lambda: jnp.float32(25.0))
    # Optional hard speed termination; <= 0 disables (reference has this
    # feature but with an unbound-variable bug, reward_functions.py:38 - we
    # implement it correctly).
    max_speed_terminate: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(-1.0)
    )
    low_speed_timeout: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(5.0)
    )
    low_speed_threshold: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(1.0 / 3.6)
    )
    terminal_penalty: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(-10.0)
    )
    angle_factor_max: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(jnp.deg2rad(20.0))
    )
    # One-time bonus per completed overtake (reward_traffic_add; an NPC's
    # along-track gap sign-flips ahead -> behind). Sized to beat the
    # proximity penalties an overtake accrues (~30 reward over a 2 s pass)
    # so passing decisively outearns tailgating at NPC pace.
    pass_bonus: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(20.0)
    )
    # Blocked-reward gate (reward_traffic_add): while an active NPC sits
    # ahead in-lane within block_range meters along-track, the positive
    # shaping terms (speed + centering + angle) are scaled by blocked_scale.
    # 1.0 = off (round-4 behavior). This is the decisive anti-pacing lever:
    # round 4 showed that raising the speed plateau above NPC pace still
    # leaves queueing behind traffic earning ~2.5/step (full centering +
    # angle + partial speed), so risk-adjusted pacing stayed optimal and
    # both reshaped fine-tunes ended with 0.0 overtakes
    # (models/traffic_*_r4/best_score.json). Gating the whole positive
    # reward while blocked makes passing the ONLY way to earn full pay.
    blocked_scale: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(1.0)
    )
    block_range: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(15.0)
    )


@struct.dataclass
class EnvParams:
    """Environment configuration + baked track data.

    Static (non-pytree) fields change the traced program; array fields can be
    swept / randomized without recompilation.
    """

    track: TrackData
    vehicle: VehicleParams = struct.field(default_factory=VehicleParams)
    reward: RewardParams = struct.field(default_factory=RewardParams)

    dt: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0 / 30.0))
    action_smoothing: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    max_laps: jax.Array = struct.field(default_factory=lambda: jnp.float32(3.0))
    max_distance_traveled: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(jnp.inf)
    )
    # Respawn-checkpoint spacing in waypoints (reference: carla_lap_env.py:399).
    checkpoint_frequency: jax.Array = struct.field(
        default_factory=lambda: jnp.int32(50)
    )
    # The reference has NO step limit: lap episodes end at 3 laps or a
    # termination cause (carla_lap_env.py:392-395, reward_functions.py:21-55).
    # Keep a far-out bound as a safety net only; a tight limit silently
    # truncates good policies (3 laps at 17 km/h is ~22k steps).
    max_episode_steps: jax.Array = struct.field(
        default_factory=lambda: jnp.int32(1_000_000)
    )
    # Spawn jitter (domain randomization), meters / radians std.
    spawn_pos_noise: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0))
    spawn_yaw_noise: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0))
    # Route env, training only: probability that a fresh episode spawns
    # `junction_spawn_backoff` waypoints before a random junction segment of
    # its route instead of at the route start. A failure-driven curriculum
    # for junction traversal: greedy-eval deaths concentrate at junctions
    # (round-3 route-latent calibration gap, ROADMAP item 1), and spawning
    # ahead of them multiplies junction experience per env-step. 0 = off
    # (reference parity: carla_route_env.py:189-240 spawns at route start).
    junction_spawn_prob: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    junction_spawn_backoff: jax.Array = struct.field(
        default_factory=lambda: jnp.int32(25)
    )
    # NPC traffic: how many of the NUM_NPC_SLOTS are live (0 = no traffic,
    # the reference-parity default), their speed range (m/s), and the
    # ego-overlap box that counts as a collision (half-length/width, m).
    # STATIC (python int, part of the jit treedef): with it traced, every
    # zero-NPC config still paid the full reactive-traffic tick per env step
    # - [M, M+1] gap matrices, two track-width gathers, wander/jitter sines -
    # because XLA could not prove the active mask empty. Measured on the
    # vector pipeline @1024 envs: 2.35 M env-steps/s traced vs 3.81 M with
    # the block pruned. Static, num_npcs=0 constant-folds the mask and the
    # whole NPC tick (and the rasterizer's billboard candidates) dead.
    num_npcs: int = struct.field(pytree_node=False, default=0)
    npc_min_speed: jax.Array = struct.field(default_factory=lambda: jnp.float32(4.0))
    npc_max_speed: jax.Array = struct.field(default_factory=lambda: jnp.float32(7.0))
    npc_collision_s: jax.Array = struct.field(default_factory=lambda: jnp.float32(4.0))
    npc_collision_lat: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.5))
    # Reactive NPC dynamics (round 4 - the rail NPCs the round-3 verdict
    # flagged: constant speed, frozen lateral). Static toggle so the rail
    # behavior stays available for A/B (npc_reactive=False reproduces it
    # exactly). The reference analog is live CARLA traffic actors with
    # autopilot (reference: CarlaEnv/wrappers.py:186-217).
    npc_reactive: bool = struct.field(pytree_node=False, default=True)
    # Car-following: an NPC brakes toward 0 as its in-lane gap to the
    # nearest vehicle ahead (NPC or EGO) closes from follow_dist to
    # follow_min (meters along-track); lane membership = |lateral diff| <
    # follow_lat.
    npc_follow_lat: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.2))
    npc_follow_min: jax.Array = struct.field(default_factory=lambda: jnp.float32(6.0))
    npc_follow_dist: jax.Array = struct.field(default_factory=lambda: jnp.float32(14.0))
    # Multiplicative speed jitter amplitude (sinusoidal, per-slot phase).
    npc_speed_jitter: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.12))
    # Lateral lane-wander rate (m/s, sinusoidal velocity -> bounded ~0.9 m
    # oscillation at 30 fps), clamped to the road width at the NPC's
    # waypoint minus a half-car margin.
    npc_wander_rate: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.5))
    # Lane keeping: a spring (rate keep_gain 1/s) pulling each NPC's lateral
    # offset toward keep_lat while it wanders. keep_gain=0 reproduces the
    # round-4 free walk exactly (NPCs drift anywhere across the road, so the
    # passing corridor opens and closes at random - one of the two reasons
    # the round-4 overtaker fine-tunes regressed to pacing). A keep-right
    # home (keep_lat < 0) with gain ~0.8 holds traffic to one side the way
    # real lane discipline does, leaving a learnable corridor on the left.
    npc_keep_lat: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0))
    npc_keep_gain: jax.Array = struct.field(default_factory=lambda: jnp.float32(0.0))
    # Traffic lights at junction entries: waypoint index + phase offset (s)
    # per light, sharing one green->yellow->red cycle. The default EMPTY
    # table means no lights anywhere - the reference-parity RL configs,
    # whose training routes never gate on a light either; the scripted
    # agents' red-light stop (envs/traffic_lights.py, reference:
    # agents/navigation/agent.py:61-127) activates when a table is present.
    light_wp: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((0,), jnp.int32)
    )
    light_phase: jax.Array = struct.field(
        default_factory=lambda: jnp.zeros((0,), jnp.float32)
    )
    light_period: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(16.0)
    )
    light_green_frac: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.5)
    )
    light_yellow_frac: jax.Array = struct.field(
        default_factory=lambda: jnp.float32(0.125)
    )

    # --- static fields (affect the compiled program) ---
    physics_substeps: int = struct.field(pytree_node=False, default=2)
    reward_fn: str = struct.field(
        pytree_node=False, default="reward_speed_centering_angle_multiply"
    )
    dynamics_model: str = struct.field(pytree_node=False, default="kinematic")
    # How many waypoints ahead the in-jit waypoint-advance search scans per
    # step (reference walks an unbounded Python loop, carla_lap_env.py:361-371;
    # at <= 45 km/h and 30 fps the car passes < 1 waypoint per step, so a
    # small static window is exact in practice).
    waypoint_lookahead: int = struct.field(pytree_node=False, default=8)
    terminate_on_collision: bool = struct.field(pytree_node=False, default=False)
    terminate_on_lane_invasion: bool = struct.field(pytree_node=False, default=False)
    # Whether the renderer's billboard pass includes the NUM_NPC_SLOTS
    # vehicle candidates. With num_npcs == 0 every NPC slot is class NONE and
    # the pass provably composites nothing, but each slot still costs a full
    # [1, P] lane pass in the depth test - a static False removes ~8/72 of
    # the billboard work. The Trainer sets this to (num_npcs > 0); the
    # default True keeps hand-built EnvParams(num_npcs=k) rendering correct.
    render_npc_billboards: bool = struct.field(pytree_node=False, default=True)
    # Lap env: eval resets go to waypoint 0; training resets to the checkpoint
    # (reference: carla_lap_env.py:206-213).

    def __post_init__(self):
        # num_npcs became a STATIC treedef field in round 4 (see its comment
        # above) - an API break for callers still passing a JAX scalar
        # (replace(num_npcs=jnp.int32(k)) used to work). A traced/array value
        # embedded in the treedef fails jit hashing with a non-obvious error
        # and each distinct value forces a recompile; coerce concrete values
        # and fail loudly on tracers instead.
        n = self.num_npcs
        if not isinstance(n, int):
            import jax.core as _core

            if isinstance(n, _core.Tracer):
                raise TypeError(
                    "EnvParams.num_npcs is a STATIC (treedef) field and "
                    "cannot be traced; pass a python int (it selects program "
                    "structure - see the field comment)"
                )
            object.__setattr__(self, "num_npcs", int(n))


def default_env_state(
    track: TrackData, rng: Optional[jax.Array] = None
) -> EnvState:
    """A zero-initialized EnvState placed at waypoint 0 of `track`."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    f0 = jnp.float32(0.0)
    i0 = jnp.int32(0)
    return EnvState(
        vehicle=VehicleState.create(track.pos[0], _yaw_of(track.fwd[0])),
        control=jnp.zeros((2,), jnp.float32),
        waypoint_idx=i0,
        start_waypoint_idx=i0,
        checkpoint_idx=i0,
        route_id=i0,
        num_routes_completed=i0,
        low_speed_timer=f0,
        step_count=i0,
        time=f0,
        terminal=jnp.bool_(False),
        truncated=jnp.bool_(False),
        termination_reason=jnp.int32(TerminationReason.RUNNING),
        is_training=jnp.bool_(True),
        rng=rng,
        distance_from_center=f0,
        angle_to_road=f0,
        last_reward=f0,
        collision=jnp.bool_(False),
        lane_invasion=jnp.bool_(False),
        prev_pos=jnp.asarray(track.pos[0], jnp.float32),
        total_reward=f0,
        distance_traveled=f0,
        center_lane_deviation=f0,
        speed_accum=f0,
        laps_completed=f0,
    )


def _yaw_of(fwd: jax.Array) -> jax.Array:
    return jnp.arctan2(fwd[..., 1], fwd[..., 0])

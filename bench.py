"""Headline benchmark: PPO training env-steps/sec at 1024 vectorized envs.

Measures the FULL fused pipeline (rollout + GAE + 3x4 minibatch Adam updates,
vector observations) on whatever devices are attached, and prints ONE JSON
line. Baseline: the reference runs one CARLA env at 30 FPS with batch-of-1
sess.run round-trips => ~30 env-steps/sec (BASELINE.md "Simulation rate").

The line's `extra` dict additionally tracks the perception pipelines so the
headline can't silently regress on them: frozen-VAE latent training steps/s
and the semantic-camera render time for 1024 frames.

Reproducibility rules (VERDICT round-2 item 3): every configuration is
PINNED and stated here - perception numbers are measured on the RICH
13-class scene (props=True, the scene the shipped agents train on), the
render benchmark times the JITTED production program (the unjitted vmap the
round-2 bench timed paid per-op dispatch on the remote axon path), and every
number is the MEDIAN of `TRIALS` timed repeats.

Timing methodology for the axon remote platform: `block_until_ready` there
costs roughly a full device->host TRANSFER of the blocked buffer (measured:
blocking the params pytree every iteration inflated a 31.5 ms iteration to
~69 ms; a [1024,80,160] frame block added ~22 ms), so each trial times a
CHAIN of `iters` data-dependent calls and synchronizes ONCE on a scalar
host fetch at the end. README performance claims must match this file's
driver-captured output.
"""

from __future__ import annotations

import dataclasses
import json
import statistics
import time

import numpy as np

import jax


NUM_ENVS = 1024
HORIZON = 128
BASELINE_STEPS_PER_SEC = 30.0  # reference: one CARLA env @ 30 FPS
TRIALS = 5

# TPU v5e single-chip peaks (public spec: 197 bf16 TFLOP/s MXU, f32 convs/
# matmuls run ~1/4 of that; 819 GB/s HBM). Used for MFU/roofline accounting
# (VERDICT round-3 item 6) - update if the driver ever lands on another chip.
V5E_PEAK_FLOPS = {"bf16": 197e12, "f32": 49e12}
V5E_HBM_BYTES_PER_S = 819e9
# VPU elementwise peak: 4 (8,128) vector units per core at ~0.94 GHz.
V5E_PEAK_VPU_OPS = 4 * 8 * 128 * 0.94e9


def xla_cost(jitted, *args, **kwargs):
    """(flops, hbm_bytes) from XLA's compiled cost analysis; (0, 0) when the
    platform/lowering does not expose it. Pallas custom-calls report no
    flops, so kernels need analytic accounting on top (see render_cost)."""
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def render_cost(num_envs: int):
    """Analytic per-batch cost of the production renderer (the Pallas ground
    kernel is a custom call XLA's cost analysis cannot see into).

    Returns (vpu_lane_ops, hbm_bytes). VPU ops: the [K, Ppad] distance/
    selection block is ~11 elementwise passes, the batched tail+ladder ~37
    [1, Ppad] passes per env per stripe; the XLA billboard composite is
    2 ops per candidate-pixel (factorized min-max contraction, N=64
    candidates after the NPC prune). HBM: the kernel writes [B, SUMP] int32,
    the composite reads it and writes the final [B, H, W] frame (window
    prep operands are KB-scale - ignored)."""
    from carla_ppo_tpu.ops.rasterizer import CameraConfig
    from carla_ppo_tpu.ops.rasterizer_pallas import _stripe_layout

    cam = CameraConfig()
    plan, slab, _ = _stripe_layout(cam)
    sump = slab.shape[1]
    per_env = 0.0
    for K, _, ppad in plan:
        per_env += 11.0 * K * ppad + 37.0 * ppad
    n_candidates = 2 * (cam.window // 4)  # prop slots; NPC slots pruned
    billboard = 2.0 * n_candidates * cam.height * cam.width
    vpu_ops = num_envs * (per_env + billboard)
    hbm = num_envs * (sump * 4 + sump * 4 + cam.height * cam.width * 4)
    return vpu_ops, hbm


def median_time(fn, sync, iters: int, trials: int = TRIALS) -> float:
    """Median across `trials` of the mean seconds/call over `iters` chained
    calls of `fn`, synchronizing once per trial via `sync()` (which must
    force completion with a small host fetch - NOT block_until_ready, see
    module docstring)."""
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        times.append((time.perf_counter() - t0) / iters)
    return statistics.median(times)


def main() -> None:
    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.training import ppo

    import jax.numpy as jnp

    # --- headline: vector-obs PPO training (rendering-free pipeline; scene
    # dressing does not enter the vector path, so the plain lap track is the
    # pinned config) ---
    model = ActorCritic()
    config = ppo.PPOConfig(num_envs=NUM_ENVS, horizon=HORIZON)
    env_params = EnvParams(track=track.make_lap_track(seed=0, props=False))

    rng = jax.random.PRNGKey(0)
    train_state = ppo.create_train_state(model, config, vector_obs_dim(), rng)
    env_states = ppo.init_env_batch(env_params, NUM_ENVS, rng)

    state = {"ts": train_state, "envs": env_states}

    def vector_iter():
        state["ts"], state["envs"], _ = ppo.train_iteration(
            state["ts"], state["envs"], env_params, model, config
        )

    def vector_sync():
        float(state["ts"].total_env_steps)  # scalar fetch forces completion

    vector_iter()
    vector_iter()  # warmup / compile
    vector_sync()
    sec = median_time(vector_iter, vector_sync, iters=10)
    steps_per_sec = NUM_ENVS * HORIZON / sec
    vec_flops, vec_bytes = xla_cost(
        ppo.train_iteration, train_state, env_states, env_params, model,
        config,
    )
    # The vector pipeline runs f32 matmuls; MFU against the f32 MXU peak.
    vector_mfu = vec_flops / sec / V5E_PEAK_FLOPS["f32"] if vec_flops else 0.0
    vector_hbm = vec_bytes / sec / V5E_HBM_BYTES_PER_S if vec_bytes else 0.0

    # --- vector scaling legs: {1024, 8192} x {f32, bf16} re-pinned EVERY
    # round (round-4 verdict item 4: the README's 8192/bf16 numbers were
    # round-2 vintage, and the narrow 1024-f32 headline missed a 36%
    # regression for most of a round). bf16 = pure bfloat16 trunks (the
    # round-2 comparison point; the CLI's production default is 'mixed').
    scaling = {}
    model_bf16 = ActorCritic(dtype=jnp.bfloat16)
    for envs_n, dtype_name, m in (
        (NUM_ENVS, "bf16", model_bf16),
        (8192, "f32", model),
        (8192, "bf16", model_bf16),
    ):
        cfg_s = ppo.PPOConfig(num_envs=envs_n, horizon=HORIZON)
        st = {
            "ts": ppo.create_train_state(m, cfg_s, vector_obs_dim(), rng),
            "envs": ppo.init_env_batch(env_params, envs_n, rng),
        }

        def s_iter(m=m, cfg_s=cfg_s, st=st):
            st["ts"], st["envs"], _ = ppo.train_iteration(
                st["ts"], st["envs"], env_params, m, cfg_s
            )

        def s_sync(st=st):
            float(st["ts"].total_env_steps)

        s_iter()
        s_iter()
        s_sync()
        s_sec = median_time(s_iter, s_sync, iters=4)
        scaling[f"vector_steps_per_sec_{envs_n}_{dtype_name}"] = round(
            envs_n * HORIZON / s_sec, 1
        )

    # --- perception pipelines: PINNED to the rich 13-class scene ---
    from carla_ppo_tpu.models import vae_common
    from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
    from carla_ppo_tpu.ops import rasterizer as R
    from carla_ppo_tpu.training import pixels as pixels_mod

    # render_npc_billboards=False matches the Trainer's num_npcs=0 program
    # (the pinned perception configs train without traffic).
    rich_params = EnvParams(
        track=track.make_lap_track(seed=0, props=True),
        render_npc_billboards=False,
    )

    # Latent training with the recommended recipe: bfloat16 compute for the
    # frozen encoder + policy trunks (params stay f32; quality validated by
    # the bf16 lap solve - see README).
    model_l = ActorCritic(dtype=jnp.bfloat16)
    vae = vae_common.build_vae(
        64, "cnn", 1, source_shape=(80, 160, 1), dtype=jnp.bfloat16
    )
    vae_vars = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 1)), jax.random.PRNGKey(1), True
    )
    latent = ppo.LatentObs(vae_model=vae, source="seg")
    lstate = {
        "ts": ppo.create_train_state(model_l, config, latent.obs_dim, rng),
        "envs": ppo.init_env_batch(rich_params, NUM_ENVS, rng),
    }

    def latent_iter():
        lstate["ts"], lstate["envs"], _ = ppo.train_iteration(
            lstate["ts"], lstate["envs"], rich_params, model_l, config,
            latent_obs=latent, vae_variables=vae_vars,
        )

    def latent_sync():
        float(lstate["ts"].total_env_steps)

    latent_iter()  # compile
    latent_sync()
    latent_sec = median_time(latent_iter, latent_sync, iters=2)
    latent_sps = NUM_ENVS * HORIZON / latent_sec
    lat_flops, _ = xla_cost(
        ppo.train_iteration, lstate["ts"], lstate["envs"], rich_params,
        model_l, config, latent_obs=latent, vae_variables=vae_vars,
    )
    # bf16 encoder+policy rollout; XLA cannot see into the Pallas render
    # (a custom call), so this MFU covers the XLA portion only - the render
    # is VPU-bound and accounted separately below.
    latent_mfu = (
        lat_flops / latent_sec / V5E_PEAK_FLOPS["bf16"] if lat_flops else 0.0
    )

    # Semantic-camera render, measured the way production runs it: INSIDE a
    # scanned program. Every consumer (the pixel/latent rollout scans) fuses
    # render_batch per step of one XLA program; a standalone per-call
    # dispatch additionally pays the axon remote-queue overhead production
    # never sees (~2.9 ms of the round-3 standalone 6.6 ms - measured by
    # benchmarks/profile_latent.py, RESULTS_round4). The scan carries a real
    # data dependence (the frame sum's low bit perturbs the next step's
    # waypoint_idx by 0/1 - same render cost, opaque to XLA) so the chain
    # cannot be hoisted or folded. The per-dispatch number ships alongside
    # as seg_render_dispatch_ms for continuity with rounds 1-3.
    RENDER_SCAN = 32

    @jax.jit
    def render_scan(states):
        def body(idx, _):
            st = states.replace(waypoint_idx=idx)
            cls = R.render_batch(st, rich_params)
            bump = cls.sum(dtype=jnp.int32) & 1
            return idx + bump, cls.reshape(NUM_ENVS, -1)[0, 0]

        idx, last = jax.lax.scan(
            body, states.waypoint_idx, None, length=RENDER_SCAN
        )
        return idx.sum() + last.sum()

    sout = {"x": render_scan(lstate["envs"])}
    np.asarray(sout["x"])

    def render_scan_once():
        sout["x"] = render_scan(lstate["envs"])

    def render_scan_sync():
        np.asarray(sout["x"])

    render_ms = (
        median_time(render_scan_once, render_scan_sync, iters=2)
        / RENDER_SCAN * 1e3
    )

    render = jax.jit(
        lambda s: R.render_batch(s, rich_params).sum(dtype=jax.numpy.int32)
    )
    out = {"x": render(lstate["envs"])}
    np.asarray(out["x"])

    def render_once():
        out["x"] = render(lstate["envs"])

    def render_sync():
        np.asarray(out["x"])

    render_dispatch_ms = median_time(render_once, render_sync, iters=10) * 1e3
    render_vpu_ops, render_hbm_bytes = render_cost(NUM_ENVS)
    render_sec = render_ms / 1e3
    render_vpu_util = render_vpu_ops / render_sec / V5E_PEAK_VPU_OPS
    render_hbm_util = render_hbm_bytes / render_sec / V5E_HBM_BYTES_PER_S

    # --- pixel training (config 4, the flagship beyond-reference pipeline).
    # Round-4 verdict item 3: this was the ONE pipeline with no pinned
    # throughput anywhere, so it could regress silently. Pinned config =
    # rich scene, joint-VAE aux on (input reconstruction), 1024 envs,
    # horizon 128, 16 minibatches. The minibatch count is a MEMORY
    # constraint, not a tuning choice: the joint-VAE update materializes
    # conv activations for every frame in the minibatch, and at 1024 envs
    # the <=8-minibatch programs fail to compile on the 15.75 GB chip
    # (mb=4 asks 43.6 GB; measured 2026-08-20, round 5). mb=16 =
    # 8192-frame conv updates compiles and is the round-5 production
    # composition-run shape.
    pmodel = PixelActorCritic(initial_std=0.5)
    pixel_config = dataclasses.replace(config, num_minibatches=16)
    pix = pixels_mod.PixelConfig()
    pstate = {
        "ts": pixels_mod.create_pixel_train_state(pmodel, pixel_config, rng, pix),
        "envs": ppo.init_env_batch(rich_params, NUM_ENVS, rng),
    }

    def pixel_iter():
        pstate["ts"], pstate["envs"], _ = pixels_mod.pixel_train_iteration(
            pstate["ts"], pstate["envs"], rich_params, pmodel, pixel_config, pix
        )

    def pixel_sync():
        float(pstate["ts"].total_env_steps)

    pixel_iter()  # compile
    pixel_sync()
    pixel_sec = median_time(pixel_iter, pixel_sync, iters=2, trials=3)
    pixel_sps = NUM_ENVS * HORIZON / pixel_sec

    extra = {
        "latent_train_steps_per_sec": round(latent_sps, 1),
        "pixel_train_steps_per_sec": round(pixel_sps, 1),
        # Renamed from seg_render_ms_1024_frames in round 5 (round-4 advisor
        # finding: the key silently changed meaning in round 4 - round-3
        # values were standalone dispatch time, round-4+ values are in-scan
        # per-step time; the rename makes cross-round trends explicit).
        "seg_render_inscan_ms": round(render_ms, 2),
        "seg_render_dispatch_ms": round(render_dispatch_ms, 2),
        "pinned_config": "latent+pixel+render on rich scene (props=True), median of 5 trials (pixel: 3); render measured in-scan (production shape), dispatch variant alongside",
        # Roofline accounting (VERDICT round-3 item 6): per-
        # iteration XLA-counted FLOPs/bytes over measured time,
        # vs v5e peaks (197T bf16 / 49T f32 MXU, 819 GB/s HBM).
        # The vector pipeline is tiny-matmul dominated (500/300
        # MLP at B=1024 minibatches) - low MFU is the expected
        # shape, the bound is dispatch/VPU not the MXU.
        "vector_iter_tflops": round(vec_flops / 1e12, 3),
        "vector_update_mfu": round(vector_mfu, 4),
        "vector_hbm_util": round(vector_hbm, 4),
        "latent_iter_mfu_bf16_xla_portion": round(latent_mfu, 4),
        # Render: VPU-bound by design (the [K, P] distance/
        # selection block); utilization vs the 3.85 T f32
        # lane-op/s VPU peak and the HBM roofline. ~1 means the
        # kernel is at the speed of light for this algorithm.
        "render_vpu_util": round(render_vpu_util, 3),
        "render_hbm_util": round(render_hbm_util, 4),
    }
    extra.update(scaling)

    result = {
        "metric": "ppo_train_env_steps_per_sec_1024envs",
        "value": round(steps_per_sec, 1),
        "unit": "env_steps/sec",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 1),
        "extra": extra,
    }
    warn_on_regression(result)
    print(json.dumps(result))


def warn_on_regression(result: dict, threshold: float = 0.10) -> None:
    """Compare against the newest BENCH_r*.json and warn (stderr - the
    driver consumes stdout's single JSON line) on any metric that moved
    >threshold in the bad direction. Round-4 verdict item 4: the narrow
    headline missed a 36% latent regression for most of a round."""
    import glob
    import os
    import sys

    prior_files = sorted(glob.glob("BENCH_r*.json"))
    if not prior_files:
        return
    try:
        with open(prior_files[-1]) as f:
            prior = json.load(f).get("parsed") or {}
    except Exception:
        return
    pairs = [("headline " + result["metric"], prior.get("value"),
              result["value"], False)]
    pextra = prior.get("extra") or {}
    # Key renames across rounds: old name -> current name.
    renames = {"seg_render_ms_1024_frames": "seg_render_inscan_ms"}
    for k, old in pextra.items():
        k = renames.get(k, k)
        new = result["extra"].get(k)
        if not isinstance(old, (int, float)) or not isinstance(new, (int, float)):
            continue
        lower_is_better = k.endswith("_ms")
        pairs.append((k, old, new, lower_is_better))
    for name, old, new, lower_is_better in pairs:
        if not old or new is None:
            continue
        drop = (new - old) / old if lower_is_better else (old - new) / old
        if drop > threshold:
            print(
                f"bench REGRESSION WARNING: {name} "
                f"{old} -> {new} ({drop:+.0%} worse than "
                f"{os.path.basename(prior_files[-1])})",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()

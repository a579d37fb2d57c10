"""Quantify the multi-chip claim without multi-chip hardware.

Only one real TPU chip is reachable in this environment, so v5e-8 scaling
cannot be measured directly. This tool replaces assertion with arithmetic
(round-4 VERDICT item 8):

1. **Collective census** — trace each data-parallel pipeline's jitted
   iteration (parallel/train_dp over an 8-device mesh) and walk the jaxpr,
   multiplying every `psum` by the trip counts of the scans it sits in.
   This yields the EXACT per-iteration all-reduce payload (bytes) and
   execution count. The census is independent of env batch and horizon:
   gradient payloads are sized by the parameter tree and the scalar
   psums (advantage moments, metrics) are batch-reductions, so tracing
   tiny shapes gives the production numbers.
2. **ICI-time model** — bandwidth-optimal ring all-reduce over the slice:
   t_bw = 2*S*(N-1)/N / W_ici per payload byte-sum S, plus a per-launch
   latency term. Constants are stated inline (public v5e figures) and the
   latency term is bracketed [best, worst] because XLA's all-reduce
   combining (which merges the per-minibatch gradient-leaf psums into one
   launch) cannot be observed from a CPU lowering.
3. **Predicted weak-scaling efficiency** — measured single-chip iteration
   time (from the newest BENCH_r*.json, same per-chip batch) vs the
   modeled collective time: eff = t_iter / (t_iter + t_coll). The dp
   program overlaps nothing (grads psum between backward and apply), so
   this is the conservative no-overlap prediction.
4. Optional `--weak_scaling`: run the vector dp iteration on 1/2/4/8
   virtual CPU devices at fixed per-device batch and report wall times.
   One physical core serializes the shards, so the expected curve is
   ~linear in device count; the artifact validates that the collective
   program SCALES STRUCTURALLY (compiles + runs + stays finite at every
   mesh size), not that CPU is fast.

Usage:
  python benchmarks/multichip_model.py [--devices 8] [--weak_scaling]

reference: the upstream has no distributed machinery at all (SURVEY.md
section 2.3); this models the owned "Multi-chip scaling" component.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must precede the first backend init (sitecustomize imports jax and
# force-sets jax_platforms, so env vars alone cannot select CPU).
_N = "--devices" in sys.argv and sys.argv[sys.argv.index("--devices") + 1] or "8"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_N}"
).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# --- ICI model constants (public v5e figures, stated per the scaling-book
# recipe: pick a mesh, count collective bytes, divide by link bandwidth) ---
# One v5e chip has a 2D-torus ICI with ~45 GB/s one-way bandwidth per link
# per direction on each axis ("How to Scale Your Model", v5e row:
# 4.5e10 B/s unidirectional per axis). An 8-chip v5e slice is 2x4; a
# bidirectional ring all-reduce along one axis moves 2S(N-1)/N bytes
# through each chip's 2x45 GB/s of that axis' links.
ICI_BW_PER_CHIP = 2 * 4.5e10  # B/s, one axis, both directions
# Per-launch collective latency (software + hop) - bracketed, since the
# measured figure depends on topology and XLA runtime version.
LAUNCH_LATENCY_S = (1e-6, 5e-6)


def collective_census(fn, *args):
    """(total_bytes, launches, by_shape) per ITERATION: walk fn's jaxpr,
    multiplying psums by enclosing scan trip counts."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    by_shape = {}
    total = [0]
    launches = [0]

    def inner_jaxprs(eqn):
        name = eqn.primitive.name
        if name == "scan":
            return [(eqn.params["jaxpr"].jaxpr, eqn.params["length"])]
        if name == "while":
            return [
                (eqn.params["body_jaxpr"].jaxpr, 1),
                (eqn.params["cond_jaxpr"].jaxpr, 1),
            ]
        if name == "cond":
            return [(br.jaxpr, 1) for br in eqn.params["branches"]]
        out = []
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                out.append((v.jaxpr, 1))
            elif hasattr(v, "eqns"):  # raw Jaxpr (shard_map)
                out.append((v, 1))
        return out

    def walk(j, mult):
        for eqn in j.eqns:
            if "psum" in eqn.primitive.name:
                launches[0] += mult
                for v in eqn.invars:
                    aval = getattr(v, "aval", None)
                    if aval is None or not hasattr(aval, "shape"):
                        continue
                    n = int(np.prod(aval.shape)) if aval.shape else 1
                    b = n * np.dtype(aval.dtype).itemsize * mult
                    total[0] += b
                    key = (tuple(aval.shape), str(aval.dtype))
                    by_shape[key] = by_shape.get(key, 0) + mult
            for inner, m in inner_jaxprs(eqn):
                walk(inner, mult * m)

    walk(jaxpr.jaxpr, 1)
    return total[0], launches[0], by_shape


def build_pipelines(mesh):
    """dp iteration fns with PRODUCTION optimizer structure (3 epochs x 4
    minibatches, real model sizes) on tiny env/horizon shapes - the psum
    census depends only on the former."""
    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.observations import vector_obs_dim
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.models import vae_common
    from carla_ppo_tpu.models.policy import ActorCritic
    from carla_ppo_tpu.models.pixel_policy import PixelActorCritic
    from carla_ppo_tpu.parallel import train_dp
    from carla_ppo_tpu.training import pixels as pixels_mod
    from carla_ppo_tpu.training import ppo

    n = len(mesh.devices.reshape(-1))
    rng = jax.random.PRNGKey(0)
    env_params = EnvParams(track=track.make_lap_track(seed=0, capacity=2048))
    out = {}

    # Vector (headline): 500/300 twin MLPs.
    model = ActorCritic()
    cfg = ppo.PPOConfig(horizon=4, num_envs=2 * n)
    ts = train_dp.replicate(
        ppo.create_train_state(model, cfg, vector_obs_dim(), rng), mesh
    )
    envs = train_dp.shard_env_batch(
        ppo.init_env_batch(env_params, cfg.num_envs, rng), mesh
    )
    out["vector"] = (
        train_dp.make_dp_train_iteration(mesh, model, cfg, env_params),
        (ts, envs),
        ts.params,
    )

    # Latent (config 2): production z=64 ConvVAE, frozen - only policy
    # grads and batch statistics cross ICI.
    vae = vae_common.build_vae(64, "cnn", 1, source_shape=(80, 160, 1))
    vae_vars = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 1)), rng, True
    )
    latent = ppo.LatentObs(vae_model=vae, source="seg")
    lts = train_dp.replicate(
        ppo.create_train_state(model, cfg, latent.obs_dim, rng), mesh
    )
    out["latent"] = (
        train_dp.make_dp_train_iteration(
            mesh, model, cfg, env_params,
            latent_obs=latent, vae_variables=vae_vars,
        ),
        (lts, envs),
        lts.params,
    )

    # Pixel (config 4): joint conv policy + VAE aux - the big-gradient case.
    px_model = PixelActorCritic(initial_std=0.5)
    px_pix = pixels_mod.PixelConfig()
    pts = train_dp.replicate(
        pixels_mod.create_pixel_train_state(px_model, cfg, rng, px_pix), mesh
    )
    out["pixel"] = (
        train_dp.make_dp_pixel_train_iteration(
            mesh, px_model, cfg, env_params, pix=px_pix
        ),
        (pts, envs),
        pts.params,
    )
    return out


def measured_iteration_seconds():
    """Per-chip iteration time at the pinned 1024x128 batch, from the newest
    BENCH_r*.json (falls back to round-4 values)."""
    fallback = {"vector": 4160464.4, "latent": 221651.2, "pixel": None}
    files = sorted(glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH_r*.json")))
    sps = dict(fallback)
    if files:
        try:
            with open(files[-1]) as f:
                parsed = json.load(f).get("parsed") or {}
            sps["vector"] = parsed.get("value", sps["vector"])
            extra = parsed.get("extra") or {}
            sps["latent"] = extra.get(
                "latent_train_steps_per_sec", sps["latent"])
            sps["pixel"] = extra.get(
                "pixel_train_steps_per_sec", sps["pixel"])
        except Exception:
            pass
    steps = 1024 * 128
    return {
        k: (steps / v if v else None) for k, v in sps.items()
    }, (files[-1] if files else "fallback(r4)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--weak_scaling", action="store_true")
    args = p.parse_args()

    from carla_ppo_tpu.parallel.mesh import make_mesh

    n = args.devices
    mesh = make_mesh(n)
    pipelines = build_pipelines(mesh)
    t_iter, bench_src = measured_iteration_seconds()

    print(f"# Multi-chip ICI model (v5e-{n}, per-chip batch 1024 x 128)")
    print(f"measured single-chip iterations from: {bench_src}")
    print(f"ICI: ring all-reduce over one 2D-torus axis, "
          f"{ICI_BW_PER_CHIP / 1e9:.0f} GB/s per chip (2 x 45 GB/s links); "
          f"launch latency {LAUNCH_LATENCY_S[0] * 1e6:.0f}-"
          f"{LAUNCH_LATENCY_S[1] * 1e6:.0f} us")
    rows = []
    for name, (fn, fargs, params) in pipelines.items():
        total_b, launches, by_shape = collective_census(fn, *fargs)
        grad_b = sum(
            int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
            for l in jax.tree.leaves(params)
        )
        t_bw = 2 * total_b * (n - 1) / n / ICI_BW_PER_CHIP
        # Launch-count bracket: best = XLA combines each psum SITE into one
        # launch per execution of its enclosing scan body (grad-leaf psums
        # merge; scalar metric psums merge per fusion point, approximated by
        # the 12 update steps + a handful of moment/metric points); worst =
        # zero combining (every jaxpr psum is its own launch).
        best_launches = 12 + 8
        t_lat_lo = best_launches * LAUNCH_LATENCY_S[0]
        t_lat_hi = launches * LAUNCH_LATENCY_S[1]
        t_coll = (t_bw + t_lat_lo, t_bw + t_lat_hi)
        ti = t_iter.get(name)
        eff = (
            (ti / (ti + t_coll[1]), ti / (ti + t_coll[0])) if ti else None
        )
        rows.append((name, total_b, launches, grad_b, t_bw, t_coll, ti, eff))

    print()
    print("| pipeline | psum bytes/iter | psum execs | param bytes | "
          "t_bw (ms) | t_coll (ms) | t_iter 1-chip (ms) | "
          "predicted weak-scaling eff |")
    print("|---|---|---|---|---|---|---|---|")
    for name, tb, ln, gb, t_bw, t_coll, ti, eff in rows:
        eff_s = f"{eff[0] * 100:.1f}-{eff[1] * 100:.1f}%" if eff else "n/a"
        ti_s = f"{ti * 1e3:.1f}" if ti else "unpinned"
        print(f"| {name} | {tb:,} | {ln} | {gb:,} | {t_bw * 1e3:.3f} | "
              f"{t_coll[0] * 1e3:.3f}-{t_coll[1] * 1e3:.3f} | {ti_s} | "
              f"{eff_s} |")

    print()
    print(json.dumps({
        "metric": "multichip_ici_model",
        "devices": n,
        "pipelines": {
            name: {
                "psum_bytes_per_iter": tb,
                "psum_executions_per_iter": ln,
                "param_bytes": gb,
                "t_bandwidth_ms": round(t_bw * 1e3, 4),
                "t_collective_ms": [round(t_coll[0] * 1e3, 4),
                                    round(t_coll[1] * 1e3, 4)],
                "t_iter_single_chip_ms": round(ti * 1e3, 3) if ti else None,
                "weak_scaling_efficiency": (
                    [round(eff[0], 4), round(eff[1], 4)] if eff else None),
            }
            for name, tb, ln, gb, t_bw, t_coll, ti, eff in rows
        },
    }))

    if args.weak_scaling:
        import time

        from carla_ppo_tpu.envs import track as track_mod
        from carla_ppo_tpu.envs.observations import vector_obs_dim
        from carla_ppo_tpu.envs.types import EnvParams
        from carla_ppo_tpu.models.policy import ActorCritic
        from carla_ppo_tpu.parallel import train_dp
        from carla_ppo_tpu.training import ppo

        print("\n## CPU-mesh weak scaling (vector dp, 16 envs/device, "
              "horizon 16; ONE physical core -> expect ~linear wall time; "
              "validates structural scaling, not speed)")
        env_params = EnvParams(
            track=track_mod.make_lap_track(seed=0, capacity=2048))
        model = ActorCritic()
        rng = jax.random.PRNGKey(0)
        for k in [1, 2, 4, 8]:
            if k > n:
                break
            m = make_mesh(k)
            cfg = ppo.PPOConfig(horizon=16, num_envs=16 * k)
            ts = train_dp.replicate(
                ppo.create_train_state(model, cfg, vector_obs_dim(), rng), m)
            envs = train_dp.shard_env_batch(
                ppo.init_env_batch(env_params, cfg.num_envs, rng), m)
            fn = train_dp.make_dp_train_iteration(m, model, cfg, env_params)
            ts, envs, met = fn(ts, envs)  # compile + warm
            jax.block_until_ready(met)
            t0 = time.perf_counter()
            for _ in range(3):
                ts, envs, met = fn(ts, envs)
            jax.block_until_ready(met)
            dt = (time.perf_counter() - t0) / 3
            assert all(bool(jnp.isfinite(v)) for v in met.values())
            print(f"  devices={k}: {dt * 1e3:8.1f} ms/iter "
                  f"(global batch {16 * k} envs, finite metrics ok)")


if __name__ == "__main__":
    main()

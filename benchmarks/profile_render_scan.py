"""In-scan decomposition of the production render: prep / kernel / composite.

The latent pipeline pays the renderer INSIDE its rollout scan, where the
axon per-dispatch overhead is amortized away; profile_latent.py measured
that in-scan cost at ~3.4 ms / 1024 frames against an analytic VPU
speed-of-light of ~1.8 ms (bench.py render_cost). This tool attributes the
gap: each leg scans ONE stage of the render HORIZON times inside a single
jitted program with a data dependence between steps (the stage output's
low bit perturbs the next step's waypoint_idx), so XLA can neither hoist
the stage nor fold the chain.

Legs (all per 1024-frame batch, rich 13-class scene):
  prep        _prep_windows only: per-env window gather + camera rotation
              (the [B, K] wp_gather is a TPU general gather - a suspected
              hidden cost, it rides HBM random-access not the VPU)
  kernel      the Pallas v5 ground kernel on pre-built windows (fixed prep)
  ground      prep + kernel (= render minus billboards)
  composite   the flat billboard contraction on a fixed ground frame
  full        render_batch (prep + kernel + composite)

Usage: python benchmarks/profile_render_scan.py [--envs 1024] [--steps 32]
                                                [--group 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=32,
                        help="scan length per timed program")
    parser.add_argument("--trials", type=int, default=3)
    parser.add_argument("--group", type=int, default=8,
                        help="Pallas envs-per-program (kernel legs only)")
    args = parser.parse_args()
    B, T, G = args.envs, args.steps, args.group

    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.ops import rasterizer as R
    from carla_ppo_tpu.ops import rasterizer_pallas as RP
    from carla_ppo_tpu.training import ppo

    params = EnvParams(
        track=track.make_lap_track(seed=0, props=True),
        render_npc_billboards=False,
    )
    cam = R.CameraConfig()
    rng = jax.random.PRNGKey(0)
    states = ppo.init_env_batch(params, B, rng)

    def timed(fn, *fargs, iters=1):
        box = {"x": fn(*fargs)}
        np.asarray(box["x"])  # warm + sync
        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            for _ in range(iters):
                box["x"] = fn(*fargs)
            np.asarray(box["x"])
            times.append((time.perf_counter() - t0) / iters)
        return float(np.median(times))

    results = {}

    def report(name, sec_per_scan):
        ms = sec_per_scan * 1e3 / T
        results[name] = round(ms, 3)
        print(f"{name:12s} {ms:7.3f} ms / {B} frames (in-scan)")

    # --- prep only ---------------------------------------------------------
    @jax.jit
    def scan_prep(st):
        def body(idx, _):
            s = st.replace(waypoint_idx=idx)
            win, payload = RP._prep_windows(s, params, cam)
            bump = win.sum().astype(jnp.int32) & 1
            return idx + bump, payload[0, 0, 0]

        idx, last = jax.lax.scan(body, st.waypoint_idx, None, length=T)
        return idx.sum() + last.sum().astype(jnp.int32)

    report("prep", timed(scan_prep, states))

    # --- kernel only (fixed prebuilt windows; the perturbed idx feeds the
    # win_cols' first element so the kernel chain stays data-dependent) -----
    win0, payload0 = jax.jit(
        lambda s: RP._prep_windows(s, params, cam)
    )(states)
    layout = RP._stripe_layout_v5(cam)
    assert layout is not None

    def kernel_call(win, payload):
        plan, slab_np, sky_px = layout
        kernel = RP._make_kernel_v5(plan, R.RoadStyle(), G, sky_px)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        K0 = win.shape[1]
        HW = cam.height * cam.width
        Pmax = max(p for _, _, p in plan)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, HW), jnp.int32),
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, K0, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 8, K0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, slab_np.shape[1]), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, HW), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8 * G, Pmax), jnp.float32)],
        )(win, payload, jnp.asarray(slab_np))

    @jax.jit
    def scan_kernel(win, payload):
        def body(carry, _):
            w = carry
            flat = kernel_call(w, payload)
            bump = (flat.sum(dtype=jnp.int32) & 1).astype(jnp.float32)
            return w.at[0, 0, 0].add(bump * 1e-6), flat[0, 0]

        w, last = jax.lax.scan(body, win, None, length=T)
        return w.sum() + last.sum().astype(jnp.float32)

    report(f"kernel(g={G})", timed(scan_kernel, win0, payload0))

    # --- ground = prep + kernel ---------------------------------------------
    @jax.jit
    def scan_ground(st):
        def body(idx, _):
            s = st.replace(waypoint_idx=idx)
            flat = RP.render_batch_pallas_v5(s, params, cam, group=G)
            bump = flat.sum(dtype=jnp.int32) & 1
            return idx + bump, flat[0, 0]

        idx, last = jax.lax.scan(body, st.waypoint_idx, None, length=T)
        return idx.sum() + last.sum()

    report("ground", timed(scan_ground, states))

    # --- composite on a fixed ground frame ----------------------------------
    flat0 = jax.jit(
        lambda s: RP.render_batch_pallas_v5(s, params, cam, group=G)
    )(states)

    @jax.jit
    def scan_composite(flat, st):
        def body(f, _):
            cls = R._composite_billboards_flat(f, st, params, cam)
            bump = cls.sum(dtype=jnp.int32) & 1
            return f.at[0, 0].add(bump), cls[0, 0]

        f, last = jax.lax.scan(body, flat, None, length=T)
        return f.sum() + last.sum()

    report("composite", timed(scan_composite, flat0, states))

    # --- full production render ---------------------------------------------
    @jax.jit
    def scan_full(st):
        def body(idx, _):
            s = st.replace(waypoint_idx=idx)
            cls = R.render_batch(s, params, cam)
            bump = cls.sum(dtype=jnp.int32) & 1
            return idx + bump, cls.reshape(B, -1)[0, 0]

        idx, last = jax.lax.scan(body, st.waypoint_idx, None, length=T)
        return idx.sum() + last.sum()

    report("full", timed(scan_full, states))

    print(json.dumps({"metric": "render_scan_decomposition_ms",
                      "envs": B, "group": G, "value": results}))


if __name__ == "__main__":
    main()

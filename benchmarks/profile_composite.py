"""Attribute the billboard-composite gap: measured 1.23 ms vs 0.44 ms SOL.

The flat composite (`rasterizer._composite_billboards_flat`) has three
stages per frame batch:
  (a) candidate collection  - _visible_props: [B, S] slot gather + geometry
  (b) table build           - U [B, N, W], V [B, N, H] float compares
  (c) contraction+composite - best = min_n max(U, V) over [B, N, H*W],
                              then depth-test + where against the ground.
SOL counts only (c)'s 2 VPU ops/candidate-pixel; this tool times each stage
in-scan (same methodology as profile_render_scan.py: T-step lax.scan with a
data dependence so nothing hoists) to find where the other ~0.8 ms lives,
plus layout/size variants of (c) to test compute- vs layout-boundedness:

  tables      (a)+(b) only, per step
  contract    (c) only on fixed prebuilt U/V
  contract_h  (c) in [B, H, W] layout (W=160 lanes -> 62.5% util) - the
              pre-v5 shape, for the lane-utilization hypothesis
  contract_n32 (c) with the first 32 candidates - linearity-in-N test
  full        the production _composite_billboards_flat

Usage: python benchmarks/profile_composite.py [--envs 1024] [--steps 32]
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
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--trials", type=int, default=3)
    args = parser.parse_args()
    B, T = args.envs, args.steps

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
    H, W = cam.height, cam.width
    HW = H * W

    def timed(fn, *fargs):
        box = {"x": fn(*fargs)}
        np.asarray(box["x"])
        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            box["x"] = fn(*fargs)
            np.asarray(box["x"])
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    results = {}

    def report(name, sec_per_scan):
        ms = sec_per_scan * 1e3 / T
        results[name] = round(ms, 3)
        print(f"{name:14s} {ms:7.3f} ms / {B} frames (in-scan)")

    flat0 = jax.jit(
        lambda s: RP.render_batch_pallas_v5(s, params, cam, group=8)
    )(states)
    U0, V0 = jax.jit(
        jax.vmap(lambda s: R._billboard_tables(s, params, cam))
    )(states)
    np.asarray(flat0[0, 0]), np.asarray(U0[0, 0, 0])

    # --- tables: candidate gather + U/V build, per step ---------------------
    @jax.jit
    def scan_tables(st):
        def body(idx, _):
            s = st.replace(waypoint_idx=idx)
            U, V = jax.vmap(lambda e: R._billboard_tables(e, params, cam))(s)
            bump = (U.sum(dtype=jnp.int32) ^ V.sum(dtype=jnp.int32)) & 1
            return idx + bump, U[0, 0, 0]

        idx, last = jax.lax.scan(body, st.waypoint_idx, None, length=T)
        return idx.sum() + last.sum()

    report("tables", timed(scan_tables, states))

    def contraction(U, V, flat_cls, n=None):
        """Stage (c) exactly as production (rasterizer.py:826-836)."""
        if n is not None:
            U, V = U[:, :n], V[:, :n]
        N = U.shape[1]
        u_flat = jnp.broadcast_to(
            U[:, :, None, :], (B, N, H, W)).reshape(B, N, HW)
        v_flat = jnp.broadcast_to(
            V[:, :, :, None], (B, N, H, W)).reshape(B, N, HW)
        best = jnp.min(jnp.maximum(u_flat, v_flat), axis=1)
        _, _, t_rows = R._row_geometry(cam)
        depth_row = jnp.asarray(t_rows, jnp.float32)
        depth_flat = jnp.broadcast_to(depth_row[:, None], (H, W)).reshape(HW)
        best_d = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(best, ~15), jnp.float32)
        visible = best_d < depth_flat[None, :]
        return jnp.where(visible, jnp.bitwise_and(best, 15), flat_cls)

    def make_scan_contract(n=None, hw_layout=False):
        @jax.jit
        def scan_contract(U, V, flat):
            def body(u, _):
                if hw_layout:
                    N = u.shape[1]
                    best = jnp.min(
                        jnp.maximum(u[:, :, None, :], V[:, :, :, None]),
                        axis=1,
                    )  # [B, H, W]
                    cls = jnp.where(
                        jax.lax.bitcast_convert_type(
                            jnp.bitwise_and(best, ~15), jnp.float32
                        ).reshape(B, HW)
                        < jnp.inf,
                        jnp.bitwise_and(best, 15).reshape(B, HW),
                        flat,
                    )
                else:
                    cls = contraction(u, V, flat, n=n)
                bump = cls.sum(dtype=jnp.int32) & 1
                return u.at[0, 0, 0].add(bump), cls[0, 0]

            u, last = jax.lax.scan(body, U, None, length=T)
            return u.sum() + last.sum()

        return scan_contract

    report("contract", timed(make_scan_contract(), U0, V0, flat0))
    report("contract_h", timed(make_scan_contract(hw_layout=True), U0, V0, flat0))
    report("contract_n32", timed(make_scan_contract(n=32), U0, V0, flat0))

    # --- full production composite ------------------------------------------
    @jax.jit
    def scan_full(flat, st):
        def body(f, _):
            cls = R._composite_billboards_flat(f, st, params, cam)
            bump = cls.sum(dtype=jnp.int32) & 1
            return f.at[0, 0].add(bump), cls[0, 0]

        f, last = jax.lax.scan(body, flat, None, length=T)
        return f.sum() + last.sum()

    report("full", timed(scan_full, flat0, states))

    # --- Pallas composite kernel variants (U/V tables in VMEM) --------------
    for variant in ("loop", "reduce3d", "rows"):
        def make(variant=variant):
            @jax.jit
            def scan_pallas(flat, st):
                def body(f, _):
                    cls = RP.composite_billboards_pallas(
                        f, st, params, cam, variant=variant
                    )
                    bump = cls.sum(dtype=jnp.int32) & 1
                    return f.at[0, 0].add(bump), cls[0, 0]

                f, last = jax.lax.scan(body, flat, None, length=T)
                return f.sum() + last.sum()

            return scan_pallas

        try:
            report(f"pallas_{variant}", timed(make(), flat0, states))
        except Exception as e:  # Mosaic lowering limits differ per variant
            print(f"pallas_{variant}: FAILED {type(e).__name__}")

    print(json.dumps({"metric": "composite_decomposition_ms",
                      "envs": B, "value": results}))


if __name__ == "__main__":
    main()

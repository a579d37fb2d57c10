"""Decompose the frozen-VAE latent pipeline's iteration budget IN-PROGRAM.

The standalone render bench (bench.py seg_render_ms_1024_frames) pays the
axon per-dispatch overhead once per call; the latent pipeline dispatches ONE
program per iteration and amortizes it over 128 scanned steps. To know where
the 0.59 s iteration actually goes, every leg here is measured as a single
jitted program scanning the leg N times over data-dependent state (so XLA
cannot dead-code or hoist it), synchronized via a scalar host fetch
(utils/profiling.py methodology).

Legs (1024 envs, rich 13-class scene, horizon 128):
  render        lax.scan of render_batch (Pallas ground + XLA billboards)
  render+enc    + seg_to_obs + frozen bf16 ConvVAE encode
  env_step      lax.scan of the lap-env step (no perception)
  latent_iter   the full train_iteration (rollout+GAE+12 minibatch updates)
  vector_iter   same without perception (policy-only baseline)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from carla_ppo_tpu.envs import track
from carla_ppo_tpu.envs.observations import vector_obs_dim
from carla_ppo_tpu.envs.types import EnvParams
from carla_ppo_tpu.models import vae_common
from carla_ppo_tpu.models.policy import ActorCritic
from carla_ppo_tpu.ops import rasterizer as R
from carla_ppo_tpu.training import ppo

NUM_ENVS = 1024
HORIZON = 128
TRIALS = 3


def timed(fn, sync, iters=1, trials=TRIALS):
    fn()
    sync()
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def main():
    rich_params = EnvParams(
        track=track.make_lap_track(seed=0, props=True),
        render_npc_billboards=False,
    )
    rng = jax.random.PRNGKey(0)
    config = ppo.PPOConfig(num_envs=NUM_ENVS, horizon=HORIZON)
    envs = ppo.init_env_batch(rich_params, NUM_ENVS, rng)

    vae = vae_common.build_vae(
        64, "cnn", 1, source_shape=(80, 160, 1), dtype=jnp.bfloat16
    )
    vae_vars = vae.init(
        rng, jnp.zeros((1, 80, 160, 1)), jax.random.PRNGKey(1), True
    )

    # --- leg: scanned render only -----------------------------------------
    # Real data dependence between steps: the frame sum's LOW BIT perturbs
    # the next step's waypoint_idx (by 0 or 1 - same render cost), so XLA
    # cannot hoist the render out of the scan or constant-fold the chain.
    @jax.jit
    def scan_render_dep(states):
        def body(idx, _):
            st = states.replace(waypoint_idx=idx)
            cls = R.render_batch(st, rich_params)
            bump = (cls.sum(dtype=jnp.int32) & 1)  # 0/1, opaque to XLA
            return idx + bump, cls[0, 0, 0]

        idx, last = jax.lax.scan(
            body, states.waypoint_idx, None, length=HORIZON
        )
        return idx.sum() + last.sum()

    out = {}

    def run(name, f, *args, iters=1):
        box = {}

        def call():
            box["x"] = f(*args)

        def sync():
            np.asarray(box["x"])

        sec = timed(call, sync, iters=iters)
        out[name] = sec
        print(f"{name:24s} {sec*1e3:9.2f} ms  ({sec*1e3/HORIZON:6.3f} ms/step)")

    run("scan_render(x128)", scan_render_dep, envs)

    # --- leg: render + encode ----------------------------------------------
    @jax.jit
    def scan_render_encode(states):
        def body(idx, _):
            st = states.replace(waypoint_idx=idx)
            cls = R.render_batch(st, rich_params)
            frames = R.seg_to_obs(cls)
            z = vae.apply(vae_vars, frames, method=vae.encode)
            bump = (z.sum().astype(jnp.int32) & 1)
            return idx + bump, z[0, 0]

        idx, last = jax.lax.scan(
            body, states.waypoint_idx, None, length=HORIZON
        )
        return idx.sum() + last.sum().astype(jnp.int32)

    run("scan_render_encode(x128)", scan_render_encode, envs)

    # --- leg: env step only -------------------------------------------------
    @jax.jit
    def scan_env(states):
        from carla_ppo_tpu.envs import lap_env

        step1 = jax.vmap(lap_env.autoreset_step, in_axes=(0, 0, None))

        def body(carry, _):
            st, key = carry
            act = jnp.zeros((NUM_ENVS, 2), jnp.float32)
            st2, _ = step1(st, act, rich_params)
            return (st2, key), None

        (st, _), _ = jax.lax.scan(
            body, (states, rng), None, length=HORIZON
        )
        return st.vehicle.pos.sum()

    try:
        run("scan_env_step(x128)", scan_env, envs)
    except Exception as e:  # step_batch name may differ
        print("scan_env_step: skipped:", type(e).__name__, str(e)[:120])

    # --- full iterations ----------------------------------------------------
    model_l = ActorCritic(dtype=jnp.bfloat16)
    latent = ppo.LatentObs(vae_model=vae, source="seg")
    ts_l = ppo.create_train_state(model_l, config, latent.obs_dim, rng)
    box = {"ts": ts_l, "envs": envs}

    def latent_iter():
        box["ts"], box["envs"], _ = ppo.train_iteration(
            box["ts"], box["envs"], rich_params, model_l, config,
            latent_obs=latent, vae_variables=vae_vars,
        )

    def latent_sync():
        float(box["ts"].total_env_steps)

    latent_iter()
    latent_sync()
    sec = timed(latent_iter, latent_sync, iters=2)
    out["latent_iter"] = sec
    print(f"{'latent_iter':24s} {sec*1e3:9.2f} ms  -> "
          f"{NUM_ENVS*HORIZON/sec/1e3:.1f}k env-steps/s")

    model_v = ActorCritic()
    plain = EnvParams(track=track.make_lap_track(seed=0, props=False))
    ts_v = ppo.create_train_state(model_v, config, vector_obs_dim(), rng)
    vbox = {"ts": ts_v, "envs": ppo.init_env_batch(plain, NUM_ENVS, rng)}

    def vector_iter():
        vbox["ts"], vbox["envs"], _ = ppo.train_iteration(
            vbox["ts"], vbox["envs"], plain, model_v, config
        )

    def vector_sync():
        float(vbox["ts"].total_env_steps)

    vector_iter()
    vector_sync()
    sec = timed(vector_iter, vector_sync, iters=4)
    out["vector_iter"] = sec
    print(f"{'vector_iter':24s} {sec*1e3:9.2f} ms  -> "
          f"{NUM_ENVS*HORIZON/sec/1e6:.2f}M env-steps/s")

    print()
    r = out.get("scan_render(x128)")
    re_ = out.get("scan_render_encode(x128)")
    li = out.get("latent_iter")
    vi = out.get("vector_iter")
    if r and re_ and li:
        print(f"in-program render:        {r/HORIZON*1e3:6.3f} ms/step")
        print(f"in-program encode:        {(re_-r)/HORIZON*1e3:6.3f} ms/step")
        print(f"latent-iter perception:   {(li - vi)/HORIZON*1e3:6.3f} ms/step "
              f"(iter minus vector baseline)")
        print(f"non-perception residual:  {(li - re_)*1e3:6.1f} ms/iter")


if __name__ == "__main__":
    main()

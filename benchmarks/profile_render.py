"""Phase-level profile of the semantic-camera renderer at 1024 envs.

Times the full frame, the ground pass alone, and the billboard pass alone,
with row stripes on/off, so renderer work (VERDICT round-1 item 5: get
<= 11 ms / 1024 frames) can be attributed. Also times the frozen-VAE encode
of a rendered batch - the other half of the latent pipeline's per-step cost.

Usage: python benchmarks/profile_render.py [--envs 1024]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


# block_until_ready does not actually wait on the axon remote platform
# (returns in ~16 us for multi-ms programs - round-3 measurement), so all
# timing goes through the host-fetch-synchronized helper.
from carla_ppo_tpu.utils.profiling import timeit_device as timeit  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()
    B = args.envs

    from carla_ppo_tpu.envs import track
    from carla_ppo_tpu.envs.types import EnvParams
    from carla_ppo_tpu.ops import rasterizer as R
    from carla_ppo_tpu.training import ppo

    env_params = EnvParams(track=track.make_lap_track(seed=0, props=True))
    rng = jax.random.PRNGKey(0)
    states = ppo.init_env_batch(env_params, B, rng)

    cams = {
        "full": R.CameraConfig(),
        "no_stripes": R.CameraConfig(row_stripes=False),
        "ground_only": R.CameraConfig(render_props=False),
    }
    results = {}
    for name, cam in cams.items():
        # Reduce to a scalar on-device: the sync in timeit is a host fetch
        # of the smallest output leaf, and it must not transfer the frames.
        fn = jax.jit(
            lambda s, cam=cam: jax.vmap(
                lambda st: R.render_semantic(st, env_params, cam)
            )(s).sum(dtype=jnp.int32)
        )
        results[f"render_{name}_ms"] = round(timeit(fn, states, iters=args.iters) * 1e3, 2)

    # The PRODUCTION dispatch (what bench.py and the latent/pixel rollouts
    # time): render_batch = Pallas v3d ground kernel + factorized billboard
    # composite, with the Trainer's num_npcs=0 program (NPC slots pruned).
    # Timed bench.py-style - a chain of calls synchronized once on a scalar
    # fetch - because block_until_ready on the axon remote platform costs a
    # full device->host transfer of the blocked buffer (see bench.py).
    import time as _time

    prod_params = env_params.replace(render_npc_billboards=False)
    prod = jax.jit(
        lambda s: R.render_batch(s, prod_params).sum(dtype=jnp.int32)
    )
    out = {"x": prod(states)}
    import numpy as _np

    _np.asarray(out["x"])
    trials = []
    for _ in range(5):
        t0 = _time.perf_counter()
        for _ in range(args.iters):
            out["x"] = prod(states)
        _np.asarray(out["x"])
        trials.append((_time.perf_counter() - t0) / args.iters)
    import statistics as _stats

    results["render_production_ms"] = round(_stats.median(trials) * 1e3, 2)

    # Frozen-VAE encode of a batch of frames (latent pipeline's other half).
    from carla_ppo_tpu.models import vae_common

    vae = vae_common.build_vae(64, "cnn", 1, source_shape=(80, 160, 1))
    vae_vars = vae.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 1)), jax.random.PRNGKey(1), True
    )
    frames = jax.jit(
        lambda s: jax.vmap(lambda st: R.render_semantic(st, env_params))(s)
    )(states)
    obs = R.seg_to_obs(frames)

    def encode(v, o):
        return vae.apply(v, o, method=vae.encode).sum(dtype=jnp.float32)

    enc = jax.jit(encode)
    results["vae_encode_ms"] = round(timeit(enc, vae_vars, obs, iters=args.iters) * 1e3, 2)

    results["envs"] = B
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

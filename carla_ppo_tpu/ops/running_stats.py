"""Running statistics + vectorized reward normalization.

The route config trains with normalized rewards over the vectorized env batch
(BASELINE.json config 3 "vecnorm rewards"); the reference has no vectorized
envs so this is a new, owned component. Semantics follow the standard
VecNormalize recipe: maintain a per-env discounted return estimate
R_t = gamma * R_{t-1} + r_t (carry zeroed AFTER the terminal step so the
terminal reward counts toward its own episode), track its running variance,
and scale rewards by 1/sqrt(var + eps) (no mean subtraction - shifting
rewards changes the optimal policy).

Pure functions over an explicit state pytree; Welford-style batched moment
merging so the update is one pass over the [T, B] reward block.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import Array


@struct.dataclass
class RunningMoments:
    mean: Array  # [] float32
    var: Array  # [] float32
    count: Array  # [] float32

    @classmethod
    def create(cls) -> "RunningMoments":
        return cls(
            mean=jnp.float32(0.0), var=jnp.float32(1.0), count=jnp.float32(1e-4)
        )


def update_moments(m: RunningMoments, batch: Array) -> RunningMoments:
    """Merge a batch of samples (any shape) into the running moments."""
    batch = batch.reshape(-1)
    b_count = jnp.float32(batch.size)
    b_mean = batch.mean()
    b_var = batch.var()
    delta = b_mean - m.mean
    tot = m.count + b_count
    new_mean = m.mean + delta * b_count / tot
    new_var = (
        m.var * m.count + b_var * b_count + delta**2 * m.count * b_count / tot
    ) / tot
    return RunningMoments(mean=new_mean, var=new_var, count=tot)


def normalize_rewards(
    moments: RunningMoments,
    returns: Array,  # [B] per-env discounted-return carry (EnvState.vecnorm_return)
    rewards: Array,  # [T, B]
    dones: Array,  # [T, B]
    gamma: float,
    clip: float = 10.0,
    eps: float = 1e-8,
) -> Tuple[Array, RunningMoments, Array]:
    """Scale a rollout's rewards by the running return std.

    Returns (normalized [T, B], new moments, new per-env returns). The
    per-env return accumulator lives in EnvState so the checkpointed
    training state stays shape-stable across env-batch sizes; the scalar
    moments are the only cross-iteration statistics.
    """

    def scan_fn(ret, x):
        # Accumulate first, then zero the carry where done: a terminal step's
        # reward (notably the flat -10 penalty) contributes to its OWN
        # episode's return sample before the carry resets for the next
        # episode (standard VecNormalize order).
        r, d = x
        ret = ret * gamma + r
        return ret * (1.0 - d), ret

    ret_final, rets = jax.lax.scan(
        scan_fn, returns, (rewards, dones.astype(rewards.dtype))
    )
    moments = update_moments(moments, rets)
    scale = 1.0 / jnp.sqrt(moments.var + eps)
    normalized = jnp.clip(rewards * scale, -clip, clip)
    return normalized, moments, ret_final

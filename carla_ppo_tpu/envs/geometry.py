"""Vectorized 2D geometry helpers.

JAX equivalents of the numpy helpers in reference: CarlaEnv/wrappers.py:25-49
(`angle_diff`, `distance_to_line`, `vector`), written branch-free so they
trace under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def wrap_angle(angle: Array) -> Array:
    """Wrap an angle to (-pi, pi]."""
    # Map to [-pi, pi) with mod, then push -pi to +pi to match the reference's
    # half-open interval (reference: wrappers.py:27-30 keeps (-pi, pi]).
    wrapped = jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.where(wrapped == -jnp.pi, jnp.pi, wrapped)


def angle_diff(v0: Array, v1: Array) -> Array:
    """Signed angle (-pi, pi] from 2D vector v0 to v1.

    Parity: reference CarlaEnv/wrappers.py:25-30.
    """
    angle = jnp.arctan2(v1[..., 1], v1[..., 0]) - jnp.arctan2(v0[..., 1], v0[..., 0])
    return wrap_angle(angle)


def distance_to_line(a: Array, b: Array, p: Array) -> Array:
    """Distance from point p to the infinite line through a and b (2D).

    Parity: reference CarlaEnv/wrappers.py:32-37 (which uses 3D points whose z
    is effectively constant; we work in the road plane).
    """
    ab = b - a
    ap = p - a
    cross = ab[..., 0] * ap[..., 1] - ab[..., 1] * ap[..., 0]
    denom = jnp.linalg.norm(ab, axis=-1)
    degenerate = denom < 1e-8
    safe_denom = jnp.where(degenerate, 1.0, denom)
    return jnp.where(
        degenerate, jnp.linalg.norm(ap, axis=-1), jnp.abs(cross) / safe_denom
    )


def signed_distance_to_line(a: Array, b: Array, p: Array) -> Array:
    """Signed version: positive when p is left of a->b."""
    ab = b - a
    ap = p - a
    cross = ab[..., 0] * ap[..., 1] - ab[..., 1] * ap[..., 0]
    denom = jnp.linalg.norm(ab, axis=-1)
    safe_denom = jnp.where(denom < 1e-8, 1.0, denom)
    return cross / safe_denom


def rotate2d(v: Array, angle: Array) -> Array:
    """Rotate 2D vector(s) by `angle` radians (counter-clockwise)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = c * v[..., 0] - s * v[..., 1]
    y = s * v[..., 0] + c * v[..., 1]
    return jnp.stack([x, y], axis=-1)


def unit(v: Array, eps: float = 1e-8) -> Array:
    """Normalize the trailing axis, safe at zero."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps)

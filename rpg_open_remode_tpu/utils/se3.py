"""SE(3) rigid transforms as ``(3, 4)`` JAX arrays ``[R | t]``.

Functional equivalent of the reference's ``SE3<float>`` value type
(``include/rmd/se3.cuh:27-168``): quaternion construction, inverse,
composition and point action. Everything is jit/vmap-friendly; transforms are
plain arrays, so they pass through pytrees and shard_map unchanged.

Convention note (matches the reference, see SURVEY.md section 3.5): dataset
poses are ``T_world_curr``; the engine consumes ``T_curr_world`` and stores
``T_world_ref = inv(T_curr_world)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def from_quat_t(qw, qx, qy, qz, tx, ty, tz, dtype=jnp.float32) -> jnp.ndarray:
    """Build ``[R | t]`` from a normalized quaternion and translation.

    Same expansion as the reference ctor (``se3.cuh:38-66``).
    """
    qw, qx, qy, qz = (jnp.asarray(v, dtype) for v in (qw, qx, qy, qz))
    tx, ty, tz = (jnp.asarray(v, dtype) for v in (tx, ty, tz))
    x, y, z = 2 * qx, 2 * qy, 2 * qz
    wx, wy, wz = x * qw, y * qw, z * qw
    xx, xy, xz = x * qx, y * qx, z * qx
    yy, yz, zz = y * qy, z * qy, z * qz
    return jnp.stack(
        [
            jnp.stack([1 - (yy + zz), xy - wz, xz + wy, tx]),
            jnp.stack([xy + wz, 1 - (xx + zz), yz - wx, ty]),
            jnp.stack([xz - wy, yz + wx, 1 - (xx + yy), tz]),
        ]
    )


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.concatenate([jnp.eye(3, dtype=dtype), jnp.zeros((3, 1), dtype)], axis=1)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[:, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[:, 3]


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform: ``[R^T | -R^T t]`` (se3.cuh:79-96)."""
    R = rotation(T)
    t = translation(T)
    Rt = R.T
    return jnp.concatenate([Rt, (-Rt @ t)[:, None]], axis=1)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """``A * B`` (se3.cuh:146-162)."""
    Ra, ta = rotation(A), translation(A)
    Rb, tb = rotation(B), translation(B)
    return jnp.concatenate([Ra @ Rb, (Ra @ tb + ta)[:, None]], axis=1)


def rotate(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate points ``p`` with shape ``(..., 3)`` by R."""
    return p @ rotation(T).T


def apply(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Full action ``R p + t`` on points with shape ``(..., 3)``."""
    return p @ rotation(T).T + translation(T)

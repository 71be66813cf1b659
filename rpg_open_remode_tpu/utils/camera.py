"""Pinhole camera model (functional JAX equivalent of pinhole_camera.cuh:27-63).

The camera is a pytree of scalar arrays, so keyframes with different
calibrations don't trigger recompilation. Negative focal lengths are legal
(the reference synthetic dataset uses fy = -480, test/dataset_main.cpp:37).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def create(cls, fx, fy, cx, cy, dtype=jnp.float32) -> "PinholeCamera":
        return cls(*(jnp.asarray(v, dtype) for v in (fx, fy, cx, cy)))

    def cam2world(self, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """Unproject pixel coords to a z=1 ray, shape ``(..., 3)``.

        Matches ``pinhole_camera.cuh:40-46``.
        """
        x = (u - self.cx) / self.fx
        y = (v - self.cy) / self.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def world2cam(self, xyz: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Perspective-project points ``(..., 3)`` to pixel coords (u, v).

        Matches ``pinhole_camera.cuh:48-54``.
        """
        u = self.fx * xyz[..., 0] / xyz[..., 2] + self.cx
        v = self.fy * xyz[..., 1] / xyz[..., 2] + self.cy
        return u, v

    def one_pix_angle(self) -> jnp.ndarray:
        """Angle subtended by one pixel: 2*atan2(1, 2fx) (pinhole_camera.cuh:56-60)."""
        return jnp.arctan2(1.0, 2.0 * self.fx) * 2.0

    def bearing_grid(self, height: int, width: int) -> jnp.ndarray:
        """Normalized bearing vectors for every pixel, shape ``(3, H, W)``.

        Channel-first layout keeps the trailing dims TPU-tileable.
        """
        v, u = jnp.meshgrid(
            jnp.arange(height, dtype=jnp.float32),
            jnp.arange(width, dtype=jnp.float32),
            indexing="ij",
        )
        f = self.cam2world(u, v)  # (H, W, 3)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        return jnp.moveaxis(f, -1, 0)

"""Image-space helper ops mirroring the reference's test-support kernels.

The reference validates its L0 device primitives with standalone kernels:
a device-to-device copy (test/copy.cu:23-52) and a Scharr gradient in
global-memory and texture flavors (test/sobel.cu:24-120).  Here the same
roles are filled by small jittable functions used both as building blocks
(image pyramids, gradient-based diagnostics) and as smoke tests for the
stencil machinery against scipy/numpy oracles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv_sep(img: jnp.ndarray, ky: jnp.ndarray, kx: jnp.ndarray) -> jnp.ndarray:
    """Separable 3x3 correlation with edge-replicate padding (the clamp
    addressing of the reference's texture variant, test/sobel.cu:80-120)."""
    p = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    rows = ky[0] * p[:-2, :] + ky[1] * p[1:-1, :] + ky[2] * p[2:, :]
    return kx[0] * rows[:, :-2] + kx[1] * rows[:, 1:-1] + kx[2] * rows[:, 2:]


def scharr_x(img: jnp.ndarray) -> jnp.ndarray:
    """Scharr x-gradient, OpenCV CV_SCHARR semantics (the oracle the
    reference tests against, test/device_image_test.cpp:158-283)."""
    smooth = jnp.asarray([3.0, 10.0, 3.0])
    diff = jnp.asarray([-1.0, 0.0, 1.0])
    return _conv_sep(img, smooth, diff)


def scharr_y(img: jnp.ndarray) -> jnp.ndarray:
    smooth = jnp.asarray([3.0, 10.0, 3.0])
    diff = jnp.asarray([-1.0, 0.0, 1.0])
    return _conv_sep(img, diff, smooth)


def gradient_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    gx = scharr_x(img)
    gy = scharr_y(img)
    return jnp.sqrt(gx * gx + gy * gy)


@jax.jit
def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 box downsample (pyramid level builder)."""
    h2, w2 = img.shape[0] // 2, img.shape[1] // 2
    x = img[: 2 * h2, : 2 * w2]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Image pyramid [full, /2, /4, ...]."""
    out = [img]
    for _ in range(levels - 1):
        out.append(downsample2(out[-1]))
    return out

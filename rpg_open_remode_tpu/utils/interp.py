"""Image sampling primitives: bilinear gather and clamped box-filter sums.

TPUs have no texture unit; the reference's hardware-bilinear clamped texture
reads (``include/rmd/texture_memory.cuh:27-66``) become explicit gathers here,
and its per-pixel 5x5 patch loops (``src/seed_init.cu:38-52``) become
separable windowed sums with edge-replicate padding (the exact semantics of a
clamp-addressed texture read past the border).

``tex2D(tex, x+0.5, y+0.5)`` with bilinear filtering == ``bilinear(img, x, y)``
in pixel-index space; all call sites in the reference add the +0.5, so this
module works purely in pixel indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of ``img[H, W]`` at fractional pixel coords (u=x, v=y).

    Clamp addressing: coordinates outside the image replicate the border,
    matching cudaAddressModeClamp.
    """
    h, w = img.shape[-2], img.shape[-1]
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)

    i00 = img[..., v0, u0]
    i01 = img[..., v0, u1]
    i10 = img[..., v1, u0]
    i11 = img[..., v1, u1]
    top = i00 + fu * (i01 - i00)
    bot = i10 + fu * (i11 - i10)
    return top + fv * (bot - top)


def box_sum(img: jnp.ndarray, side: int, offset: int) -> jnp.ndarray:
    """Windowed sum over a ``side x side`` patch anchored at ``offset``.

    ``out[y, x] = sum_{dy, dx in [offset, offset+side)} img[clamp(y+dy), clamp(x+dx)]``

    This is the clamped-texture patch sum of ``seed_init.cu:38-52`` (there
    ``offset = -side//2``). Implemented as two separable 1-D windowed sums on
    an edge-padded image so XLA lowers it to cheap shifted adds, not gathers.
    """
    lo = -offset                # padding needed before (offset is negative)
    hi = side + offset - 1      # padding needed after
    padded = jnp.pad(img, ((lo, hi), (lo, hi)), mode="edge")
    # Separable: sum along rows then cols via reduce_window (window=side, valid)
    s = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add, (1, side), (1, 1), "valid"
    )
    s = jax.lax.reduce_window(
        s, 0.0, jax.lax.add, (side, 1), (1, 1), "valid"
    )
    return s

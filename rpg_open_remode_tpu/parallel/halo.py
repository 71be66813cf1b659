"""Ring halo exchange over mesh axes via ``lax.ppermute``.

This is the communication primitive behind spatial sharding of the seed-state
tensors: box-filter NCC statistics need a patch-radius halo, and the TV-L1
denoiser stencil needs a 1-px halo per iteration (the "ring-attention-shaped"
component of this framework, SURVEY.md section 5). At global image
boundaries the halo is edge-replicated, reproducing the reference's
clamp-addressed texture semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _take(x, axis, start, size):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + size) if start >= 0 else slice(start, None)
    return x[tuple(idx)]


def _repeat_edge(x, axis, first: bool, halo: int):
    edge = _take(x, axis, 0, 1) if first else _take(x, axis, -1, 1)
    return jnp.concatenate([edge] * halo, axis=axis)


def exchange_halo_1d(x: jnp.ndarray, halo: int, axis: int, axis_name: str) -> jnp.ndarray:
    """Extend the local tile with ``halo`` neighbor slices along ``axis``.

    Returns shape grown by ``2*halo`` on ``axis``. Ring exchange with
    edge replication at the global boundary (clamp semantics).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    hi_edge = _take(x, axis, -halo, halo)   # my last rows -> right neighbor
    lo_edge = _take(x, axis, 0, halo)       # my first rows -> left neighbor
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(hi_edge, axis_name, fwd)    # neighbor idx-1's tail
    from_right = lax.ppermute(lo_edge, axis_name, bwd)   # neighbor idx+1's head
    # Global boundary: replicate the edge instead of wrapping the ring.
    from_left = jnp.where(idx == 0, _repeat_edge(x, axis, True, halo), from_left)
    from_right = jnp.where(
        idx == n - 1, _repeat_edge(x, axis, False, halo), from_right
    )
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def exchange_halo_2d(
    x: jnp.ndarray,
    halo: int,
    y_axis: int = -2,
    x_axis: int = -1,
    y_name: str = "ty",
    x_name: str = "tx",
) -> jnp.ndarray:
    """2-D halo exchange including corners (exchange x first, then y on the
    x-extended array, so diagonal-neighbor corners arrive via the y pass)."""
    ext = exchange_halo_1d(x, halo, x_axis if x_axis >= 0 else x.ndim + x_axis, x_name)
    return exchange_halo_1d(ext, halo, y_axis if y_axis >= 0 else x.ndim + y_axis, y_name)

"""Whole-image reductions and per-frame metrics.

The reference needs 350 lines of two-stage shared-memory tree reduction for
this (src/reduction.cu, src/reduction_kernels.cu); on TPU these are single
XLA reduces, and under a device mesh they become ``lax.psum`` collectives
(see rpg_open_remode_tpu.parallel).
"""

from __future__ import annotations

import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState


def image_sum(img: jnp.ndarray) -> jnp.ndarray:
    """ImageReducer<T>::sum (src/reduction.cu:80-131)."""
    return jnp.sum(img)


def count_equal(img: jnp.ndarray, value) -> jnp.ndarray:
    """ImageReducer<T>::countEqual (src/reduction.cu:133-173)."""
    return jnp.sum((img == value).astype(jnp.int32))


def convergence_stats(conv: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Structured per-frame metrics (SURVEY.md section 5 'observability')."""
    return {
        "update": count_equal(conv, int(ConvergenceState.UPDATE)),
        "converged": count_equal(conv, int(ConvergenceState.CONVERGED)),
        "border": count_equal(conv, int(ConvergenceState.BORDER)),
        "diverged": count_equal(conv, int(ConvergenceState.DIVERGED)),
        "no_match": count_equal(conv, int(ConvergenceState.NO_MATCH)),
    }

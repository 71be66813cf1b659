"""Seed convergence classification.

TPU-native equivalent of ``seedCheckKernel`` (src/seed_check.cu:28-67): the
per-thread branch ladder becomes a `jnp.where` cascade over the whole state.
"""

from __future__ import annotations

import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig


def border_mask(height: int, width: int, cfg: RemodeConfig) -> jnp.ndarray:
    """Static BORDER ring: within ``patch_side`` pixels of any edge.

    Note the reference margin is the full patch *side* (5 px), not the patch
    radius — seed_check.cu:37-42. Reproduced as-is.
    """
    m = cfg.patch_side
    y = jnp.arange(height)[:, None]
    x = jnp.arange(width)[None, :]
    inside = (x >= m) & (x <= width - m - 1) & (y >= m) & (y <= height - m - 1)
    return ~inside


def classify_seeds(
    mu: jnp.ndarray,
    sigma_sq: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    epsilon: jnp.ndarray,
    border: jnp.ndarray,
    cfg: RemodeConfig,
) -> jnp.ndarray:
    """Per-pixel state in {BORDER, CONVERGED, DIVERGED, UPDATE}.

    Matches seed_check.cu:44-66: converged iff E[inlier] > eta_inlier and
    sigma_sq < epsilon; diverged iff mode of inlier ratio < eta_outlier.
    """
    e_pi = a / (a + b)
    converged = (e_pi > cfg.eta_inlier) & (sigma_sq < epsilon)
    diverged = (a - 1.0) / (a + b - 2.0) < cfg.eta_outlier
    out = jnp.where(
        converged,
        int(ConvergenceState.CONVERGED),
        jnp.where(diverged, int(ConvergenceState.DIVERGED), int(ConvergenceState.UPDATE)),
    )
    return jnp.where(border, int(ConvergenceState.BORDER), out).astype(jnp.int32)

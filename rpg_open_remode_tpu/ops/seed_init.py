"""Keyframe seed initialization.

TPU-native equivalent of ``seedInitKernel`` (src/seed_init.cu:27-61): the
per-pixel 5x5 template-statistics loops become two separable windowed sums
(pure VPU work, no gathers), and the parameter fills are broadcasts.

The reference accumulates ``const_templ_denom`` in double precision
(seed_init.cu:53-54) because ``N*sum(t^2) - sum(t)^2`` catastrophically
cancels for flat patches; we reproduce that with float64... which TPUs don't
execute natively, so instead we compute the variance form
``N * sum((t - mean)^2)`` which is algebraically identical and numerically
stable in float32.
"""

from __future__ import annotations

import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SceneParams, SeedState
from rpg_open_remode_tpu.utils.interp import box_sum


def template_stats(ref_img: jnp.ndarray, cfg: RemodeConfig):
    """Per-pixel NCC template statistics of the reference image.

    Returns ``(sum_templ, const_templ_denom)`` exactly as seed_init.cu:38-54
    defines them (clamped borders included).
    """
    side, off, area = cfg.patch_side, cfg.patch_offset, cfg.patch_area
    sum_t = box_sum(ref_img, side, off)
    sum_t_sq = box_sum(ref_img * ref_img, side, off)
    # Stable evaluation of area*sum_t_sq - sum_t^2 (= area^2 * patch variance):
    mean_t = sum_t / area
    # area*sum((t-mean)^2) = area*(sum_t_sq - area*mean^2)
    denom = area * (sum_t_sq - sum_t * mean_t)
    return sum_t, jnp.maximum(denom, 0.0)


def init_seeds(
    state: SeedState,
    ref_img: jnp.ndarray,
    T_world_ref: jnp.ndarray,
    scene: SceneParams,
    cfg: RemodeConfig,
    prior=None,
) -> SeedState:
    """Reset the filter on a new reference keyframe (seed_init.cu:56-60).

    ``prior``: optional ``(mu, sigma_sq, a, b, valid)`` warm start
    (keyframe depth propagation, ops/propagate.py); invalid pixels keep
    the reference's flat initialization."""
    sum_t, denom = template_stats(ref_img, cfg)
    shape = ref_img.shape
    mu0 = jnp.full(shape, scene.avg_depth, jnp.float32)
    sig0 = jnp.full(shape, scene.sigma_sq_max, jnp.float32)
    a0 = jnp.full(shape, cfg.a_init, jnp.float32)
    b0 = jnp.full(shape, cfg.b_init, jnp.float32)
    if prior is not None:
        p_mu, p_sig, p_a, p_b, p_valid = prior
        mu0 = jnp.where(p_valid, p_mu, mu0)
        sig0 = jnp.where(p_valid, p_sig, sig0)
        a0 = jnp.where(p_valid, p_a, a0)
        b0 = jnp.where(p_valid, p_b, b0)
    return SeedState(
        ref_img=ref_img,
        sum_templ=sum_t,
        const_templ_denom=denom,
        f_ref=state.f_ref,  # bearings depend only on the camera
        mu=mu0,
        sigma_sq=sig0,
        a=a0,
        b=b0,
        conv=jnp.full(shape, int(ConvergenceState.UPDATE), jnp.int32),
        match_u=jnp.zeros(shape, jnp.float32),
        match_v=jnp.zeros(shape, jnp.float32),
        T_world_ref=T_world_ref,
        scene=scene,
    )

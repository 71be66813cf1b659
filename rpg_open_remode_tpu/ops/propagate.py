"""Keyframe-to-keyframe depth propagation (beyond-reference feature).

The reference re-initializes every keyframe from a flat prior — mean scene
depth everywhere, maximal variance (seed_init.cu:56-60) — throwing away the
previous keyframe's converged posterior. At fast motion (short keyframe
lifetimes) that flat restart is the accuracy bottleneck: seeds get ~15
updates before the next switch and spend most of them shrinking a huge
search band.

This op warm-starts the new keyframe from the old one, TPU-natively (no
gathers, no scatters):

  1. pre-align with the plane-induced homography of the old keyframe's mean
     converged depth — a scanline two-pass warp of (masked depth, mask);
  2. lift each sampled depth along the OLD ray (the warp's analytically
     returned source coordinates give the old bearing pointwise), transform
     into the new frame, and take the along-bearing distance as the prior;
  3. validate by exact reprojection: wherever the plane approximation or a
     depth discontinuity displaced the correspondence by more than
     ``cfg.propagate_tol_px``, the pixel keeps the flat prior. The step-2
     geometry is exact for whatever point was actually sampled, so step 3
     only needs to check we sampled *near* the right ray.

Propagated seeds carry their posterior variance (inflated 4x for the new
baseline, floored at ``(propagate_sigma_factor * depth_range)^2``) and
MOST of their accumulated Beta inlier/outlier evidence beyond the prior
(pseudo-count decay 0.8): the surface is the same physical surface, but
the new viewpoint must re-confirm it. Without the evidence carry, the
slow inlier-ratio climb past eta_inlier=0.7 from the a=b=10 prior forces
~25 confirming updates per keyframe whatever the depth prior — the whole
fast-motion bottleneck. Gated by
``cfg.propagate_depth``.
"""

from __future__ import annotations

import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SeedState
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils import warp as warp_ops
from rpg_open_remode_tpu.utils.camera import PinholeCamera


def propagate_depth(
    old_state: SeedState,
    T_curr_world: jnp.ndarray,   # the NEW keyframe's pose (new <- world)
    scene,                       # the NEW keyframe's SceneParams
    cam: PinholeCamera,
    cfg: RemodeConfig,
):
    """-> (mu_prior, sigma_sq_prior, valid) on the new keyframe's grid."""
    height, width = old_state.mu.shape
    # new <- old
    T_BA = se3.compose(T_curr_world, old_state.T_world_ref)
    R = se3.rotation(T_BA)
    t = se3.translation(T_BA)

    # carry any seed with real evidence, not only fully CONVERGED ones:
    # fast-motion keyframes switch long before the convergence test fires,
    # which is precisely when the warm start matters. Inlier-ratio mean
    # a/(a+b) > 0.5 plus a substantially narrowed variance.
    inlier = old_state.a / (old_state.a + old_state.b)
    narrowed = old_state.sigma_sq < 0.25 * old_state.scene.sigma_sq_max
    conv_mask = (
        (old_state.conv == int(ConvergenceState.CONVERGED))
        | ((old_state.conv == int(ConvergenceState.UPDATE))
           & narrowed & (inlier > 0.5))
    ).astype(jnp.float32)
    n_conv = jnp.sum(conv_mask)
    d0 = jnp.where(
        n_conv > 0,
        jnp.sum(old_state.mu * conv_mask) / jnp.maximum(n_conv, 1.0),
        old_state.scene.avg_depth,
    )

    # plane-induced homography (plane z_A = d0): H maps new pixel -> old
    # pixel, the direction the warp API wants (output -> source)
    K = warp_ops.intrinsic_matrix(cam)
    K_inv = warp_ops.intrinsic_inv(cam)
    n_over_d = jnp.stack([0.0 * d0, 0.0 * d0, 1.0 / d0])
    H_fwd = K @ (R + t[:, None] * n_over_d[None, :]) @ K_inv   # old -> new
    H_back = jnp.linalg.inv(H_fwd)                             # new -> old

    # mask-weighted warp of the old posterior (raw bilinear would blend
    # depths across convergence boundaries; same pattern as the matcher's
    # found-masked back-warp)
    stack = jnp.stack(
        [old_state.mu * conv_mask, old_state.sigma_sq * conv_mask,
         old_state.a * conv_mask, old_state.b * conv_mask, conv_mask]
    )
    warped, u_a, v_a = warp_ops.homography_warp(stack, H_back, height, width)
    m_w = warped[4]
    mu_a = warped[0] / jnp.maximum(m_w, 1e-6)
    sig_a = warped[1] / jnp.maximum(m_w, 1e-6)
    a_w = warped[2] / jnp.maximum(m_w, 1e-6)
    b_w = warped[3] / jnp.maximum(m_w, 1e-6)

    # lift along the OLD ray at the analytically known source coords
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    rx = (u_a - cx) / fx
    ry = (v_a - cy) / fy
    norm = jnp.sqrt(rx * rx + ry * ry + 1.0)
    x_a = jnp.stack([rx / norm, ry / norm, 1.0 / norm]) * mu_a[None]
    x_b = jnp.einsum("ij,jhw->ihw", R, x_a) + t[:, None, None]

    d_b = jnp.sqrt(jnp.sum(x_b * x_b, axis=0))
    z_b = x_b[2]
    u_b = fx * x_b[0] / jnp.maximum(z_b, 1e-6) + cx
    v_b = fy * x_b[1] / jnp.maximum(z_b, 1e-6) + cy
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    err = jnp.hypot(u_b - xx, v_b - yy)

    valid = (
        (m_w > 0.5)
        & (z_b > 1e-3)
        & (err < cfg.propagate_tol_px)
        & (d_b > scene.min_depth)
        & (d_b < scene.max_depth)
    )
    # carried variance: the seed's own posterior variance, inflated 4x for
    # the new-baseline/viewpoint uncertainty, floored by the configured
    # fraction of the new scene's depth range
    floor_sq = jnp.square(cfg.propagate_sigma_factor * scene.depth_range)
    sigma_sq = jnp.maximum(4.0 * sig_a, floor_sq)
    # Beta pseudo-count decay: keep most of the inlier-ratio trend
    a_p = cfg.a_init + 0.8 * jnp.maximum(a_w - cfg.a_init, 0.0)
    b_p = cfg.b_init + 0.8 * jnp.maximum(b_w - cfg.b_init, 0.0)
    return (
        jnp.clip(d_b, scene.min_depth, scene.max_depth),
        sigma_sq, a_p, b_p, valid,
    )

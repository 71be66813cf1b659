"""Recursive Bayesian Gaussian x Beta seed update (Vogiatzis-Hernandez).

TPU-native equivalent of ``seedUpdateKernel`` (src/seed_update.cu:39-121):
triangulate the epipolar match into a depth measurement with a
one-pixel-angle uncertainty, then update the posterior moments of the
Gaussian depth / Beta inlier-ratio mixture. The reference's per-thread branch
structure (UPDATE / NO_MATCH / frozen) becomes a `where` lattice over the
whole ``[H, W]`` field — one fused elementwise VPU pass.
"""

from __future__ import annotations

import jax.lax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SeedState
from rpg_open_remode_tpu.ops.triangulation import (
    triangulate_midpoint,
    triangulation_uncertainty,
)
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera


def _normpdf(x, mu, sigma_sq):
    """Gaussian pdf, as in seed_update.cu:30-37."""
    return jnp.exp(-(x - mu) ** 2 / (2.0 * sigma_sq)) * jax.lax.rsqrt(
        2.0 * jnp.pi * sigma_sq
    )


def update_seeds(
    state: SeedState,
    conv: jnp.ndarray,       # post-match states (UPDATE/NO_MATCH/frozen)
    match_u: jnp.ndarray,
    match_v: jnp.ndarray,
    T_ref_curr: jnp.ndarray,  # (3, 4)
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> SeedState:
    """One measurement-fusion pass. Returns the state with mu/sigma_sq/a/b
    and stored matches refreshed; conv is carried through unchanged."""
    mu, sigma_sq, a, b = state.mu, state.sigma_sq, state.a, state.b
    f_ref = jnp.moveaxis(state.f_ref, 0, -1)  # (H, W, 3)

    # --- triangulated depth measurement (seed_update.cu:68-88)
    f_curr = cam.cam2world(match_u, match_v)
    f_curr = f_curr / jnp.linalg.norm(f_curr, axis=-1, keepdims=True)
    pt_ref = triangulate_midpoint(f_ref, f_curr, T_ref_curr)
    depth = jnp.linalg.norm(pt_ref, axis=-1)
    # measurement uncertainty: the reference's one-pixel angle
    # (triangulation.cu:52-68), optionally widened by the configured VO
    # pose noise (cfg docstring): rotational error perturbs the
    # triangulation angle beta exactly like the pixel angle (first
    # order), so the two angular terms add inside the law-of-sines
    # propagation; translational error scales depth by the relative
    # baseline error. Static branch: zero cost at the reference-exact
    # defaults.
    t_rc = se3.translation(T_ref_curr)
    angle = cam.one_pix_angle()
    # cfg values are PER-AXIS sigmas (how a VO covariance is quoted); the
    # expected magnitude of a 3-component zero-mean Gaussian error is
    # sigma * sqrt(8/pi) ~ 1.596 sigma — widen by the magnitude, not one
    # axis's sigma
    _MAG3 = 1.5957691
    if cfg.pose_noise_rot_deg:
        angle = angle + _MAG3 * cfg.pose_noise_rot_deg * (jnp.pi / 180.0)
    tau = triangulation_uncertainty(depth, f_ref, t_rc, angle)
    tau_sq = tau * tau
    if cfg.pose_noise_trans_m:
        t_norm = jnp.maximum(jnp.linalg.norm(t_rc), 1e-6)
        tau_t = depth * (_MAG3 * cfg.pose_noise_trans_m / t_norm)
        tau_sq = tau_sq + tau_t * tau_t

    # --- Gaussian x Beta posterior moment matching (seed_update.cu:89-110)
    s_sq = (tau_sq * sigma_sq) / (tau_sq + sigma_sq)
    m = s_sq * (mu / sigma_sq + depth / tau_sq)
    c1 = (a / (a + b)) * _normpdf(depth, mu, sigma_sq + tau_sq)
    c2 = (b / (a + b)) * (1.0 / state.scene.depth_range)
    norm_const = c1 + c2
    c1 = c1 / norm_const
    c2 = c2 / norm_const
    f = c1 * ((a + 1.0) / (a + b + 1.0)) + c2 * (a / (a + b + 1.0))
    e = c1 * ((a + 1.0) * (a + 2.0)) / ((a + b + 1.0) * (a + b + 2.0)) + c2 * (
        a * (a + 1.0) / ((a + b + 1.0) * (a + b + 2.0))
    )

    mu_new = c1 * m + c2 * mu
    sigma_sq_new = c1 * (s_sq + m * m) + c2 * (sigma_sq + mu * mu) - mu_new * mu_new
    a_new = (e - f) / (f - e / f)
    b_new = a_new * (1.0 - f) / f

    # --- guards: behind-camera triangulation (seed_update.cu:77-80) and the
    # NaN sentinel (seed_update.cu:100-103) both leave the seed untouched.
    is_update = conv == int(ConvergenceState.UPDATE)
    valid = is_update & (pt_ref[..., 2] >= 0.0) & ~jnp.isnan(c1 * m)
    # NaNs from masked-off lanes must not poison the where: sanitize first.
    mu_new = jnp.where(valid, mu_new, mu)
    sigma_sq_new = jnp.where(valid, sigma_sq_new, sigma_sq)
    a_new = jnp.where(valid, a_new, a)
    b_new = jnp.where(valid, b_new, b)

    # --- NO_MATCH: outlier evidence grows (seed_update.cu:113-117)
    no_match = conv == int(ConvergenceState.NO_MATCH)
    b_new = jnp.where(no_match, b + 1.0, b_new)

    return SeedState(
        ref_img=state.ref_img,
        sum_templ=state.sum_templ,
        const_templ_denom=state.const_templ_denom,
        f_ref=state.f_ref,
        mu=mu_new,
        sigma_sq=sigma_sq_new,
        a=a_new,
        b=b_new,
        conv=conv,
        match_u=jnp.where(is_update, match_u, state.match_u),
        match_v=jnp.where(is_update, match_v, state.match_v),
        T_world_ref=state.T_world_ref,
        scene=state.scene,
    )

"""Two-view midpoint triangulation + one-pixel-angle depth uncertainty.

Vectorized JAX equivalents of the reference device functions
``triangulatenNonLin`` (src/triangulation.cu:29-50) and
``triangulationUncertainty`` (src/triangulation.cu:52-68). All inputs
broadcast over leading dims, so a full ``[H, W]`` field triangulates in one
fused elementwise pass on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from rpg_open_remode_tpu.utils import se3


def triangulate_midpoint(
    f_ref: jnp.ndarray,     # (..., 3) bearing in ref frame (normalized)
    f_curr: jnp.ndarray,    # (..., 3) bearing in curr frame (normalized)
    T_ref_curr: jnp.ndarray,  # (3, 4)
) -> jnp.ndarray:
    """3D point in the reference frame, midpoint of the two closest ray points.

    Solves the 2x2 system of src/triangulation.cu:36-49 in closed form.
    """
    t = se3.translation(T_ref_curr)
    f2 = se3.rotate(T_ref_curr, f_curr)  # curr bearing expressed in ref frame
    b0 = jnp.sum(f_ref * t, axis=-1)
    b1 = jnp.sum(f2 * t, axis=-1)
    a00 = jnp.sum(f_ref * f_ref, axis=-1)
    a01 = jnp.sum(f_ref * f2, axis=-1)     # A[2] in the reference
    a10 = -a01                              # A[1]
    a11 = -jnp.sum(f2 * f2, axis=-1)       # A[3]
    det = a00 * a11 - a10 * a01
    lam0 = (a11 * b0 - a10 * b1) / det
    lam1 = (-a01 * b0 + a00 * b1) / det
    xm = lam0[..., None] * f_ref
    xn = t + lam1[..., None] * f2
    return 0.5 * (xm + xn)


def triangulation_uncertainty(
    z: jnp.ndarray,          # (...) depth along f_ref
    f_ref: jnp.ndarray,      # (..., 3)
    t_ref_curr: jnp.ndarray,  # (3,)
    one_pix_angle: jnp.ndarray,
) -> jnp.ndarray:
    """Law-of-sines depth error for a one-pixel match perturbation.

    Matches src/triangulation.cu:52-68: perturb the triangulation angle beta
    by the angle of one pixel and return ``z_plus - z``.
    """
    a = f_ref * z[..., None] - t_ref_curr
    t_norm = jnp.linalg.norm(t_ref_curr)
    a_norm = jnp.linalg.norm(a, axis=-1)
    cos_alpha = jnp.sum(f_ref * t_ref_curr, axis=-1) / t_norm
    cos_beta = -jnp.sum(a * t_ref_curr, axis=-1) / (t_norm * a_norm)
    alpha = jnp.arccos(jnp.clip(cos_alpha, -1.0, 1.0))
    beta = jnp.arccos(jnp.clip(cos_beta, -1.0, 1.0))
    beta_plus = beta + one_pix_angle
    gamma_plus = jnp.pi - alpha - beta_plus
    z_plus = t_norm * jnp.sin(beta_plus) / jnp.sin(gamma_plus)
    return z_plus - z

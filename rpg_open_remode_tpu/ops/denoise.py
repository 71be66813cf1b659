"""Weighted TV-L1 primal-dual depthmap regularizer (Chambolle-Pock).

TPU-native equivalent of ``DepthmapDenoiser`` (src/depthmap_denoiser.cu):
the per-pixel confidence weight map from the seed state
(computeWeightsKernel, :45-59) and the iterated dual/primal/extrapolation
step (updateTVL1PrimalDualKernel, :61-118), as pure functional stencils
under ``lax.fori_loop``.

Determinism fix (SURVEY.md section 5): the reference separates its dual and
primal half-steps with ``__syncthreads()`` (:85), which only synchronizes
within a 16x16 block, so cross-block neighbor reads race. Here each
half-step is a whole-array functional update — the math the reference
*intends*, now deterministic. We keep the reference's exact discretization,
including its quirk of differencing ``u_head`` at the neighbor against ``u``
(not ``u_head``) at the center (:79-81).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import RemodeConfig


def compute_weights(
    a: jnp.ndarray, b: jnp.ndarray, sigma_sq: jnp.ndarray, large_sigma_sq
) -> jnp.ndarray:
    """Per-pixel TV weight g >= 1 from seed confidence (depthmap_denoiser.cu:56-58)."""
    e_pi = a / (a + b)
    g = (e_pi * sigma_sq + (1.0 - e_pi) * large_sigma_sq) / large_sigma_sq
    return jnp.maximum(g, 1.0)


def _shift_left(x):
    """x[:, j] -> x[:, min(j+1, W-1)] (clamped forward difference neighbor)."""
    return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)


def _shift_up(x):
    return jnp.concatenate([x[1:, :], x[-1:, :]], axis=0)


def _shift_right_zero(x):
    """x[:, j] -> x[:, j-1], 0 at j==0 (divergence west neighbor)."""
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


def _shift_down_zero(x):
    return jnp.concatenate([jnp.zeros_like(x[:1, :]), x[:-1, :]], axis=0)


def tvl1_iteration(u, u_head, p_x, p_y, noisy, g, lam, cfg: RemodeConfig):
    """One full primal-dual iteration, reference discretization."""
    sigma_d = cfg.tv_sigma
    tau = cfg.tv_tau
    theta = cfg.tv_theta
    w = u.shape[1]
    h = u.shape[0]

    # --- dual ascent on p (depthmap_denoiser.cu:76-91)
    grad_x = _shift_left(u_head) - u
    grad_y = _shift_up(u_head) - u
    tp_x = g * grad_x * sigma_d + p_x
    tp_y = g * grad_y * sigma_d + p_y
    mag = jnp.sqrt(tp_x * tp_x + tp_y * tp_y)
    scale = 1.0 / jnp.maximum(1.0, mag)
    p_x = tp_x * scale
    p_y = tp_y * scale

    # --- primal descent on u (depthmap_denoiser.cu:93-112): divergence with
    # Neumann boundary handling (zero flux at the domain edge).
    col = jnp.arange(w)[None, :]
    row = jnp.arange(h)[:, None]
    cur_px = jnp.where(col >= w - 1, 0.0, p_x)
    cur_py = jnp.where(row >= h - 1, 0.0, p_y)
    div = cur_px - _shift_right_zero(p_x) + cur_py - _shift_down_zero(p_y)
    # (west/north neighbors at the edge read index 0 via clamp, then get
    # explicitly zeroed in the reference -- _shift_*_zero does both at once)

    temp_u = u + tau * g * div
    diff = temp_u - noisy
    thr = tau * lam
    u_new = jnp.where(
        diff > thr, temp_u - thr, jnp.where(diff < -thr, temp_u + thr, noisy)
    )
    u_head = u_new + theta * (u_new - u)
    return u_new, u_head, p_x, p_y


def denoise(
    mu: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    sigma_sq: jnp.ndarray,
    depth_range,
    cfg: RemodeConfig,
    lam: float | None = None,
    iterations: int | None = None,
) -> jnp.ndarray:
    """Full denoise pass (DepthmapDenoiser::denoise, depthmap_denoiser.cu:179-224).

    ``large_sigma_sq = depth_range^2 / 72`` per setLargeSigmaSq (:226-229).
    """
    lam = cfg.tv_lambda if lam is None else lam
    iterations = cfg.denoise_iters if iterations is None else iterations
    large_sigma_sq = depth_range * depth_range * cfg.large_sigma_sq_factor
    g = compute_weights(a, b, sigma_sq, large_sigma_sq)
    lam = jnp.asarray(lam, jnp.float32)

    from rpg_open_remode_tpu.ops import denoise_pallas

    height, width = mu.shape
    # same CPU gating as the matcher (rect_match.match_rectified): a
    # 200-iteration interpret-mode solve is orders of magnitude slower than
    # the XLA loop, so CPU users only get Pallas when explicitly opted in
    pallas_ok = cfg.use_pallas and (
        jax.default_backend() != "cpu" or cfg.pallas_interpret
    )
    if pallas_ok and denoise_pallas.fits_vmem(height, width):
        return denoise_pallas.tvl1_pallas(mu, g, lam, iterations, cfg)
    if pallas_ok:
        # beyond the all-in-VMEM budget (e.g. 1280x720): banded chunks of
        # iterations with a 2C-row halo — still ~12x less HBM traffic than
        # the per-iteration XLA loop below
        return denoise_pallas.tvl1_pallas_tiled(mu, g, lam, iterations, cfg)

    u = mu
    u_head = mu
    p_x = jnp.zeros_like(mu)
    p_y = jnp.zeros_like(mu)

    def body(_, carry):
        return tvl1_iteration(*carry, noisy=mu, g=g, lam=lam, cfg=cfg)

    u, _, _, _ = jax.lax.fori_loop(0, iterations, body, (u, u_head, p_x, p_y))
    return u

"""Plain-numpy reference implementations used as test oracles.

These mirror the CUDA reference's math (cited per function) with simple
loops/vectorized numpy — independent of the JAX implementations under test.
"""

from __future__ import annotations

import numpy as np

FLT_MIN = np.float32(1.1754944e-38)


def bilinear(img: np.ndarray, x: float, y: float) -> float:
    """Clamped bilinear sample at pixel-index coords (x, y)."""
    h, w = img.shape
    x = min(max(x, 0.0), w - 1.0)
    y = min(max(y, 0.0), h - 1.0)
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
    fx, fy = x - x0, y - y0
    top = img[y0, x0] + fx * (img[y0, x1] - img[y0, x0])
    bot = img[y1, x0] + fx * (img[y1, x1] - img[y1, x0])
    return float(top + fy * (bot - top))


def template_stats(ref: np.ndarray, side: int = 5):
    """seed_init.cu:38-54 with double accumulation and clamped reads."""
    h, w = ref.shape
    off = -(side // 2)
    sum_t = np.zeros((h, w), np.float64)
    sum_tt = np.zeros((h, w), np.float64)
    for dy in range(side):
        for dx in range(side):
            yy = np.clip(np.arange(h) + off + dy, 0, h - 1)
            xx = np.clip(np.arange(w) + off + dx, 0, w - 1)
            t = ref[np.ix_(yy, xx)].astype(np.float64)
            sum_t += t
            sum_tt += t * t
    area = side * side
    denom = area * sum_tt - sum_t * sum_t
    return sum_t.astype(np.float32), denom.astype(np.float32)


def classify(mu, sigma_sq, a, b, epsilon, eta_inlier, eta_outlier, patch_side):
    """seed_check.cu:28-67."""
    h, w = mu.shape
    out = np.zeros((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            if (
                x > w - patch_side - 1
                or y > h - patch_side - 1
                or x < patch_side
                or y < patch_side
            ):
                out[y, x] = 2  # BORDER
            elif a[y, x] / (a[y, x] + b[y, x]) > eta_inlier and sigma_sq[y, x] < epsilon:
                out[y, x] = 1  # CONVERGED
            elif (a[y, x] - 1) / (a[y, x] + b[y, x] - 2) < eta_outlier:
                out[y, x] = 3  # DIVERGED
            else:
                out[y, x] = 0  # UPDATE
    return out


def triangulate(f_ref, f_curr, R_ref_curr, t_ref_curr):
    """triangulation.cu:29-50, single point."""
    f2 = R_ref_curr @ f_curr
    b0 = t_ref_curr @ f_ref
    b1 = t_ref_curr @ f2
    a00 = f_ref @ f_ref
    a01 = f_ref @ f2
    a10 = -a01
    a11 = -(f2 @ f2)
    det = a00 * a11 - a10 * a01
    lam0 = (a11 * b0 - a10 * b1) / det
    lam1 = (-a01 * b0 + a00 * b1) / det
    xm = lam0 * f_ref
    xn = t_ref_curr + lam1 * f2
    return 0.5 * (xm + xn)


def triangulation_uncertainty(z, f_ref, t, one_pix_angle):
    """triangulation.cu:52-68, single point."""
    a = f_ref * z - t
    t_norm = np.linalg.norm(t)
    a_norm = np.linalg.norm(a)
    alpha = np.arccos(np.clip(f_ref @ t / t_norm, -1, 1))
    beta = np.arccos(np.clip(-(a @ t) / (t_norm * a_norm), -1, 1))
    beta_plus = beta + one_pix_angle
    gamma_plus = np.pi - alpha - beta_plus
    z_plus = t_norm * np.sin(beta_plus) / np.sin(gamma_plus)
    return z_plus - z


def seed_update_single(mu, sigma_sq, a, b, depth, tau_sq, depth_range):
    """seed_update.cu:89-110 posterior moments, single seed."""
    s_sq = (tau_sq * sigma_sq) / (tau_sq + sigma_sq)
    m = s_sq * (mu / sigma_sq + depth / tau_sq)
    norm = np.sqrt(2 * np.pi * (sigma_sq + tau_sq))
    c1 = (a / (a + b)) * np.exp(-((depth - mu) ** 2) / (2 * (sigma_sq + tau_sq))) / norm
    c2 = (b / (a + b)) * (1.0 / depth_range)
    nc = c1 + c2
    c1, c2 = c1 / nc, c2 / nc
    f = c1 * ((a + 1) / (a + b + 1)) + c2 * (a / (a + b + 1))
    e = c1 * ((a + 1) * (a + 2)) / ((a + b + 1) * (a + b + 2)) + c2 * (
        a * (a + 1) / ((a + b + 1) * (a + b + 2))
    )
    mu_new = c1 * m + c2 * mu
    sigma_sq_new = c1 * (s_sq + m * m) + c2 * (sigma_sq + mu * mu) - mu_new * mu_new
    a_new = (e - f) / (f - e / f)
    b_new = a_new * (1 - f) / f
    return mu_new, sigma_sq_new, a_new, b_new


def tvl1_denoise(mu, a, b, sigma_sq, depth_range, lam, iterations):
    """depthmap_denoiser.cu, deterministic two-phase version (numpy)."""
    large = depth_range * depth_range / 72.0
    e_pi = a / (a + b)
    g = np.maximum((e_pi * sigma_sq + (1 - e_pi) * large) / large, 1.0)
    L = np.sqrt(8.0)
    tau = 0.02
    sigma_d = (1.0 / (L * L)) / tau
    theta = 0.5
    h, w = mu.shape
    u = mu.copy()
    u_head = mu.copy()
    px = np.zeros_like(mu)
    py = np.zeros_like(mu)
    for _ in range(iterations):
        gx = np.empty_like(u)
        gy = np.empty_like(u)
        gx[:, :-1] = u_head[:, 1:] - u[:, :-1]
        gx[:, -1] = u_head[:, -1] - u[:, -1]
        gy[:-1, :] = u_head[1:, :] - u[:-1, :]
        gy[-1, :] = u_head[-1, :] - u[-1, :]
        tpx = g * gx * sigma_d + px
        tpy = g * gy * sigma_d + py
        mag = np.sqrt(tpx * tpx + tpy * tpy)
        px = tpx / np.maximum(1.0, mag)
        py = tpy / np.maximum(1.0, mag)

        cur_px = px.copy()
        cur_px[:, -1] = 0
        cur_py = py.copy()
        cur_py[-1, :] = 0
        w_px = np.zeros_like(px)
        w_px[:, 1:] = px[:, :-1]
        n_py = np.zeros_like(py)
        n_py[1:, :] = py[:-1, :]
        div = cur_px - w_px + cur_py - n_py
        temp_u = u + tau * g * div
        diff = temp_u - mu
        thr = tau * lam
        u_new = np.where(diff > thr, temp_u - thr, np.where(diff < -thr, temp_u + thr, mu))
        u_head = u_new + theta * (u_new - u)
        u = u_new
    return u

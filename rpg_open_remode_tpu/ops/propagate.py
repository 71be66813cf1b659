"""Keyframe-to-keyframe depth propagation (beyond-reference feature).

The reference re-initializes every keyframe from a flat prior — mean scene
depth everywhere, maximal variance (seed_init.cu:56-60) — throwing away the
previous keyframe's converged posterior. At fast motion (short keyframe
lifetimes) that flat restart is the accuracy bottleneck: seeds get ~15
updates before the next switch and spend most of them re-earning the Beta
inlier evidence (from a=b=10, crossing eta_inlier=0.7 needs >=14 net
inliers) the old keyframe already had.

This op warm-starts the new keyframe from the old one, TPU-natively (no
gathers, no scatters) via an **inverse-depth plane sweep of homography
warps** — the same trick the matcher uses to avoid data-dependent gathers:

  1. sweep ``PLANES`` fronto-parallel planes of the old keyframe spanning
     its inverse-depth range; each plane's induced homography pre-aligns
     the old posterior (masked mu/sigma^2) onto the new grid with one
     scanline two-pass warp;
  2. per pixel, accept a plane's sample only where it is SELF-CONSISTENT:
     the sampled old depth lies within half a plane spacing (in inverse
     depth) of the plane that was used to warp it — i.e. that plane's warp
     was the (approximately) correct correspondence for that pixel;
  3. lift each accepted sample along the OLD ray (the warp returns its
     source coordinates analytically), transform into the new frame, and
     take the along-bearing distance as the prior; among planes, the
     NEAREST surface wins (new-viewpoint occlusion handled by construction);
  4. final exact-reprojection gate (``cfg.propagate_tol_px``): the step-3
     geometry is exact for whatever point was sampled, so this only needs
     to confirm we sampled near the right ray. Rejected pixels keep the
     reference's flat prior.

Round-4 history: the first version pre-aligned with a SINGLE plane at the
mean converged depth — at fast-motion baselines (0.5 m) any pixel off that
plane reprojects several pixels away, so only 0.1% of pixels survived the
tolerance and the feature measured neutral. The sweep fixes placement:
the winning plane's residual displacement is below a pixel by
construction (spacing calibrated to ~1.5 px at fx*B = 240).

Propagated seeds carry their posterior variance (inflated 4x for the new
baseline, floored at ``(propagate_sigma_factor * depth_range)^2``) but
START WITH THE FLAT BETA PRIOR (a = b = 10): carrying accumulated
inlier evidence was measured (round-4 fast-motion dose-response, decay =
carried fraction of pseudo-counts beyond the prior) to trade accuracy
for convergence monotonically — decay 0.8 gave 74.7% per-keyframe
convergence at 3.4x the RMSE (52 mm), 0.35 -> 69.9%/22.5 mm, 0.2 ->
68.5%/19.2 mm, 0.0 -> 65.4%/16.1 mm vs the flat restart's 33.8%/15.3 mm.
The depth+variance warm start alone nearly doubles convergence at
baseline accuracy; pre-trusted evidence converts the carried-prior error
tail into confidently wrong "converged" seeds, so the new viewpoint must
re-earn all of it. Gated by ``cfg.propagate_depth``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SeedState
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils import warp as warp_ops
from rpg_open_remode_tpu.utils.camera import PinholeCamera

# Tuning constants (plain Python floats — module-level jnp values are a
# tracer-leak hazard, CLAUDE.md). Fixed by the round-4 fast-motion grid
# search (see EVAL.json fast_motion_propagated); deliberately NOT config
# surface — the winning values are part of the feature, not knobs.
PLANES = 96            # inverse-depth sweep planes: at fx*B ~ 240 px and a
                       # ~1.2 1/m inverse-depth span, half a spacing
                       # displaces ~1.5 px — inside the reprojection gate
SIGMA_INFLATE = 4.0    # posterior-variance inflation for the new viewpoint
MIN_INLIER = 0.5       # carry mask: minimum old inlier-ratio mean
NARROW_FRAC = 0.25     # carry mask: sigma_sq below this fraction of max
# Round-5 diagnosis of the r4 lifecycle-composition regression (over-table
# lifecycle within-2.6% 0.887 flat vs 0.856 carried): the carried prior's
# small warp/placement bias costs precision exactly in keyframes whose
# lifetime lets the flat restart converge anyway (+3 conv for -3 within
# there), while in fast motion it nearly doubles convergence at neutral
# precision. An outgoing-convergence gate (skip carry when the old
# keyframe converged > 50%) was BUILT AND MEASURED HARMFUL: once
# propagation succeeds, outgoing convergence exceeds the gate and the
# carry chain self-destructs (fast-motion conv/kf 65.5% -> 47.2%). No
# in-trace signal separates "will converge from flat" (a property of the
# scene bounds and motion, not of the outgoing state), so the tradeoff is
# left to the feature flag: propagate_depth stays default-off and is the
# right tool for short-lived-keyframe regimes.


def propagate_depth(
    old_state: SeedState,
    T_curr_world: jnp.ndarray,   # the NEW keyframe's pose (new <- world)
    scene,                       # the NEW keyframe's SceneParams
    cam: PinholeCamera,
    cfg: RemodeConfig,
):
    """-> (mu_prior, sigma_sq_prior, a_prior, b_prior, valid) on the new
    keyframe's grid (a/b are the flat prior — see module docstring)."""
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
    narrowed = old_state.sigma_sq < NARROW_FRAC * old_state.scene.sigma_sq_max
    conv_mask = (
        (old_state.conv == int(ConvergenceState.CONVERGED))
        | ((old_state.conv == int(ConvergenceState.UPDATE))
           & narrowed & (inlier > MIN_INLIER))
    ).astype(jnp.float32)
    # erode the carry mask by one pixel: a bilinear sample whose 3x3
    # neighborhood is not fully carried blends depths across the mask
    # boundary (typically an occlusion edge) — exactly the gross-error
    # tail that must not be warm-started
    from rpg_open_remode_tpu.utils.interp import box_sum

    conv_mask = (box_sum(conv_mask, 3, -1) > 8.5).astype(jnp.float32)

    # mask-weighted channels (raw bilinear would blend depths across
    # convergence boundaries; same pattern as the matcher's found-masked
    # back-warp)
    stack = jnp.stack(
        [old_state.mu * conv_mask, old_state.sigma_sq * conv_mask, conv_mask]
    )

    K = warp_ops.intrinsic_matrix(cam)
    K_inv = warp_ops.intrinsic_inv(cam)
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]

    # inverse-depth plane grid over the CARRIED pixels' actual depth range
    # (not the scene bounds: live systems pad those heavily — eval.py uses
    # 0.5x..2.5x — and a sweep over the padded span spreads the planes so
    # far apart that the per-plane placement error blows the reprojection
    # gate; the posterior's own support is several times tighter)
    on = conv_mask > 0
    d_min = jnp.min(jnp.where(on, old_state.mu, jnp.inf))
    d_max = jnp.max(jnp.where(on, old_state.mu, -jnp.inf))
    d_min = jnp.where(jnp.isfinite(d_min), d_min, old_state.scene.min_depth)
    d_max = jnp.where(
        jnp.isfinite(d_max) & (d_max > d_min), d_max,
        old_state.scene.max_depth,
    )
    # bounds are ray distances; planes live in z (z = ray/|ray| with |ray|
    # up to ~1.25 at the corners) — widen the near bound accordingly
    inv_lo = 1.0 / (1.05 * d_max)
    inv_hi = 1.0 / jnp.maximum(0.75 * d_min, 1e-3)
    spacing = (inv_hi - inv_lo) / PLANES
    inv_grid = inv_lo + (jnp.arange(PLANES, dtype=jnp.float32) + 0.5) * spacing

    def body(best, inv_d):
        # plane-induced homography for plane z_old = 1/inv_d: maps new
        # pixel -> old pixel (the output -> source convention the warp
        # API wants)
        n_over_d = jnp.stack([0.0 * inv_d, 0.0 * inv_d, inv_d])
        H_fwd = K @ (R + t[:, None] * n_over_d[None, :]) @ K_inv
        H_back = jnp.linalg.inv(H_fwd)
        warped, u_a, v_a = warp_ops.homography_warp(
            stack, H_back, height, width
        )
        m_w = warped[2]
        mu_s = warped[0] / jnp.maximum(m_w, 1e-6)
        rx = (u_a - cx) / fx
        ry = (v_a - cy) / fy
        norm = jnp.sqrt(rx * rx + ry * ry + 1.0)
        # self-consistency: this plane's warp was (approximately) the
        # right correspondence for the sampled surface. The plane lives at
        # z = 1/inv_d while mu is ALONG-RAY distance (z * |ray|) — compare
        # in z or off-center pixels (|ray| up to ~1.25) never qualify.
        # The warp clamp-extends, so samples whose SOURCE coords fall
        # outside the old keyframe's image replicate the edge column/row
        # (depth smeared outward into never-observed regions under
        # panning); gate on the analytically-returned source coords, as
        # every other consumer of this warp does.
        in_src = (
            (u_a >= 0.0) & (u_a <= width - 1.0)
            & (v_a >= 0.0) & (v_a <= height - 1.0)
        )
        z_s = mu_s / norm
        consistent = in_src & (m_w > 0.5) & (
            jnp.abs(1.0 / jnp.maximum(z_s, 1e-3) - inv_d) <= 0.75 * spacing
        )
        x_a = jnp.stack([rx / norm, ry / norm, 1.0 / norm]) * mu_s[None]
        x_b = jnp.einsum("ij,jhw->ihw", R, x_a) + t[:, None, None]
        d_b = jnp.sqrt(jnp.sum(x_b * x_b, axis=0))
        z_b = x_b[2]
        u_b = fx * x_b[0] / jnp.maximum(z_b, 1e-6) + cx
        v_b = fy * x_b[1] / jnp.maximum(z_b, 1e-6) + cy
        err = jnp.hypot(u_b - xx, v_b - yy)

        ok = (
            consistent
            & (z_b > 1e-3)
            & (err < cfg.propagate_tol_px)
            & (d_b > scene.min_depth)
            & (d_b < scene.max_depth)
        )
        # nearest surface wins: the new viewpoint sees the closer of two
        # old surfaces projecting to the same new pixel
        better = ok & (d_b < best["d"])
        take = lambda new, old: jnp.where(better, new, old)  # noqa: E731
        best = {
            "d": take(d_b, best["d"]),
            "sig": take(warped[1] / jnp.maximum(m_w, 1e-6), best["sig"]),
            "valid": best["valid"] | ok,
        }
        return best, None

    # carry derived from inputs (not fresh jnp.zeros): under shard_map the
    # scan carry must match the body outputs' varying-mesh-axes sets
    zero = jnp.zeros_like(old_state.mu) * conv_mask
    big = zero + jnp.inf
    init = {
        "d": big, "sig": zero,
        "valid": zero > 1.0,
    }
    best, _ = jax.lax.scan(body, init, inv_grid)

    valid = best["valid"]
    # carried variance: the seed's own posterior variance, inflated for
    # the new-baseline/viewpoint uncertainty, floored by the configured
    # fraction of the new scene's depth range
    floor_sq = jnp.square(cfg.propagate_sigma_factor * scene.depth_range)
    sigma_sq = jnp.maximum(SIGMA_INFLATE * best["sig"], floor_sq)
    # flat Beta prior (evidence carry measured harmful — module docstring)
    a_p = jnp.full((height, width), cfg.a_init, jnp.float32)
    b_p = jnp.full((height, width), cfg.b_init, jnp.float32)
    mu_p = jnp.clip(
        jnp.where(valid, best["d"], scene.avg_depth),
        scene.min_depth, scene.max_depth,
    )
    return mu_p, sigma_sq, a_p, b_p, valid

"""Multi-device rectified matching: the hot matcher under ``shard_map``.

Sharding strategy (BASELINE.json config 5): seed state lives tiled
``P('kf', 'ty', 'tx')``; the current frame is replicated.  The rectified
matcher's warps and sweep are *global* operations over ~1.2 MB images, so
the cheapest correct distribution at this scale is gather-compute-gather:

  1. all-gather the five warp input fields over the spatial axes (~6 MB over
     ICI per frame),
  2. each device computes one horizontal *band* of the rectified grid —
     the two-pass warp API takes an output-window origin, so a band costs
     1/P of the warp and sweep FLOPs (bands are indexed by the flattened
     spatial device index; disparity shifts are row-local by construction,
     and the 5x5 stencil is handled by computing a 2-row halo and
     trimming),
  3. all-gather the three sweep result maps (~4.5 MB) and back-warp only
     this device's reference-grid tile.

Everything else in the step (classify, Bayesian update, stats psums,
denoiser halo exchange) stays tile-local as in ``parallel/sharded.py``.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax
from jax import lax

from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.ops import rect_match
from rpg_open_remode_tpu.ops.epipolar import MatchResult
from rpg_open_remode_tpu.utils import warp as warp_ops
from rpg_open_remode_tpu.utils.camera import PinholeCamera


def _gather_full(x_tile, axes=("ty", "tx")):
    """Reassemble the full [H, W] field from spatial tiles."""
    x = lax.all_gather(x_tile, axes[0], axis=0, tiled=True)
    return lax.all_gather(x, axes[1], axis=1, tiled=True)


def match_rectified_sharded(
    state_tile,                # SeedState with [th, tw] leaves (one kf)
    curr_img: jnp.ndarray,     # full [H, W], replicated
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
    height: int,
    width: int,
    tile_origin,               # (y0, x0) of this device's ref tile
    spatial_axes=("ty", "tx"),
) -> MatchResult:
    """Tile-local MatchResult for this device's reference tile."""
    th, tw = state_tile.mu.shape
    rect_h, rect_w = rect_match.rect_shape(height, width)
    pad = cfg.disp_pad
    y0_t, x0_t = tile_origin

    n_ty = lax.axis_size(spatial_axes[0])
    n_tx = lax.axis_size(spatial_axes[1])
    n_sp = n_ty * n_tx
    band_idx = lax.axis_index(spatial_axes[0]) * n_tx + lax.axis_index(spatial_axes[1])
    assert rect_h % n_sp == 0, (rect_h, n_sp)
    band_h = rect_h // n_sp

    # --- geometry (identical on every device) -----------------------------
    g = rect_match.rect_geometry(T_curr_ref, cam, height, width)
    B, s, R_rect = g["B"], g["s"], g["R_rect"]
    H_rect_to_ref = g["H_rect_to_ref"]
    H_rect_to_curr = g["H_rect_to_curr"]
    H_curr_to_rect = g["H_curr_to_rect"]
    H_ref_to_rect = g["H_ref_to_rect"]

    # --- gather warp inputs, compute this device's rect band --------------
    mu_f = _gather_full(state_tile.mu, spatial_axes)
    sig_f = _gather_full(state_tile.sigma_sq, spatial_axes)
    ref_f = _gather_full(state_tile.ref_img, spatial_axes)
    conv_f = _gather_full(state_tile.conv, spatial_axes)
    f_ref_full = cam.bearing_grid(height, width)

    sigma = jnp.sqrt(sig_f)
    d_lo = jnp.maximum(mu_f - cfg.sigma_band * sigma, cfg.min_search_depth)
    d_hi = mu_f + cfg.sigma_band * sigma
    d_center = mu_f
    if cfg.straggler_slice:
        # parity with rect_match.prepare_sweep: the straggler flag is
        # computed per tile then gathered; the phase scalar n_est is a
        # pmax so every shard slices identically
        strag_t, fruitless_t = rect_match.straggler_flag(
            state_tile.a, state_tile.b, cfg
        )
        strag_f = _gather_full(strag_t, spatial_axes)
        n_est = lax.pmax(jnp.max(fruitless_t), spatial_axes)
        d_lo, d_hi, d_center = rect_match.straggler_slice_bands(
            d_lo, d_hi, mu_f, strag_f, n_est, jnp.abs(s) * B, cfg
        )
    rz = jnp.maximum(jnp.einsum("j,jhw->hw", R_rect[2], f_ref_full), 1e-3)
    z_floor = jnp.float32(1e-4)
    # only UPDATE-state seeds are matched — parity with the single-device
    # path (ops/rect_match.py) and the reference's early exit for BORDER/
    # CONVERGED/DIVERGED (epipolar_match.cu:51-57); in steady state the
    # converged majority leaving the sweep is the main throughput lever
    from rpg_open_remode_tpu.config import ConvergenceState

    active = (conv_f == int(ConvergenceState.UPDATE)).astype(jnp.float32)
    ref_stack = jnp.stack(
        [
            ref_f,
            jnp.maximum(d_lo * rz, z_floor),
            jnp.maximum(d_center * rz, z_floor),
            jnp.maximum(d_hi * rz, z_floor),
            active,
        ]
    )

    # band with a stencil halo, clamped at the grid edges; outputs are
    # trimmed back to the exact band. 32 halo rows keep ext a multiple of
    # the Pallas sweep's 64-row band (the sweep treats the ext slab's edges
    # as image edges; everything it gets wrong there lies inside the halo).
    # A single spatial device needs no halo at all.
    halo = 32 if band_h + 64 <= rect_h else 0
    band_y0 = band_idx * band_h
    ext = band_h + 2 * halo
    y0_ext = jnp.clip(band_y0 - halo, 0, rect_h - ext).astype(jnp.float32)

    def band_warp(img_stack, H, w_out, x0=0.0):
        # fold the traced band origin into the homography: static-origin
        # warps keep the fast banded-Pallas resampler path eligible
        H_b = warp_ops.shift_origin(H, jnp.float32(x0), y0_ext)
        return warp_ops.homography_warp(img_stack, H_b, ext, w_out)

    ref_r, u_s, v_s = band_warp(ref_stack, H_rect_to_ref, rect_w)
    # analytic ref-footprint validity (parity with rect_match: the
    # resampler clamp-extends, so a warped ones-channel carries nothing)
    valid_r = (
        (u_s >= 0.0) & (u_s <= width - 1.0)
        & (v_s >= 0.0) & (v_s <= height - 1.0)
    ).astype(jnp.float32)

    xlim_full = rect_match._footprint_xlim(
        H_curr_to_rect, height, width, rect_h,
        reach=cfg.patch_side // 2 + 1.5, vrows=cfg.patch_side,
    )
    xlim_ext = lax.dynamic_slice(
        xlim_full, (y0_ext.astype(jnp.int32), 0), (ext, 2)
    )

    fxB = jnp.abs(s) * B
    disp_lo = fxB / ref_r[3]
    disp_hi = fxB / ref_r[1]
    disp_mu = fxB / ref_r[2]
    half_len = 0.5 * jnp.minimum(disp_hi - disp_lo, cfg.max_epipolar_extent)
    disp_lo = jnp.maximum(disp_lo, disp_mu - half_len)
    disp_hi = jnp.minimum(disp_hi, disp_mu + half_len)
    # inactive rect pixels get an EMPTY disparity interval (the sweep's
    # band masks reject every plane and the per-block plane intervals
    # shrink to the active seeds); partially-active blended pixels keep
    # sweeping so active reference pixels never lose blend weight
    act = ref_r[4] > 1e-3
    disp_lo = jnp.where(act, disp_lo, jnp.inf)
    disp_hi = jnp.where(act, disp_hi, -jnp.inf)

    # constant disparity rebasing, matching the single-device path
    # (rect_match.match_rectified): pmin over the spatial axes gives every
    # device the identical global base
    if cfg.disp_rebase:
        lo_valid = jnp.where(valid_r > 0.999, disp_lo, jnp.inf)
        gmin = lax.pmin(jnp.min(lo_valid), spatial_axes)
        base_raw = jnp.floor(gmin) - 1.0
        kbase = jnp.where(
            jnp.isfinite(base_raw), jnp.maximum(base_raw, 0.0), 0.0
        )
    else:
        kbase = jnp.float32(0.0)
    disp_lo = disp_lo - kbase
    disp_hi = disp_hi - kbase
    xlim_ext = xlim_ext + kbase
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    M_aff = jnp.stack(
        [
            jnp.stack([o, z, -kbase]),
            jnp.stack([z, o, z]),
            jnp.stack([z, z, o]),
        ]
    )
    curr_r, _, _ = band_warp(
        curr_img, H_rect_to_curr @ M_aff, rect_w + 2 * pad,
        x0=-float(pad),
    )

    # fused kernel handles any odd patch whose half-side fits its 8-row
    # halo (see rect_match.match_rectified)
    from rpg_open_remode_tpu.ops import sweep_pallas as _sp

    pallas_ok = cfg.use_pallas and cfg.patch_side // 2 <= _sp.HALO and (
        jax.default_backend() != "cpu" or cfg.pallas_interpret
    )

    if cfg.coarse_to_fine:
        # per-band coarse-to-fine, mirroring rect_match.match_rectified:
        # the half-resolution peak localization is pure band-local compute
        # (no collectives), so bands may take the cond independently
        extent = disp_hi - disp_lo
        wide_n = jnp.isfinite(extent) & (
            extent > 2.0 * cfg.coarse_refine_radius + 2.0
        )
        wide_needed = jnp.mean(wide_n.astype(jnp.float32)) > 0.15
        narrow_fn, skip_fn = rect_match._coarse_branches(
            cfg, pallas_ok and ext % 64 == 0
        )
        disp_lo, disp_hi = lax.cond(
            wide_needed, narrow_fn, skip_fn,
            curr_r, ref_r[0], valid_r, xlim_ext, disp_lo, disp_hi,
        )

    if pallas_ok and ext % 64 == 0:
        from rpg_open_remode_tpu.ops import sweep_pallas

        disp_b, ncc_b, found_f = sweep_pallas.disparity_sweep(
            curr_r, xlim_ext, ref_r[0], valid_r,
            disp_lo, disp_hi, cfg.ncc_threshold,
            cfg.num_planes, pad, cfg.patch_side, cfg.subplane_refine,
        )
        found_b = found_f > 0.5
    else:
        disp_b, ncc_b, found_b = rect_match._sweep_xla(
            curr_r, xlim_ext, ref_r[0], valid_r,
            disp_lo, disp_hi, cfg,
        )
    # trim the halo: this device's exact band rows
    off = (band_y0 - y0_ext.astype(jnp.int32)).astype(jnp.int32)
    trim = lambda x: lax.dynamic_slice(x, (off, 0), (band_h, rect_w))
    # found-masked blend (parity with rect_match.match_rectified): warp
    # (disp*found, ncc*found, found) and renormalize so not-found sentinel
    # values never pollute boundary pixels
    found_fl = found_b.astype(jnp.float32)
    # k-space -> true disparity (matching rect_match.match_rectified)
    disp_true = disp_b + kbase
    band_out = jnp.stack(
        [
            trim(disp_true * found_fl),
            trim(ncc_b * found_fl),
            trim(found_fl),
        ]
    )

    # --- gather sweep results, back-warp this device's ref tile -----------
    full_out = lax.all_gather(
        band_out, spatial_axes, axis=1, tiled=True
    )  # [3, rect_h, rect_w]

    back, _, _ = warp_ops.homography_warp(
        full_out,
        warp_ops.shift_origin(H_ref_to_rect, x0_t, y0_t),
        th, tw,
    )
    found_t = back[2]
    wgt = jnp.maximum(found_t, 1e-6)
    disp_t = back[0] / wgt
    ncc_t = back[1] / wgt

    yy = y0_t + jnp.arange(th, dtype=jnp.float32)[:, None]
    xx = x0_t + jnp.arange(tw, dtype=jnp.float32)[None, :]
    xr, yr = warp_ops.homography_coords(H_ref_to_rect, xx, yy)
    uc_r = xr - disp_t
    den_c = H_rect_to_curr[2, 0] * uc_r + H_rect_to_curr[2, 1] * yr + H_rect_to_curr[2, 2]
    den_c = jnp.where(jnp.abs(den_c) < 1e-8, 1e-8, den_c)
    u_c = (
        H_rect_to_curr[0, 0] * uc_r + H_rect_to_curr[0, 1] * yr + H_rect_to_curr[0, 2]
    ) / den_c
    v_c = (
        H_rect_to_curr[1, 0] * uc_r + H_rect_to_curr[1, 1] * yr + H_rect_to_curr[1, 2]
    ) / den_c

    found = (found_t > 0.5) & (ncc_t >= cfg.ncc_threshold)
    return MatchResult(
        found=found, u=u_c, v=v_c, best_ncc=jnp.clip(ncc_t, -1.0, 1.0)
    )

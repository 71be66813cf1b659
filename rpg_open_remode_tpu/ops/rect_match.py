"""Rectified disparity-sweep NCC matcher — the TPU-native hot path.

The reference's ``seedEpipolarMatchKernel`` (src/epipolar_match.cu:37-140)
walks each pixel's epipolar segment with per-pixel data-dependent texture
reads.  TPUs have no gather unit (a 640x480 gather tap costs ~3 ms under
XLA), so this module restructures the search around *stereo rectification*:

1. Rotate both cameras onto a common rectified frame whose x-axis is the
   baseline (Fusiello-style).  Epipolar lines become horizontal scanlines and
   every depth hypothesis becomes a *uniform horizontal shift* of the
   rectified current image — ``lax.dynamic_slice``, the one data-dependent
   addressing primitive TPUs execute at full speed.
2. The two rectification warps (+ one inverse warp of the results) are pure
   rotation homographies, executed with the exact two-pass MXU resampler in
   ``utils/warp.py`` — three warps per frame total, instead of the
   reference's ~25 texture gathers per pixel per search step.
3. The sweep itself is K fractional shifts + 5x5 ZNCC box sums + a masked
   running argmax — pure VPU work.  Per-pixel Bayesian search bands
   (mu +- 3 sigma, epipolar_match.cu:63-71) and the 100-px extent cap
   (:73-75) are enforced as disparity-interval masks; sub-step precision
   (the reference's 0.7-px stepping, :88) comes from a 3-point parabolic
   refinement of the NCC peak over disparity.

Zero/near-zero baseline (the reference's degenerate self-match case,
test/epipolar_test.cpp:138-225) falls back to a single-homography match at
the infinite plane, which reduces to an identity warp for identity motion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.models.state import SeedState
from rpg_open_remode_tpu.ops.epipolar import MatchResult
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.utils import warp as warp_ops

# plain Python floats: module-level jnp arrays would be created inside
# whatever trace first imports this module and leak as tracers
_FLT_MIN = 1.1754944e-38
_NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def rect_shape(height: int, width: int) -> tuple[int, int]:
    """Static rectified-grid shape: mild headroom over the reference image,
    lane-aligned last dim, rows a multiple of the Pallas sweep band."""
    return _round_up(height + 32, 64), _round_up(width + 64, 128)


def _basis(i: int) -> jnp.ndarray:
    """Standard basis vector e_i as a traced computation (no constant)."""
    return (jnp.arange(3) == i).astype(jnp.float32)


def _corners(height, width, order: str) -> jnp.ndarray:
    """Homogeneous image-corner matrix [4, 3] as a traced computation.
    order 'zigzag' = (0,0),(W,0),(0,H),(W,H); 'ring' = (0,0),(W,0),(W,H),(0,H)."""
    i = jnp.arange(4)
    right = (i % 2 == 1) if order == "zigzag" else (i == 1) | (i == 2)
    cx = jnp.where(right, width - 1.0, 0.0)
    cy = jnp.where(i >= 2, height - 1.0, 0.0)
    return jnp.stack([cx, cy, jnp.ones(4, jnp.float32)], axis=1)


def _rect_rotation(C: jnp.ndarray) -> jnp.ndarray:
    """Rows [e1; e2; e3] of the rectifying rotation: x-axis along the
    baseline C (current camera center in ref frame), z-axis as close to the
    reference optical axis as possible (Fusiello's construction)."""
    B = jnp.linalg.norm(C)
    e1 = C / jnp.maximum(B, 1e-12)
    # computed (not literal) basis vectors: literal jnp.array constants are
    # hoisted as hidden executable parameters by jax and trip a dispatch bug
    # when several engines trace identical computations
    z = _basis(2)
    y_alt = _basis(1)
    e2 = jnp.cross(z, e1)
    n2 = jnp.linalg.norm(e2)
    # Forward motion (baseline ~ parallel to optical axis): fall back to the
    # camera y-axis to keep the frame well conditioned.
    e2 = jnp.where(n2 > 1e-3, e2 / jnp.maximum(n2, 1e-12), y_alt)
    e2 = e2 - jnp.dot(e2, e1) * e1
    e2 = e2 / jnp.maximum(jnp.linalg.norm(e2), 1e-12)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3])


def _fit_rect_intrinsics(R_rect, cam, height, width, rect_h, rect_w):
    """Rect intrinsics (sx, sy, cx', cy') mapping rectified normalized
    coords onto the static rect grid so the reference footprint fits.

    The scales carry the SIGNS of the source focal lengths so the rect grid
    keeps the source image's row/column orientation (the dataset camera has
    fy < 0) — downstream this keeps warp sample offsets near-identity,
    which the banded Pallas resamplers rely on, and disparity positive
    (|sx| enters the depth conversion)."""
    corners = _corners(height, width, "zigzag")
    rays = corners @ warp_ops.intrinsic_inv(cam).T          # [4, 3]
    Y = rays @ R_rect.T
    xh = Y[:, 0] / Y[:, 2]
    yh = Y[:, 1] / Y[:, 2]
    sx_m = (rect_w - 1.0) / jnp.maximum(xh.max() - xh.min(), 1e-6)
    sy_m = (rect_h - 1.0) / jnp.maximum(yh.max() - yh.min(), 1e-6)
    s = jnp.minimum(sx_m, sy_m)
    sx = jnp.sign(cam.fx) * s
    sy = jnp.sign(cam.fy) * s
    cx = -jnp.minimum(sx * xh.min(), sx * xh.max())
    cy = -jnp.minimum(sy * yh.min(), sy * yh.max())
    return s, sx, sy, cx, cy


def _kmat(sx, sy, cx, cy):
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    return jnp.stack(
        [
            jnp.stack([sx, z, cx]),
            jnp.stack([z, sy, cy]),
            jnp.stack([z, z, o]),
        ]
    )


def _kmat_inv(sx, sy, cx, cy):
    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    ix = 1.0 / sx
    iy = 1.0 / sy
    return jnp.stack(
        [
            jnp.stack([ix, z, -cx * ix]),
            jnp.stack([z, iy, -cy * iy]),
            jnp.stack([z, z, o]),
        ]
    )


def _box5(x: jnp.ndarray, side: int) -> jnp.ndarray:
    """'same' separable box sum with zero padding (rect-grid NCC windows;
    out-of-footprint pixels are masked by the eroded validity map)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, side), (1, 1), "same")
    return jax.lax.reduce_window(s, 0.0, jax.lax.add, (side, 1), (1, 1), "same")


def _footprint_xlim(H_img_to_rect, height, width, rect_h, reach=3.5,
                    vrows=5):
    """Exact per-rect-row x-interval of the warped image footprint.

    The footprint is the convex quad spanned by the image corners under the
    rectifying homography; its intersection with scanline y is an interval.
    Eroded by ``reach`` px horizontally and ``vrows//2`` rows vertically so
    every NCC-patch tap + bilinear lerp of a passing sample is in-footprint
    (reach = patch//2 + 1.5: 0.5 px slack over the nominal taps+lerp; the
    5/3.5 defaults are the reference's 5x5 patch).
    Returns [rect_h, 2] (min, max); empty rows have min > max.
    """
    corners = _corners(height, width, "ring")
    pc = corners @ H_img_to_rect.T
    px = pc[:, 0] / pc[:, 2]
    py = pc[:, 1] / pc[:, 2]
    qx = jnp.roll(px, -1)
    qy = jnp.roll(py, -1)

    y = jnp.arange(rect_h, dtype=jnp.float32)[:, None]        # [rect_h, 1]
    dy = qy[None, :] - py[None, :]
    t = (y - py[None, :]) / jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
    crossing = (t >= 0.0) & (t <= 1.0)
    x_at = px[None, :] + t * (qx[None, :] - px[None, :])
    xmin = jnp.min(jnp.where(crossing, x_at, jnp.inf), axis=1)
    xmax = jnp.max(jnp.where(crossing, x_at, -jnp.inf), axis=1)

    # vertical erosion: all rows y-p..y+p must admit the interval
    xmin_e = jax.lax.reduce_window(
        xmin, -jnp.inf, jax.lax.max, (vrows,), (1,), "same"
    ) + reach
    xmax_e = jax.lax.reduce_window(
        xmax, jnp.inf, jax.lax.min, (vrows,), (1,), "same"
    ) - reach
    return jnp.stack([xmin_e, xmax_e], axis=1)


def _sweep_xla(
    curr_pad, xlim, ref_img_r, valid_r,
    disp_lo, disp_hi, cfg: RemodeConfig, num_planes=None, pad=None,
    subplane_refine=None,
):
    """Pure-XLA disparity sweep (oracle / fallback for the Pallas kernel in
    ops/sweep_pallas.py — identical math, one jnp op per step)."""
    rect_h, rect_w = ref_img_r.shape
    side = cfg.patch_side
    area = jnp.float32(cfg.patch_area)
    pad = cfg.disp_pad if pad is None else pad
    num_planes = cfg.num_planes if num_planes is None else num_planes
    subplane_refine = (
        cfg.subplane_refine if subplane_refine is None else subplane_refine
    )

    sum_t = _box5(ref_img_r, side)
    denom_t = area * _box5(ref_img_r * ref_img_r, side) - sum_t * sum_t
    ref_ok = _box5((valid_r > 0.999).astype(jnp.float32), side) > (area - 0.5)
    ref_ok &= denom_t > 1e-10
    # half-plane slack: a band narrower than one integer step must still
    # see one hypothesis (the extent cap is already folded into the bounds)
    disp_lo = disp_lo - 0.5
    disp_hi = disp_hi + 0.5
    xcoord = jnp.arange(rect_w, dtype=jnp.float32)[None, :]
    xmin_e = xlim[:, 0:1]
    xmax_e = xlim[:, 1:2]

    def ncc_at(k):
        delta = k.astype(jnp.float32)
        img = jax.lax.dynamic_slice(curr_pad, (0, pad - k), (rect_h, rect_w))
        s_i = _box5(img, side)
        s_ii = _box5(img * img, side)
        s_it = _box5(img * ref_img_r, side)
        num = area * s_it - s_i * sum_t
        den_l = area * s_ii - s_i * s_i
        den = den_l * denom_t
        ncc = num * jax.lax.rsqrt(jnp.maximum(den, _FLT_MIN))
        x_src = xcoord - delta
        ok = (
            ref_ok
            & (den_l > 1e-10)   # textureless curr patch guard (see kernel)
            & (x_src >= xmin_e)
            & (x_src <= xmax_e)
            & (delta >= disp_lo)
            & (delta <= disp_hi)
        )
        return jnp.where(ok, ncc, _NEG)

    def body(k, carry):
        best, best_k, left, right, prev = carry
        ncc = ncc_at(k)
        improved = ncc > best
        right = jnp.where(best_k == k - 1, ncc, right)
        left = jnp.where(improved, prev, left)
        right = jnp.where(improved, _NEG, right)
        best_k = jnp.where(improved, k, best_k)
        best = jnp.where(improved, ncc, best)
        return best, best_k, left, right, ncc

    # derived from an input (not jnp.zeros) so the carry inherits the
    # device-varying axes under shard_map
    zero = jnp.zeros_like(ref_img_r)
    init = (
        zero - 1.0,
        jnp.full_like(ref_img_r, -10, dtype=jnp.int32),
        zero + _NEG,
        zero + _NEG,
        zero + _NEG,
    )
    assert num_planes <= pad - 1, (num_planes, pad)
    best, best_k, left, right, _ = jax.lax.fori_loop(
        0, num_planes, body, init
    )

    kf = best_k.astype(jnp.float32)
    if subplane_refine:
        have = (left > 0.5 * _NEG) & (right > 0.5 * _NEG)
        den = left - 2.0 * best + right
        delta = jnp.where(
            have & (jnp.abs(den) > 1e-12), 0.5 * (left - right) / den, 0.0
        )
        kf = kf + jnp.clip(delta, -0.5, 0.5)
    disp_best = kf
    found_r = (best >= cfg.ncc_threshold) & (best_k >= 0)
    return disp_best, best, found_r


def _coarse_narrow(
    curr_pad, ref_img_r, valid_r, xlim, disp_lo, disp_hi,
    cfg: RemodeConfig, pallas_ok: bool,
):
    """Coarse-to-fine: localize each pixel's NCC peak on an x-decimated
    half-resolution grid (the same sweep kernel at half planes / half
    pixels, ~1/4 cost), then shrink the per-pixel disparity band to
    +-coarse_refine_radius planes around the peak. Pixels the coarse pass
    cannot place (low NCC, empty half-band, peak outside the Bayesian
    band) keep their full band — correctness never depends on the coarse
    result. Stands in for the walk's implicit coarse-to-fine (the
    reference steps 0.7 px over a +-3 sigma segment, epipolar_match.cu:
    63-96; here young keyframes' wide bands are the expensive case)."""
    pad_h = cfg.disp_pad // 2
    planes_h = min(pad_h - 1, cfg.num_planes // 2 + 1)
    # x-only 2:1 box decimation: half-grid pixel x_h covers full lanes
    # (2x_h, 2x_h+1); the sampling offsets of ref and curr halves cancel,
    # so half-disparity k_h corresponds exactly to full disparity 2*k_h
    # under the same window convention.
    curr_h = 0.5 * (curr_pad[:, ::2] + curr_pad[:, 1::2])
    ref_h = 0.5 * (ref_img_r[:, ::2] + ref_img_r[:, 1::2])
    valid_h = jnp.minimum(valid_r[:, ::2], valid_r[:, 1::2])
    # footprint margin on the half grid must scale with the patch: NCC
    # taps span patch//2 HALF-pixels here (2x the full-res angular span),
    # while the inherited full-res erosion (reach = patch//2 + 1.5 full
    # px) halves on this grid — a fixed +-1 was only sufficient for the
    # 5x5 patch; larger patches read clamp-extended junk at the edges and
    # narrowed bands around false coarse peaks
    hp_margin = 0.5 * (cfg.patch_side // 2) + 1.0
    xlim_h = jnp.stack(
        [xlim[:, 0] * 0.5 + hp_margin, xlim[:, 1] * 0.5 - hp_margin], axis=1
    )
    # per-half-pixel band = union of the two covered full pixels' bands
    lo_h = jnp.minimum(disp_lo[:, ::2], disp_lo[:, 1::2]) * 0.5
    hi_h = jnp.maximum(disp_hi[:, ::2], disp_hi[:, 1::2]) * 0.5
    # Mosaic lane tiling needs 128-aligned widths; rect_w is 128-aligned
    # but its half may only be 64-aligned (e.g. 896 -> 448). Pad with
    # empty-band columns and slice the outputs back.
    w_h = ref_h.shape[1]
    w_hp = ((w_h + 127) // 128) * 128
    if w_hp != w_h:
        dw = w_hp - w_h
        ref_h = jnp.pad(ref_h, ((0, 0), (0, dw)))
        valid_h = jnp.pad(valid_h, ((0, 0), (0, dw)))
        curr_h = jnp.pad(curr_h, ((0, 0), (0, dw)))
        lo_h = jnp.pad(lo_h, ((0, 0), (0, dw)), constant_values=jnp.inf)
        hi_h = jnp.pad(hi_h, ((0, 0), (0, dw)), constant_values=-jnp.inf)
    if pallas_ok:
        from rpg_open_remode_tpu.ops import sweep_pallas

        d_c, _, found_f = sweep_pallas.disparity_sweep(
            curr_h, xlim_h, ref_h, valid_h, lo_h, hi_h,
            cfg.ncc_threshold, planes_h, pad_h, cfg.patch_side,
            False,
        )
        found_c = found_f > 0.5
    else:
        d_c, _, found_c = _sweep_xla(
            curr_h, xlim_h, ref_h, valid_h, lo_h, hi_h, cfg,
            num_planes=planes_h, pad=pad_h, subplane_refine=False,
        )
    d_up = jnp.repeat(2.0 * d_c[:, :w_h], 2, axis=1)
    f_up = jnp.repeat(found_c[:, :w_h], 2, axis=1)
    r = cfg.coarse_refine_radius
    lo2 = jnp.maximum(disp_lo, d_up - r)
    hi2 = jnp.minimum(disp_hi, d_up + r)
    # pixels the coarse pass could not place keep their full band —
    # correctness never depends on the coarse result. (A "coarse gate"
    # variant that shrank unplaced wide pixels to a minimal band was
    # measured a net LOSS — it cut block plane hulls only ~30%, less than
    # the always-on half-res pass costs — and removed in round 4; see
    # docs/DESIGN.md.)
    ok = f_up & (lo2 <= hi2)
    return jnp.where(ok, lo2, disp_lo), jnp.where(ok, hi2, disp_hi)


def _coarse_skip(curr_pad, ref_img_r, valid_r, xlim, disp_lo, disp_hi):
    return disp_lo, disp_hi


@functools.lru_cache(maxsize=None)
def _coarse_branches(cfg: RemodeConfig, pallas_ok: bool):
    # cond branches must be stable cached objects (see _branches below)
    return (
        functools.partial(_coarse_narrow, cfg=cfg, pallas_ok=pallas_ok),
        _coarse_skip,
    )


def straggler_flag(a: jnp.ndarray, b: jnp.ndarray, cfg: RemodeConfig):
    """Per-seed straggler predicate + fruitless-frame count (see
    straggler_slice_bands). A seed is a straggler once it has accumulated
    ``straggler_after`` net outlier pseudo-counts (NO_MATCH does b += 1,
    seed_update.cu:113-117) while its inlier-ratio mean says matches have
    been the exception (< 0.45 — a converging seed crosses this from
    above within a few good matches)."""
    fruitless = b - cfg.b_init
    flag = (fruitless >= cfg.straggler_after) & (a / (a + b) < 0.45)
    return flag.astype(jnp.float32), fruitless


def straggler_slice_bands(
    d_lo, d_hi, mu, strag, n_est, fxB, cfg: RemodeConfig
):
    """Slice stragglers' search bands to a rotating fixed-width window.

    The reference pays its epipolar walk over min(3 sigma, 100 px) for
    every active seed every frame (epipolar_match.cu:63-96); unmatchable
    seeds (occluded/textureless) therefore sweep maximal bands for the
    whole keyframe life. On TPU that cost is worse than per-pixel: one
    wide-band seed inflates its whole (64-row, 128/256-col) block's plane
    hull (ops/sweep_pallas.block_plane_intervals). This op replaces a
    flagged straggler's band with a slice of fixed width
    S = 2*coarse_refine_radius + 2 planes (exactly the coarse-to-fine
    "narrow" width, so sliced seeds also stop triggering the coarse pass):

      - two frames out of three: an exploration window stepped through the
        full band by the golden ratio (low-discrepancy: any sub-interval
        is revisited within ~band/S frames, so a match that becomes
        visible mid-keyframe is still found a few frames later);
      - every third frame: an exploitation window centered on the seed's
        current mu (so a straggler that DID match once converges from its
        own posterior instead of waiting for the rotation).

    The slice lives in inverse depth (where integer disparities are
    uniform), and its phase derives from ``n_est`` — the image-wide
    maximum fruitless count, which advances by one per frame as long as
    any seed fails (in practice always) — NOT from each seed's own count:
    a shared phase keeps the slices of neighboring stragglers aligned, so
    block hulls collapse to ~S planes instead of re-uniting to the full
    band. ``n_est`` is also shard-invariant (computed with a pmax under
    meshes), keeping the sharded matcher bitwise-consistent.

    The rotation explores the EXTENT-CAPPED band — the mu-centered
    min(6 sigma, max_epipolar_extent)-plane window the unsliced matcher
    would actually search (epipolar_match.cu:73-75 semantics, applied
    downstream for unsliced pixels) — so slicing never searches farther
    than the full sweep would, and full coverage takes only
    ~max_epipolar_extent/S frames.

    Returns (d_lo', d_hi', d_center) with d_center the slice midpoint —
    the downstream extent-cap recentering must center on the slice, not
    on mu, or an exploration window that excludes mu would be emptied by
    the cap."""
    S_pl = 2.0 * cfg.coarse_refine_radius + 2.0
    fxB = jnp.maximum(fxB, 1e-6)
    i_lo = 1.0 / d_hi                       # d_hi >= mu >= min_search > 0
    i_hi = 1.0 / d_lo
    i_mu0 = 1.0 / jnp.clip(mu, d_lo, d_hi)
    # emulate the downstream extent cap (mu-centered) before slicing
    half = 0.5 * jnp.minimum((i_hi - i_lo) * fxB, cfg.max_epipolar_extent) / fxB
    i_lo = jnp.maximum(i_lo, i_mu0 - half)
    i_hi = jnp.minimum(i_hi, i_mu0 + half)
    Wi = i_hi - i_lo
    Si = S_pl / fxB
    sliced = (strag > 0.5) & (Wi > Si)
    phase = 0.6180339887 * n_est
    phi = phase - jnp.floor(phase)
    exploit = jnp.floor(n_est) % 3.0 < 0.5
    lo_explore = i_lo + phi * (Wi - Si)
    lo_center = jnp.clip(i_mu0 - 0.5 * Si, i_lo, i_hi - Si)
    lo_s = jnp.where(exploit, lo_center, lo_explore)
    hi_s = lo_s + Si
    d_lo2 = jnp.where(sliced, 1.0 / hi_s, d_lo)
    d_hi2 = jnp.where(sliced, 1.0 / lo_s, d_hi)
    d_center = jnp.where(sliced, 2.0 / (lo_s + hi_s), mu)
    return d_lo2, d_hi2, d_center


def rect_geometry(T_curr_ref, cam: PinholeCamera, height: int, width: int):
    """The per-frame rectification geometry shared by the single-device and
    sharded matchers: rotation/baseline of the relative pose, the rectifying
    rotation and fitted rect intrinsics, and the four homographies between
    the ref / current / rect grids. Returns a dict."""
    rect_h, rect_w = rect_shape(height, width)
    R = se3.rotation(T_curr_ref)
    t = se3.translation(T_curr_ref)
    C = -R.T @ t                       # current camera center in ref frame
    B = jnp.linalg.norm(C)
    Kc = warp_ops.intrinsic_matrix(cam)
    Kc_inv = warp_ops.intrinsic_inv(cam)
    # orient the rectified x-axis so disparity (= sx * (e1.C) / z) comes out
    # positive for points in front of the cameras whatever the sign of fx
    R_rect = _rect_rotation(jnp.sign(cam.fx) * C)
    s, sxr, syr, cxr, cyr = _fit_rect_intrinsics(
        R_rect, cam, height, width, rect_h, rect_w
    )
    Kr = _kmat(sxr, syr, cxr, cyr)
    Kr_inv = _kmat_inv(sxr, syr, cxr, cyr)
    return dict(
        rect_h=rect_h, rect_w=rect_w, R=R, t=t, C=C, B=B, s=s,
        # warp API wants output -> source maps
        H_rect_to_ref=Kc @ R_rect.T @ Kr_inv,
        H_rect_to_curr=Kc @ R @ R_rect.T @ Kr_inv,
        H_curr_to_rect=Kr @ R_rect @ R.T @ Kc_inv,
        H_ref_to_rect=Kr @ R_rect @ Kc_inv,
        R_rect=R_rect,
    )


def prepare_sweep(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> dict:
    """Everything `match_rectified` does BEFORE the disparity sweep:
    rectification warps, footprint interval, per-pixel disparity bands
    (Bayesian ∩ extent cap), disparity rebasing, and coarse-to-fine band
    narrowing. Factored out so the bench's compute-efficiency accounting
    (ops/accounting.py) can reproduce the exact bands the kernel sweeps
    without duplicating the hot-path logic. Returns a dict of sweep inputs
    plus accounting taps (pre-coarse bands, wide_needed)."""
    height, width = curr_img.shape
    pad = cfg.disp_pad
    g = rect_geometry(T_curr_ref, cam, height, width)
    rect_h, rect_w = g["rect_h"], g["rect_w"]
    B, s, R_rect = g["B"], g["s"], g["R_rect"]
    H_rect_to_ref = g["H_rect_to_ref"]
    H_rect_to_curr = g["H_rect_to_curr"]

    sigma = jnp.sqrt(state.sigma_sq)
    d_lo = jnp.maximum(state.mu - cfg.sigma_band * sigma, cfg.min_search_depth)
    d_hi = state.mu + cfg.sigma_band * sigma
    d_center = state.mu
    if cfg.straggler_slice:
        strag, fruitless = straggler_flag(state.a, state.b, cfg)
        d_lo, d_hi, d_center = straggler_slice_bands(
            d_lo, d_hi, state.mu, strag, jnp.max(fruitless),
            jnp.abs(s) * B, cfg,
        )
    rz = jnp.einsum("j,jhw->hw", R_rect[2], state.f_ref)   # rect z of unit bearing
    rz = jnp.maximum(rz, 1e-3)
    z_floor = jnp.float32(1e-4)
    # Only UPDATE-state seeds are matched — the reference's early exit for
    # BORDER/CONVERGED/DIVERGED (epipolar_match.cu:51-57). Besides parity,
    # this is the main throughput lever in steady state: converged seeds
    # (the majority) leave the sweep, and diverged seeds' huge-sigma bands
    # stop inflating the per-band plane ranges that drive group skipping.
    from rpg_open_remode_tpu.config import ConvergenceState

    active = (state.conv == int(ConvergenceState.UPDATE)).astype(jnp.float32)
    ref_stack = jnp.stack(
        [
            state.ref_img,
            jnp.maximum(d_lo * rz, z_floor),
            jnp.maximum(d_center * rz, z_floor),
            jnp.maximum(d_hi * rz, z_floor),
            active,
        ]
    )
    ref_r, u_s, v_s = warp_ops.homography_warp(
        ref_stack, H_rect_to_ref, rect_h, rect_w
    )
    ref_img_r, z_lo_r, z_mu_r, z_hi_r, act_r = (
        ref_r[0], ref_r[1], ref_r[2], ref_r[3], ref_r[4],
    )
    # ref-footprint validity is ANALYTIC: the resampler clamp-extends, so a
    # warped ones-channel is identically 1 and carries nothing — the warp's
    # own source coordinates say exactly which rect pixels sample inside
    # the reference image. Beyond saving a warp channel, this genuinely
    # masks the clamp-smeared out-of-footprint margins from sweeping (they
    # could previously inflate per-block plane ranges).
    valid_r = (
        (u_s >= 0.0) & (u_s <= width - 1.0)
        & (v_s >= 0.0) & (v_s <= height - 1.0)
    ).astype(jnp.float32)

    # exact per-row x-interval of the current-frame footprint in rect space
    # (replaces a warped validity image + per-plane box erosion)
    xlim = _footprint_xlim(
        g["H_curr_to_rect"], height, width, rect_h,
        reach=cfg.patch_side // 2 + 1.5, vrows=cfg.patch_side,
    )

    # --- per-pixel disparity bands ----------------------------------------
    # disparity u_ref - u_curr = sx * B / z; with fx > 0 (sx = +s) this is
    # positive for all depths, which the sweep assumes. The Bayesian band
    # and the reference's extent cap (epipolar_match.cu:73-75) intersect to
    # one interval per pixel, computed here so the sweep tests 2 bounds.
    fxB = jnp.abs(s) * B
    disp_lo = fxB / z_hi_r                    # far bound  -> small disparity
    disp_hi = fxB / z_lo_r                    # near bound -> large disparity
    disp_mu = fxB / z_mu_r
    half_len = 0.5 * jnp.minimum(disp_hi - disp_lo, cfg.max_epipolar_extent)
    disp_lo = jnp.maximum(disp_lo, disp_mu - half_len)
    disp_hi = jnp.minimum(disp_hi, disp_mu + half_len)

    # inactive rect pixels get an EMPTY disparity interval: the sweep's
    # band masks reject every plane, found stays 0 (so the found-masked
    # back-warp drops them), and the per-band k-range unions shrink to the
    # active seeds only. Any rect pixel with partial active support
    # (bilinear act_r in (0,1)) still sweeps, so active reference pixels
    # never lose blend weight.
    act = act_r > 1e-3
    disp_lo = jnp.where(act, disp_lo, jnp.inf)
    disp_hi = jnp.where(act, disp_hi, -jnp.inf)

    # Constant disparity rebasing: the K-plane window covers k in
    # [kbase, kbase + K) so large baselines stay searchable (the reference
    # centers its walk per pixel and has no absolute cap,
    # epipolar_match.cu:63-75). The shift folds into the current-frame
    # rectification warp as a pure x-translation — a translation composed
    # with a homography is still a homography. (A full affine-plane
    # rebasing variant was built and measured NEUTRAL on the eval scenes
    # at ~2.5% overhead — hulls there are set by wide-band stragglers no
    # global predictor narrows — and removed in round 4; see
    # docs/DESIGN.md.)
    if cfg.disp_rebase:
        lo_valid = jnp.where(valid_r > 0.999, disp_lo, jnp.inf)
        base_raw = jnp.floor(jnp.min(lo_valid)) - 1.0
        # true disparity is nonnegative
        kbase = jnp.where(
            jnp.isfinite(base_raw), jnp.maximum(base_raw, 0.0), 0.0
        )
    else:
        kbase = jnp.float32(0.0)
    k_lo = disp_lo - kbase
    k_hi = disp_hi - kbase

    # footprint interval in sweep coordinates: the kernel masks
    # x_src = x - k, and the true rect source column of hypothesis k at
    # (x, y) is (x - k) - kbase
    xlim = xlim + kbase

    z = jnp.zeros((), jnp.float32)
    o = jnp.ones((), jnp.float32)
    M_aff = jnp.stack(
        [
            jnp.stack([o, z, -kbase]),
            jnp.stack([z, o, z]),
            jnp.stack([z, z, o]),
        ]
    )
    # pad stays an exact-integer output-origin shift (x0), outside the
    # matrix product: buffer padding must be float-exactly neutral
    curr_img_r, _, _ = warp_ops.homography_warp(
        curr_img, H_rect_to_curr @ M_aff, rect_h, rect_w + 2 * pad,
        x0=-float(pad),
    )
    disp_lo, disp_hi = k_lo, k_hi

    # Hypotheses are the integer disparities 0..K-1 (masked per pixel by the
    # Bayesian bands); parabolic refinement recovers sub-pixel precision.
    # the fused sweep kernel handles any odd patch whose half-side fits
    # its 8-row halo (5x5 reference, 9x9 focal-scaled HD default, ...)
    from rpg_open_remode_tpu.ops import sweep_pallas as _sp

    pallas_ok = cfg.use_pallas and cfg.patch_side // 2 <= _sp.HALO and (
        jax.default_backend() != "cpu" or cfg.pallas_interpret
    )

    wide_needed = None
    pre_coarse_lo, pre_coarse_hi = disp_lo, disp_hi
    if cfg.coarse_to_fine:
        # only pay the coarse pass while wide bands cover a meaningful
        # fraction of the IMAGE (young keyframes). Not of the active set:
        # late in a keyframe the actives are dominated by unmatchable
        # stragglers (textureless/occluded) whose bands stay wide and whom
        # the coarse pass cannot place either — normalizing by actives
        # would keep paying for a pass that narrows nothing. And not a
        # global max: one re-diverged pixel would misfire forever.
        extent = disp_hi - disp_lo
        wide_n = jnp.isfinite(extent) & (
            extent > 2.0 * cfg.coarse_refine_radius + 2.0
        )
        # only young keyframes' broad wide fractions are worth the
        # extra pass
        wide_needed = jnp.mean(wide_n.astype(jnp.float32)) > 0.15
        narrow_fn, skip_fn = _coarse_branches(cfg, pallas_ok)
        disp_lo, disp_hi = jax.lax.cond(
            wide_needed, narrow_fn, skip_fn,
            curr_img_r, ref_img_r, valid_r, xlim, disp_lo, disp_hi,
        )

    return dict(
        g=g, curr_img_r=curr_img_r, ref_img_r=ref_img_r, valid_r=valid_r,
        xlim=xlim, disp_lo=disp_lo, disp_hi=disp_hi, kbase=kbase,
        pallas_ok=pallas_ok, wide_needed=wide_needed,
        pre_coarse_lo=pre_coarse_lo, pre_coarse_hi=pre_coarse_hi,
    )


def match_rectified(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    height, width = curr_img.shape
    K_planes = cfg.num_planes
    pad = cfg.disp_pad
    p = prepare_sweep(state, curr_img, T_curr_ref, cam, cfg)
    g = p["g"]
    curr_img_r, ref_img_r = p["curr_img_r"], p["ref_img_r"]
    valid_r, xlim = p["valid_r"], p["xlim"]
    disp_lo, disp_hi, kbase = p["disp_lo"], p["disp_hi"], p["kbase"]
    pallas_ok = p["pallas_ok"]

    if pallas_ok:
        from rpg_open_remode_tpu.ops import sweep_pallas

        disp_best, best, found_f = sweep_pallas.disparity_sweep(
            curr_img_r, xlim, ref_img_r, valid_r,
            disp_lo, disp_hi,
            cfg.ncc_threshold,
            K_planes, pad, cfg.patch_side, cfg.subplane_refine,
        )
        found_r = found_f > 0.5
    else:
        disp_best, best, found_r = _sweep_xla(
            curr_img_r, xlim, ref_img_r, valid_r,
            disp_lo, disp_hi, cfg,
        )

    # --- back-warp results to the reference grid ---------------------------
    # k-space -> true disparity: D = k + kbase (sentinel values for
    # not-found pixels are zeroed by the found mask below)
    disp_best = disp_best + kbase
    H_ref_to_rect = g["H_ref_to_rect"]
    H_rect_to_curr = g["H_rect_to_curr"]
    # found-masked blend: bilinear back-warp of raw disparity would mix the
    # -10 not-found sentinel into boundary pixels, admitting multi-pixel
    # errors; instead warp (disp*found, ncc*found, found) and renormalize,
    # so only found rect pixels contribute to a reference pixel's match
    found_f = found_r.astype(jnp.float32)
    out_stack = jnp.stack([disp_best * found_f, best * found_f, found_f])
    back, _, _ = warp_ops.homography_warp(out_stack, H_ref_to_rect, height, width)
    found_b = back[2]
    wgt = jnp.maximum(found_b, 1e-6)
    disp_b = back[0] / wgt
    ncc_b = back[1] / wgt

    # rect coords of every reference pixel (elementwise, no warp)
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    xr, yr = warp_ops.homography_coords(H_ref_to_rect, xx, yy)

    # match position in the current image: unrectify (x_r - disp, y_r)
    uc_r = xr - disp_b
    den_c = (
        H_rect_to_curr[2, 0] * uc_r + H_rect_to_curr[2, 1] * yr + H_rect_to_curr[2, 2]
    )
    den_c = jnp.where(jnp.abs(den_c) < 1e-8, 1e-8, den_c)
    u_c = (
        H_rect_to_curr[0, 0] * uc_r + H_rect_to_curr[0, 1] * yr + H_rect_to_curr[0, 2]
    ) / den_c
    v_c = (
        H_rect_to_curr[1, 0] * uc_r + H_rect_to_curr[1, 1] * yr + H_rect_to_curr[1, 2]
    ) / den_c

    # found_b > 0.5: a majority of the bilinear weight comes from rect
    # pixels that passed every sweep mask (band, extent, footprint
    # validity, texture); disp/ncc are renormalized over exactly those
    found = (found_b > 0.5) & (ncc_b >= cfg.ncc_threshold)
    # true ZNCC lies in [-1, 1]; float cancellation on near-degenerate
    # denominators can spill past it, so clamp the reported score
    return MatchResult(
        found=found, u=u_c, v=v_c, best_ncc=jnp.clip(ncc_b, -1.0, 1.0)
    )


def match_pure_rotation(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    """Degenerate (near-zero baseline) path: depth is unobservable, so match
    through the single infinite-plane homography H_inf = K R K^-1.  For
    identity motion this is an identity warp and every pixel self-matches
    (the reference's zero-baseline invariant, test/epipolar_test.cpp:206-220)."""
    height, width = curr_img.shape
    side = cfg.patch_side
    area = jnp.float32(cfg.patch_area)
    R = se3.rotation(T_curr_ref)
    H_inf, _ = warp_ops.infinite_homography(R, se3.translation(T_curr_ref), cam)
    # output grid = ref grid; source = curr image: H maps ref pixel -> curr
    # pixel, which is exactly H_inf.
    img, u, v = warp_ops.homography_warp(curr_img, H_inf, height, width)

    s_i = _box5(img, side)
    s_ii = _box5(img * img, side)
    s_it = _box5(img * state.ref_img, side)
    num = area * s_it - s_i * state.sum_templ
    den = (area * s_ii - s_i * s_i) * state.const_templ_denom
    ncc = num * jax.lax.rsqrt(jnp.maximum(den, _FLT_MIN))
    # in-footprint validity from the warp's own source coordinates (the
    # resampler clamp-extends, so a warped ones-channel is identically 1)
    vv = (
        (u >= 0.0) & (u <= width - 1.0) & (v >= 0.0) & (v <= height - 1.0)
    ).astype(jnp.float32)
    ok = _box5(vv, side) > (area - 0.5)
    m = jnp.float32(side)
    ok &= (u >= m) & (u < width - m) & (v >= m) & (v < height - m)
    found = ok & (ncc >= cfg.ncc_threshold)
    return MatchResult(found=found, u=u, v=v, best_ncc=jnp.where(ok, ncc, -1.0))


def match(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    """Rectified sweep with automatic fallbacks for the two motion regimes
    rectification cannot serve (the reference's walk handles any motion,
    epipolar_match.cu:63-96 — this dispatch restores that coverage):

      - near-zero baseline -> pure-rotation (infinite-homography) matcher
      - dominantly axial motion (an epipole inside/near either image
        footprint; rectified scanlines degenerate radially around it)
        -> inverse-depth plane sweep (ops/epipolar.match_planesweep)
    """
    height, width = curr_img.shape
    R = se3.rotation(T_curr_ref)
    t = se3.translation(T_curr_ref)
    C = -R.T @ t
    B = jnp.linalg.norm(C)
    threshold = 1e-5 * state.scene.avg_depth + 1e-9
    if not cfg.zero_baseline_fallback:
        return match_rectified(state, curr_img, T_curr_ref, cam, cfg)

    # epipole-in-footprint test, division-free: the ref-image epipole is
    # the projection of C, the curr-image epipole the projection of t;
    # |fx ex| < m_x |ez| iff the epipole x lies within ~1.5x the image
    # half-extent of the principal point
    m_x = 0.75 * width
    m_y = 0.75 * height

    def _inside(e):
        return (
            (jnp.abs(cam.fx * e[0]) < m_x * jnp.abs(e[2]))
            & (jnp.abs(cam.fy * e[1]) < m_y * jnp.abs(e[2]))
        )

    if cfg.forward_motion_fallback:
        epi_inside = _inside(C) | _inside(t)
        idx = jnp.where(B <= threshold, 0, jnp.where(epi_inside, 1, 2))
    else:
        idx = jnp.where(B <= threshold, 0, 2)
    # Branch functions must be STABLE objects (cached per cfg) with operands
    # passed explicitly: jax caches cond-branch traces by function identity,
    # and a freshly-created lambda/partial whose id gets reused after GC can
    # resurrect a stale trace with another call's captured values — the
    # "Execution supplied N buffers but compiled program expected M" failure.
    rect_fn, rot_fn, sweep_fn = _branches(cfg)
    return jax.lax.switch(
        idx, (rot_fn, sweep_fn, rect_fn), state, curr_img, T_curr_ref, cam
    )


@functools.lru_cache(maxsize=None)
def _branches(cfg: RemodeConfig):
    from rpg_open_remode_tpu.ops import epipolar as _epi

    return (
        functools.partial(match_rectified, cfg=cfg),
        functools.partial(match_pure_rotation, cfg=cfg),
        functools.partial(_epi.match_planesweep, cfg=cfg),
    )

"""Epipolar NCC stereo matching — the hot op of the framework.

The reference implements this as a per-thread variable-length walk along each
pixel's epipolar segment with hardware-bilinear texture taps
(``seedEpipolarMatchKernel``, src/epipolar_match.cu:37-140): up to ~143 steps
x 25 bilinear reads per pixel = billions of data-dependent gathers. That
design is hostile to TPUs (no texture unit, gathers serialize on the VPU), so
this module provides two implementations:

1. ``match_planesweep`` — the TPU-native redesign. Depth hypotheses are a
   *shared* set of K planes uniform in inverse depth (constant epipolar-image
   spacing). Each plane induces one coherent warp of the current frame onto
   the reference keyframe; the 5x5 ZNCC statistics then become three
   separable box filters per plane (pure VPU/conv work, one gather per plane
   instead of 25 per pixel per step). Each pixel masks the sweep to its own
   Bayesian search band [mu - 3 sigma, mu + 3 sigma] and to the reference's
   visibility and max-extent rules, and a 3-point parabolic fit over inverse
   depth recovers sub-plane precision (the analog of the reference's 0.7 px
   sub-stepping).

2. ``match_epipolar_walk`` — a pure-JAX transliteration of the reference
   semantics (fixed trip count + masking), kept as the always-on oracle for
   parity tests and as the ground truth the sweep is validated against.

Both return the same interface: per-pixel match found/coords, from which
``seed_update`` triangulates the depth measurement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SeedState
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.utils.interp import bilinear, box_sum

_FLT_MIN = jnp.float32(1.1754944e-38)  # matches FLT_MIN in epipolar_match.cu:129
_NEG = jnp.float32(-1e30)


class MatchResult(NamedTuple):
    found: jnp.ndarray    # bool [H, W]: best NCC >= threshold
    u: jnp.ndarray        # float [H, W] matched x coord in curr frame
    v: jnp.ndarray        # float [H, W] matched y coord in curr frame
    best_ncc: jnp.ndarray  # float [H, W]


def apply_match_to_conv(
    conv: jnp.ndarray, active: jnp.ndarray, found: jnp.ndarray
) -> jnp.ndarray:
    """Post-match state transition (epipolar_match.cu:131-139):
    active & found -> UPDATE, active & !found -> NO_MATCH, else unchanged."""
    return jnp.where(
        active,
        jnp.where(found, int(ConvergenceState.UPDATE), int(ConvergenceState.NO_MATCH)),
        conv,
    ).astype(jnp.int32)


def _search_band(state: SeedState, cfg: RemodeConfig):
    """Per-pixel depth search band [d_lo, d_hi] (epipolar_match.cu:63-71)."""
    sigma = jnp.sqrt(state.sigma_sq)
    d_lo = jnp.maximum(state.mu - cfg.sigma_band * sigma, cfg.min_search_depth)
    d_hi = state.mu + cfg.sigma_band * sigma
    return d_lo, d_hi


def _project_depth(Rf, t, d, cam):
    """Project the point at along-ray depth ``d`` on bearing field ``Rf``
    (already rotated into the current frame). Returns (u, v, z)."""
    px = Rf[0] * d + t[0]
    py = Rf[1] * d + t[1]
    pz = Rf[2] * d + t[2]
    return cam.fx * px / pz + cam.cx, cam.fy * py / pz + cam.cy, pz


# ---------------------------------------------------------------------------
# TPU-native plane sweep
# ---------------------------------------------------------------------------


def match_planesweep(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    height, width = curr_img.shape
    area = jnp.float32(cfg.patch_area)
    K = cfg.num_planes

    R = se3.rotation(T_curr_ref)
    t = se3.translation(T_curr_ref)
    Rf = jnp.einsum("ij,jhw->ihw", R, state.f_ref)  # bearings in curr frame

    # Global plane set: uniform in inverse depth over the (expanded) scene
    # range. Expansion lets seeds whose posterior drifted outside the initial
    # range still find matches.
    scene = state.scene
    d_min = jnp.maximum(scene.min_depth / 1.3, cfg.min_search_depth)
    d_max = scene.max_depth * 1.3
    inv_hi = 1.0 / d_min
    inv_lo = 1.0 / d_max
    inv_step = (inv_hi - inv_lo) / (K - 1)

    # Per-pixel band + extent cap, all from three cheap point projections
    # (replaces the reference's per-pixel segment setup, epipolar_match.cu:63-88)
    d_lo, d_hi = _search_band(state, cfg)
    u_mu, v_mu, _ = _project_depth(Rf, t, state.mu, cam)
    u_a, v_a, _ = _project_depth(Rf, t, d_lo, cam)
    u_b, v_b, _ = _project_depth(Rf, t, d_hi, cam)
    seg_len = jnp.sqrt((u_b - u_a) ** 2 + (v_b - v_a) ** 2)
    half_length = 0.5 * jnp.minimum(seg_len, cfg.max_epipolar_extent)

    sum_templ = state.sum_templ
    denom_t = state.const_templ_denom
    ref = state.ref_img
    m = jnp.float32(cfg.patch_side)

    def ncc_at_plane(d):
        """ZNCC score field for one depth hypothesis + its validity mask."""
        u, v, z = _project_depth(Rf, t, d, cam)
        warped = bilinear(curr_img, u, v)
        s_i = box_sum(warped, cfg.patch_side, cfg.patch_offset)
        s_ii = box_sum(warped * warped, cfg.patch_side, cfg.patch_offset)
        s_it = box_sum(warped * ref, cfg.patch_side, cfg.patch_offset)
        num = area * s_it - s_i * sum_templ
        den = (area * s_ii - s_i * s_i) * denom_t
        ncc = num * jax.lax.rsqrt(den + _FLT_MIN)
        # Reference bounds check per step (epipolar_match.cu:89-96) + behind-
        # camera + band + extent masks.
        visible = (u >= m) & (u < width - m) & (v >= m) & (v < height - m) & (z > 0)
        in_band = (d >= d_lo) & (d <= d_hi)
        dist = jnp.sqrt((u - u_mu) ** 2 + (v - v_mu) ** 2)
        ok = visible & in_band & (dist <= half_length)
        return jnp.where(ok, ncc, _NEG), u, v

    def body(k, carry):
        best, best_k, left, right, prev = carry
        d = 1.0 / (inv_lo + inv_step * k)
        ncc, _, _ = ncc_at_plane(d)
        improved = ncc > best
        right = jnp.where(best_k == k - 1, ncc, right)  # neighbor of old best
        left = jnp.where(improved, prev, left)
        right = jnp.where(improved, _NEG, right)
        best_k = jnp.where(improved, k, best_k)
        best = jnp.where(improved, ncc, best)
        return best, best_k, left, right, ncc

    shape = (height, width)
    init = (
        jnp.full(shape, -1.0, jnp.float32),           # best_ncc starts at -1
        jnp.full(shape, -10, jnp.int32),
        jnp.full(shape, _NEG, jnp.float32),
        jnp.full(shape, _NEG, jnp.float32),
        jnp.full(shape, _NEG, jnp.float32),
    )
    best, best_k, left, right, _ = jax.lax.fori_loop(0, K, body, init)

    # Sub-plane parabolic refinement in inverse depth (analog of the 0.7 px
    # image-space sub-stepping of the reference walk).
    kf = best_k.astype(jnp.float32)
    if cfg.subplane_refine:
        have_nbrs = (left > _NEG * 0.5) & (right > _NEG * 0.5)
        denom = left - 2.0 * best + right
        delta = jnp.where(
            have_nbrs & (jnp.abs(denom) > 1e-12),
            0.5 * (left - right) / denom,
            0.0,
        )
        kf = kf + jnp.clip(delta, -0.5, 0.5)

    d_best = 1.0 / (inv_lo + inv_step * kf)
    u_best, v_best, _ = _project_depth(Rf, t, d_best, cam)

    found = (best >= cfg.ncc_threshold) & (best_k >= 0)
    return MatchResult(found=found, u=u_best, v=v_best, best_ncc=best)


# ---------------------------------------------------------------------------
# Reference-semantics epipolar walk (oracle)
# ---------------------------------------------------------------------------


def _patch_offsets(cfg: RemodeConfig):
    off = cfg.patch_offset
    d = jnp.arange(cfg.patch_side, dtype=jnp.float32) + off
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    return dx.reshape(-1), dy.reshape(-1)  # [P]


def match_epipolar_walk(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    """Exact reference semantics (epipolar_match.cu:37-140) as a fixed-trip
    masked loop. Gather-bound: use for parity tests and small images."""
    height, width = curr_img.shape
    area = jnp.float32(cfg.patch_area)

    R = se3.rotation(T_curr_ref)
    t = se3.translation(T_curr_ref)
    Rf = jnp.einsum("ij,jhw->ihw", R, state.f_ref)

    d_lo, d_hi = _search_band(state, cfg)
    u_mean, v_mean, _ = _project_depth(Rf, t, state.mu, cam)
    u_min, v_min, _ = _project_depth(Rf, t, d_lo, cam)
    u_max, v_max, _ = _project_depth(Rf, t, d_hi, cam)

    eu = u_max - u_min
    ev = v_max - v_min
    norm_e = jnp.sqrt(eu * eu + ev * ev)
    dir_u = eu / norm_e
    dir_v = ev / norm_e
    half_length = 0.5 * jnp.minimum(norm_e, cfg.max_epipolar_extent)

    # Per-pixel ref template patches, gathered once: [H, W, P]
    dx, dy = _patch_offsets(cfg)
    yy, xx = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    ref_patch = bilinear(
        state.ref_img, xx[..., None] + dx, yy[..., None] + dy
    )  # integer offsets -> exact reads (clamped)
    sum_templ = state.sum_templ
    denom_t = state.const_templ_denom
    mlo = jnp.float32(cfg.patch_side)

    n_steps = cfg.max_walk_steps
    step = jnp.float32(cfg.epi_step_px)

    def body(k, carry):
        best, bu, bv = carry
        l = -half_length + step * k
        u_c = u_mean + l * dir_u
        v_c = v_mean + l * dir_v
        in_seg = l <= half_length
        in_img = (u_c >= mlo) & (u_c < width - mlo) & (v_c >= mlo) & (v_c < height - mlo)
        img_patch = bilinear(curr_img, u_c[..., None] + dx, v_c[..., None] + dy)
        s_i = jnp.sum(img_patch, axis=-1)
        s_ii = jnp.sum(img_patch * img_patch, axis=-1)
        s_it = jnp.sum(img_patch * ref_patch, axis=-1)
        num = area * s_it - s_i * sum_templ
        den = (area * s_ii - s_i * s_i) * denom_t
        ncc = num * jax.lax.rsqrt(den + _FLT_MIN)
        ncc = jnp.where(in_seg & in_img, ncc, _NEG)
        improved = ncc > best
        return (
            jnp.where(improved, ncc, best),
            jnp.where(improved, u_c, bu),
            jnp.where(improved, v_c, bv),
        )

    shape = (height, width)
    init = (
        jnp.full(shape, -1.0, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    best, bu, bv = jax.lax.fori_loop(0, n_steps, body, init)
    found = best >= cfg.ncc_threshold
    return MatchResult(found=found, u=bu, v=bv, best_ncc=best)


def match(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    if cfg.match_mode == "walk":
        return match_epipolar_walk(state, curr_img, T_curr_ref, cam, cfg)
    return match_planesweep(state, curr_img, T_curr_ref, cam, cfg)

"""Epipolar NCC stereo matching — dispatch + the two reference-shaped paths.

The reference implements this as a per-thread variable-length walk along each
pixel's epipolar segment with hardware-bilinear texture taps
(``seedEpipolarMatchKernel``, src/epipolar_match.cu:37-140): up to ~143 steps
x 25 bilinear reads per pixel = billions of data-dependent gathers. That
design is hostile to TPUs (no texture unit; gathers serialize), so the
framework offers three matchers behind ``match()``:

1. ``rect`` (default, ops/rect_match.py) — the TPU-native hot path:
   per-frame stereo rectification turns every depth hypothesis into a
   uniform horizontal shift; fused Pallas kernels run the sweep and warps.

2. ``match_planesweep`` (this module) — an earlier TPU formulation kept for
   the spatially-tiled shard_map path and as a second oracle: K shared
   inverse-depth hypotheses, each one coherent warp of the current frame
   onto the reference grid + separable ZNCC box filters, masked per pixel
   by the Bayesian band and the reference's visibility/extent rules.

3. ``match_epipolar_walk`` — a pure-JAX transliteration of the reference
   semantics (fixed trip count + masking): the ground-truth oracle the fast
   paths are validated against.

All return the same interface: per-pixel match found/coords, from which
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
from rpg_open_remode_tpu.utils.interp import bilinear

# Plain Python floats: module-level jnp scalars would initialize the jax
# backend at import time (breaking later platform overrides) and, if the
# module were first imported inside a trace, leak as tracers.
_FLT_MIN = 1.1754944e-38  # matches FLT_MIN in epipolar_match.cu:129
_NEG = -1e30


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


def plane_set(scene, cfg: RemodeConfig):
    """Shared inverse-depth plane parameterization: d_k = 1/(inv_lo + k*step).

    Uniform inverse depth == uniform epipolar image-space spacing. The range
    is the scene range expanded by 1.3x so seeds whose posterior drifted
    outside the initial range still find matches.
    """
    d_min = jnp.maximum(scene.min_depth / 1.3, cfg.min_search_depth)
    d_max = scene.max_depth * 1.3
    inv_hi = 1.0 / d_min
    inv_lo = 1.0 / d_max
    inv_step = (inv_hi - inv_lo) / (cfg.num_planes - 1)
    return inv_lo, inv_step


def match_planesweep_tile(
    ref_ext: jnp.ndarray,      # [h+2p, w+2p] ref image incl. p-px halo
    f_ext: jnp.ndarray,        # [3, h+2p, w+2p] bearings on the extended grid
    mu: jnp.ndarray,           # [h, w] tile seed means
    sigma_sq: jnp.ndarray,     # [h, w]
    sum_templ: jnp.ndarray,    # [h, w]
    const_templ_denom: jnp.ndarray,  # [h, w]
    scene,
    curr_img: jnp.ndarray,     # FULL current image (replicated per device)
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    """Plane sweep over one (possibly sharded) tile of the seed state.

    The warp depends only on pixel bearings and the global plane depth — not
    on per-pixel seed state — so a tile only needs its own bearings extended
    by the patch radius ``p``; box sums are then exact 'valid' windowed sums.
    The single-device path is the trivial tile: the whole image with
    edge-replicated (clamped) halo.
    """
    height, width = curr_img.shape
    area = jnp.float32(cfg.patch_area)
    K = cfg.num_planes
    p = cfg.patch_side // 2
    side = cfg.patch_side

    R = se3.rotation(T_curr_ref)
    t = se3.translation(T_curr_ref)
    Rf_ext = jnp.einsum("ij,jhw->ihw", R, f_ext)
    Rf = Rf_ext[:, p:-p, p:-p]  # tile-center bearings

    inv_lo, inv_step = plane_set(scene, cfg)

    # Per-pixel band + extent cap from three cheap point projections
    # (replaces the per-pixel segment setup of epipolar_match.cu:63-88)
    sigma = jnp.sqrt(sigma_sq)
    d_lo = jnp.maximum(mu - cfg.sigma_band * sigma, cfg.min_search_depth)
    d_hi = mu + cfg.sigma_band * sigma
    u_mu, v_mu, _ = _project_depth(Rf, t, mu, cam)
    u_a, v_a, _ = _project_depth(Rf, t, d_lo, cam)
    u_b, v_b, _ = _project_depth(Rf, t, d_hi, cam)
    seg_len = jnp.sqrt((u_b - u_a) ** 2 + (v_b - v_a) ** 2)
    half_length = 0.5 * jnp.minimum(seg_len, cfg.max_epipolar_extent)

    m = jnp.float32(cfg.patch_side)

    def valid_box(x):
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, side), (1, 1), "valid")
        return jax.lax.reduce_window(s, 0.0, jax.lax.add, (side, 1), (1, 1), "valid")

    def ncc_at_plane(d):
        """ZNCC score field for one depth hypothesis + its validity mask."""
        ue, ve, _ = _project_depth(Rf_ext, t, d, cam)
        warped = bilinear(curr_img, ue, ve)
        s_i = valid_box(warped)
        s_ii = valid_box(warped * warped)
        s_it = valid_box(warped * ref_ext)
        num = area * s_it - s_i * sum_templ
        den = (area * s_ii - s_i * s_i) * const_templ_denom
        ncc = num * jax.lax.rsqrt(den + _FLT_MIN)
        # Reference bounds check per step (epipolar_match.cu:89-96) + behind-
        # camera + band + extent masks, at the tile-center coordinates.
        u = ue[p:-p, p:-p]
        v = ve[p:-p, p:-p]
        z = Rf[2] * d + t[2]
        visible = (u >= m) & (u < width - m) & (v >= m) & (v < height - m) & (z > 0)
        in_band = (d >= d_lo) & (d <= d_hi)
        dist = jnp.sqrt((u - u_mu) ** 2 + (v - v_mu) ** 2)
        ok = visible & in_band & (dist <= half_length)
        return jnp.where(ok, ncc, _NEG)

    def body(k, carry):
        best, best_k, left, right, prev = carry
        d = 1.0 / (inv_lo + inv_step * k)
        ncc = ncc_at_plane(d)
        improved = ncc > best
        right = jnp.where(best_k == k - 1, ncc, right)  # neighbor of old best
        left = jnp.where(improved, prev, left)
        right = jnp.where(improved, _NEG, right)
        best_k = jnp.where(improved, k, best_k)
        best = jnp.where(improved, ncc, best)
        return best, best_k, left, right, ncc

    # init derived from `mu` (full_like) so the carry inherits its sharding
    # varying-axes type under shard_map
    init = (
        jnp.full_like(mu, -1.0),                      # best_ncc starts at -1
        jnp.full_like(mu, -10, dtype=jnp.int32),
        jnp.full_like(mu, _NEG),
        jnp.full_like(mu, _NEG),
        jnp.full_like(mu, _NEG),
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


def extend_with_clamp(img: jnp.ndarray, p: int) -> jnp.ndarray:
    """Edge-replicate halo == CUDA clamp-addressed texture semantics."""
    return jnp.pad(img, ((p, p), (p, p)), mode="edge")


def bearings_for_grid(cam: PinholeCamera, ys: jnp.ndarray, xs: jnp.ndarray):
    """Normalized bearings for arbitrary (possibly clamped/offset) pixel
    coordinate vectors — channel-first [3, len(ys), len(xs)]."""
    v, u = jnp.meshgrid(ys.astype(jnp.float32), xs.astype(jnp.float32), indexing="ij")
    f = cam.cam2world(u, v)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    return jnp.moveaxis(f, -1, 0)


def match_planesweep(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_ref: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
) -> MatchResult:
    """Single-device sweep = the tile core on the whole image with a clamped
    halo (bearings at clamped coordinates reproduce texture-clamp reads)."""
    height, width = curr_img.shape
    p = cfg.patch_side // 2
    ys = jnp.clip(jnp.arange(-p, height + p), 0, height - 1)
    xs = jnp.clip(jnp.arange(-p, width + p), 0, width - 1)
    f_ext = bearings_for_grid(cam, ys, xs)
    ref_ext = extend_with_clamp(state.ref_img, p)
    return match_planesweep_tile(
        ref_ext,
        f_ext,
        state.mu,
        state.sigma_sq,
        state.sum_templ,
        state.const_templ_denom,
        state.scene,
        curr_img,
        T_curr_ref,
        cam,
        cfg,
    )


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
    if cfg.match_mode == "sweep":
        return match_planesweep(state, curr_img, T_curr_ref, cam, cfg)
    return _rect_match.match(state, curr_img, T_curr_ref, cam, cfg)


# Imported at module scope (bottom to avoid a cycle): rect_match must never
# be first-imported inside a jit trace, or its module-level state would be
# created under the trace and leak tracers into later computations.
from rpg_open_remode_tpu.ops import rect_match as _rect_match  # noqa: E402

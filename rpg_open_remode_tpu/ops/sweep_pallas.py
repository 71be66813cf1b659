"""Pallas TPU kernel for the rectified disparity sweep.

This is the hot loop of the whole framework — the TPU-native replacement for
the reference's per-pixel epipolar walk (``seedEpipolarMatchKernel``,
src/epipolar_match.cu:37-140).  The XLA formulation in ``rect_match`` streams
~25 rect-grid arrays through HBM per disparity hypothesis; this kernel
processes the rect grid in row bands: each band DMAs its inputs (plus a
stencil halo) from HBM once, runs the *entire* K-plane sweep out of VMEM,
and writes three result maps at the end.

Key TPU moves:
  - disparity hypotheses are **integers** (the classic cost-volume trick:
    integer shifts + 3-point parabolic sub-pixel refinement, standing in for
    the reference's 0.7-px walk steps), so every shifted window is a static
    lane slice in a fully unrolled loop — no data-dependent addressing at
    all;
  - the horizontal half of the separable 5x5 box sums of curr and curr^2
    commutes with integer shifts, so it is hoisted out of the plane loop;
  - current-footprint validity is *exact* as a per-row x-interval (a convex
    quad intersects a scanline in an interval): two compares instead of a
    warped validity image + box erosion;
  - box sums are pure roll-and-add with no edge masking: wraparound
    pollution only lands on pixels the eroded reference-footprint mask
    already rejects (and on reference-image border pixels that seed_check
    marks BORDER).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FLT_MIN = 1.1754944e-38
_NEG = -1e30

BAND = 64      # rows per grid step
HALO = 8       # stencil halo; 2 rows suffice but sublane slices must be 8-aligned
GROUP = 16     # planes per statically-unrolled group (see kernel docstring)


def _box5_x(x):
    w = x.shape[1]
    return (
        x
        + pltpu.roll(x, 1, axis=1)
        + pltpu.roll(x, w - 1, axis=1)
        + pltpu.roll(x, 2, axis=1)
        + pltpu.roll(x, w - 2, axis=1)
    )


def _band_matrix(h):
    """5-diagonal banded [h, h] matrix: the vertical box sum as one MXU
    matmul (2x faster than sublane rolls in the sweep loop; zero rows at
    the buffer edge only touch discarded halo outputs)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    return (jnp.abs(ii - jj) <= 2).astype(jnp.float32)


def _box5_y(x, bm):
    return jnp.dot(bm, x, preferred_element_type=jnp.float32)


def _box5(x, bm):
    return _box5_y(_box5_x(x), bm)


def _sweep_kernel(
    krange_ref,    # SMEM prefetch [n_bands * 2]: per-band active plane range
    curr_hbm,      # ANY [rect_h + 2*HALO, rect_w + 2*pad]
    ref_hbm,       # ANY [rect_h + 2*HALO, rect_w]
    valid_hbm,
    dlo_hbm,
    dhi_hbm,
    xlim_hbm,      # ANY [rect_h + 2*HALO, 128]: cols 0/1 = eroded x-interval
    disp_out,      # VMEM [BAND, rect_w]
    ncc_out,
    found_out,
    curr_s,        # scratch VMEM [BAND + 2*HALO, rect_w + 2*pad]
    xb_c_s,        # scratch: x-boxed curr
    xb_cc_s,       # scratch: x-boxed curr^2
    ref_s,         # scratch VMEM [BAND + 2*HALO, rect_w]
    valid_s,
    dlo_s,
    dhi_s,
    xlim_s,        # scratch VMEM [BAND + 2*HALO, 128]
    best_s,
    bk_s,
    left_s,
    right_s,
    prev_s,
    sems,          # DMA semaphores (6,)
    *,
    num_planes: int,
    rect_w: int,
    pad: int,
    patch_area: float,
    ncc_threshold: float,
    subplane_refine: bool,
):
    i = pl.program_id(0)
    row0 = i * BAND
    rows = BAND + 2 * HALO

    copies = [
        pltpu.make_async_copy(src.at[pl.ds(row0, rows)], dst, sems.at[j])
        for j, (src, dst) in enumerate(
            [
                (curr_hbm, curr_s),
                (ref_hbm, ref_s),
                (valid_hbm, valid_s),
                (dlo_hbm, dlo_s),
                (dhi_hbm, dhi_s),
                (xlim_hbm, xlim_s),
            ]
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    area = jnp.float32(patch_area)
    ref_img = ref_s[:]
    bm = _band_matrix(rows)

    # template stats on the rect grid (seed_init.cu:38-54 semantics)
    sum_t = _box5(ref_img, bm)
    denom_t = area * _box5(ref_img * ref_img, bm) - sum_t * sum_t
    vref = (valid_s[:] > 0.999).astype(jnp.float32)
    ref_ok = (_box5(vref, bm) > (area - 0.5)) & (denom_t > 1e-10)
    inv_denom_t = jax.lax.rsqrt(jnp.maximum(denom_t, _FLT_MIN))

    # the x-half of the curr/curr^2 box sums commutes with integer shifts:
    # compute once on the wide buffer, slice per plane
    curr0 = curr_s[:]
    xb_c_s[:] = _box5_x(curr0)
    xb_cc_s[:] = _box5_x(curr0 * curr0)

    dlo = dlo_s[:] - 0.5   # half-plane slack: a band narrower than one
    dhi = dhi_s[:] + 0.5   # integer step must still see one hypothesis
                           # (the extent cap is folded into the bounds)

    xcoord = jax.lax.broadcasted_iota(jnp.int32, (rows, rect_w), 1).astype(jnp.float32)
    xmin_e = xlim_s[:, 0:1]
    xmax_e = xlim_s[:, 1:2]

    neg = jnp.float32(_NEG)
    best_s[:] = jnp.full((rows, rect_w), -1.0, jnp.float32)
    bk_s[:] = jnp.full((rows, rect_w), -10.0, jnp.float32)
    left_s[:] = jnp.full((rows, rect_w), neg, jnp.float32)
    right_s[:] = jnp.full((rows, rect_w), neg, jnp.float32)
    prev_s[:] = jnp.full((rows, rect_w), neg, jnp.float32)

    # Grouped sweep: an outer fori_loop over plane groups keeps compile time
    # and Mosaic's VMEM value-stack bounded (a fully unrolled 127-plane body
    # blows both), while the inner GROUP bodies keep every lane slice
    # STATIC. Between groups the working curr buffers are rolled right by
    # GROUP lanes, so group o's plane k' reads window [pad - k', ...] of a
    # buffer holding curr shifted by o*GROUP — i.e. disparity o*GROUP + k'.
    # No window ever touches wrapped lanes: source index pad - delta >= 2
    # and rolled index source + o*GROUP < wide for all delta <= pad - 2.
    n_groups = -(-num_planes // GROUP)
    k_lo = krange_ref[2 * i]
    k_hi = krange_ref[2 * i + 1]

    def group(o, _):
        base = o.astype(jnp.float32) * GROUP

        # band-adaptive skipping (the reference's per-thread early exit,
        # reshaped for SIMD): plane groups entirely outside this band's
        # disparity range contribute nothing — skip their bodies, keep the
        # buffer advance
        @pl.when((o * GROUP <= k_hi) & (o * GROUP + GROUP - 1 >= k_lo))
        def _():
            _group_body(base)

        curr_s[:] = pltpu.roll(curr_s[:], GROUP, axis=1)
        xb_c_s[:] = pltpu.roll(xb_c_s[:], GROUP, axis=1)
        xb_cc_s[:] = pltpu.roll(xb_cc_s[:], GROUP, axis=1)
        return 0

    def _group_body(base):
        curr = curr_s[:]
        for kp in range(GROUP):
            delta = base + kp
            lo = pad - kp
            img = curr[:, lo : lo + rect_w]
            s_i = _box5_y(xb_c_s[:, lo : lo + rect_w], bm)
            s_ii = _box5_y(xb_cc_s[:, lo : lo + rect_w], bm)
            s_it = _box5(img * ref_img, bm)

            num = area * s_it - s_i * sum_t
            den_l = area * s_ii - s_i * s_i
            ncc = num * jax.lax.rsqrt(jnp.maximum(den_l, _FLT_MIN)) * inv_denom_t
            x_src = xcoord - delta
            ok = (
                ref_ok
                & (den_l > 1e-10)   # textureless curr patch: the exact num
                                    # cancels to 0 but float residue / tiny
                                    # denominator can fake a high NCC
                & (x_src >= xmin_e)
                & (x_src <= xmax_e)
                & (delta >= dlo)
                & (delta <= dhi)
                & (delta <= jnp.float32(num_planes - 1))
            )
            ncc = jnp.where(ok, ncc, neg)

            best = best_s[:]
            bk = bk_s[:]
            improved = ncc > best
            right_s[:] = jnp.where(
                improved, neg, jnp.where(bk == delta - 1.0, ncc, right_s[:])
            )
            left_s[:] = jnp.where(improved, prev_s[:], left_s[:])
            bk_s[:] = jnp.where(improved, delta, bk)
            best_s[:] = jnp.where(improved, ncc, best)
            prev_s[:] = ncc

    jax.lax.fori_loop(0, n_groups, group, 0)

    best = best_s[:]
    bk = bk_s[:]
    kf = bk
    if subplane_refine:
        left = left_s[:]
        right = right_s[:]
        have = (left > 0.5 * neg) & (right > 0.5 * neg)
        den = left - 2.0 * best + right
        frac = jnp.where(
            have & (jnp.abs(den) > 1e-12), 0.5 * (left - right) / den, 0.0
        )
        kf = kf + jnp.clip(frac, -0.5, 0.5)

    disp_out[:] = kf[HALO : HALO + BAND, :]
    ncc_out[:] = best[HALO : HALO + BAND, :]
    found_out[:] = (
        (best >= jnp.float32(ncc_threshold)) & (bk >= 0.0)
    ).astype(jnp.float32)[HALO : HALO + BAND, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_planes", "pad", "patch_area", "ncc_threshold",
        "subplane_refine",
    ),
)
def disparity_sweep(
    curr_pad: jnp.ndarray,    # [rect_h, rect_w + 2*pad]
    xlim: jnp.ndarray,        # [rect_h, 2]: eroded curr-footprint x-interval
    ref_img: jnp.ndarray,     # [rect_h, rect_w]
    valid: jnp.ndarray,
    disp_lo: jnp.ndarray,
    disp_hi: jnp.ndarray,
    ncc_threshold: float,
    num_planes: int,
    pad: int,
    patch_area: float,
    subplane_refine: bool,
):
    """Run the fused integer-disparity sweep. Returns (disp_best, best_ncc,
    found) on the rect grid. ``rect_h`` must be a multiple of BAND."""
    rect_h, rect_w = ref_img.shape
    assert rect_h % BAND == 0, rect_h
    n_bands = rect_h // BAND
    # plane k reads window [pad - k, pad - k + rect_w) of the padded buffer
    # and the hoisted x-box sums roll +-2 lanes, so pad - (num_planes-1) >= 2
    assert num_planes <= pad - 1, (num_planes, pad)

    def zpad(x, fill=0.0):
        z = jnp.full((HALO, x.shape[1]), fill, x.dtype)
        return jnp.concatenate([z, x, z], axis=0)

    # per-band active plane interval (for group skipping): the union of the
    # per-pixel disparity bands over valid pixels, padded by the half-plane
    # slack and the band halo rows
    valid_mask = valid > 0.999
    lo_rows = jnp.where(valid_mask, disp_lo, jnp.inf).reshape(n_bands, BAND, -1)
    hi_rows = jnp.where(valid_mask, disp_hi, -jnp.inf).reshape(n_bands, BAND, -1)
    k_lo_b = jnp.floor(jnp.min(lo_rows, axis=(1, 2)) - 1.0)
    k_hi_b = jnp.ceil(jnp.max(hi_rows, axis=(1, 2)) + 1.0)
    # halo rows of neighbor bands participate in a band's stencils
    k_lo_b = jnp.minimum(k_lo_b, jnp.roll(k_lo_b, 1))
    k_lo_b = jnp.minimum(k_lo_b, jnp.roll(k_lo_b, -1))
    k_hi_b = jnp.maximum(k_hi_b, jnp.roll(k_hi_b, 1))
    k_hi_b = jnp.maximum(k_hi_b, jnp.roll(k_hi_b, -1))
    k_lo_b = jnp.where(jnp.isfinite(k_lo_b), k_lo_b, jnp.float32(num_planes))
    k_hi_b = jnp.where(jnp.isfinite(k_hi_b), k_hi_b, -1.0)
    krange = jnp.stack(
        [
            jnp.clip(k_lo_b, 0, num_planes - 1),
            jnp.clip(k_hi_b, -1, num_planes - 1),
        ],
        axis=1,
    ).astype(jnp.int32).reshape(-1)

    # [rect_h, 2] -> lane-tiled [rect_h, 128] (cols 0/1 hold the bounds)
    xlim_t = jnp.pad(xlim.astype(jnp.float32), ((0, 0), (0, 126)))

    kernel = functools.partial(
        _sweep_kernel,
        num_planes=num_planes,
        rect_w=rect_w,
        pad=pad,
        patch_area=patch_area,
        ncc_threshold=ncc_threshold,
        subplane_refine=subplane_refine,
    )
    wide = rect_w + 2 * pad
    rows = BAND + 2 * HALO
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[
            pl.BlockSpec(
                (BAND, rect_w), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BAND, rect_w), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BAND, rect_w), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, wide), jnp.float32),
            pltpu.VMEM((rows, wide), jnp.float32),
            pltpu.VMEM((rows, wide), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.VMEM((rows, rect_w), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    # under shard_map, outputs must carry the varying-mesh-axes set of the
    # per-device computation; inherit it from an input
    try:
        vma = jax.typeof(ref_img).vma
        out_sds = jax.ShapeDtypeStruct((rect_h, rect_w), jnp.float32, vma=vma)
    except (AttributeError, TypeError):
        out_sds = jax.ShapeDtypeStruct((rect_h, rect_w), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_sds, out_sds, out_sds],
        interpret=jax.default_backend() == "cpu",
    )(
        krange,
        zpad(curr_pad),
        zpad(ref_img),
        zpad(valid),
        zpad(disp_lo),
        zpad(disp_hi),
        zpad(xlim_t, fill=-1.0),
    )
    return out[0], out[1], out[2]

"""Pallas TPU kernel for the rectified disparity sweep.

This is the hot loop of the whole framework — the TPU-native replacement for
the reference's per-pixel epipolar walk (``seedEpipolarMatchKernel``,
src/epipolar_match.cu:37-140).  The XLA formulation in ``rect_match`` streams
~25 rect-grid arrays through HBM per disparity hypothesis; this kernel
processes the rect grid in (row-band, column-tile) blocks: each block DMAs
its inputs (plus stencil halos) from HBM once, runs its *own* slice of the
K-plane sweep out of VMEM, and writes three result maps at the end.

Key TPU moves:
  - disparity hypotheses are **integers** (the classic cost-volume trick:
    integer shifts + 3-point parabolic sub-pixel refinement, standing in for
    the reference's 0.7-px walk steps), so every shifted window is a static
    lane slice — no data-dependent addressing at all;
  - the grid is two-dimensional, (row band) x (128-lane column tile), and a
    scalar-prefetched per-block plane interval bounds a *dynamic* fori_loop
    over plane groups. Steady-state seeds have narrow Bayesian bands, so a
    64x128 block typically sweeps a handful of plane groups instead of the
    full K — this is the SIMD reshape of the reference's per-thread early
    exit, at block rather than thread granularity. Block-local static slice
    offsets are maintained by rolling the current-image window right by
    GROUP lanes per executed group (plus one dynamic pre-roll to the first
    group), so plane k's window is always the same static slice;
  - the horizontal half of the separable 5x5 box sums of curr and curr^2
    commutes with integer shifts, so it is hoisted per plane *group*;
  - current-footprint validity is *exact* as a per-row x-interval (a convex
    quad intersects a scanline in an interval): two compares instead of a
    warped validity image + box erosion;
  - box sums are pure slice-and-add with no edge masking: the tile windows
    carry real ±2-column halos from the padded HBM layouts, so tile seams
    are exact, and image-edge halos read zeros (matching the XLA oracle's
    zero-padded box sums).
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
TILE = 128     # columns per grid step (one lane register)
HALO = 8       # stencil halo; 2 rows suffice but sublane slices must be 8-aligned
EXT = 128      # column extension of the HBM windows (DMA starts must be
               # 128-aligned, and the curr window needs left headroom for
               # the group rolls)
GROUP = 8      # planes per statically-unrolled group


def _band_matrix(h):
    """5-diagonal banded [h, h] matrix: the vertical box sum as one MXU
    matmul (2x faster than sublane rolls in the sweep loop; zero rows at
    the buffer edge only touch discarded halo outputs)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    return (jnp.abs(ii - jj) <= 2).astype(jnp.float32)


def _box5_y(x, bm):
    return jnp.dot(bm, x, preferred_element_type=jnp.float32)


def _box5_x_win(w, out_w):
    """Horizontal 5-tap box sum of a window carrying a ±2-column halo:
    out[:, t] = sum(w[:, t:t+5]). Addition order matches the roll-based
    formulation (center, -1, +1, -2, +2) for bitwise stability."""
    return (
        w[:, 2 : 2 + out_w]
        + w[:, 1 : 1 + out_w]
        + w[:, 3 : 3 + out_w]
        + w[:, 0 : 0 + out_w]
        + w[:, 4 : 4 + out_w]
    )


def _sweep_kernel(
    krange_ref,    # SMEM prefetch [n_bands * n_tiles * 2]: per-block planes
    curr_hbm,      # ANY [rect_h + 2*HALO, EXT + rect_w + 2*pad]
    ref_hbm,       # ANY [rect_h + 2*HALO, rect_w + 2*EXT]
    valid_hbm,
    dlo_hbm,       # ANY [rect_h + 2*HALO, rect_w]
    dhi_hbm,
    xlim_hbm,      # ANY [rect_h + 2*HALO, 128]: cols 0/1 = eroded x-interval
    disp_out,      # VMEM [BAND, TILE]
    ncc_out,
    found_out,
    curr_s,        # scratch VMEM [rows, wd]
    ref_s,         # scratch VMEM [rows, TILE + 2*EXT]
    valid_s,
    dlo_s,         # scratch VMEM [rows, TILE]
    dhi_s,
    xlim_s,        # scratch VMEM [rows, 128]
    best_s,
    bk_s,
    left_s,
    right_s,
    prev_s,
    sems,          # DMA semaphores (6,)
    *,
    num_planes: int,
    pad: int,
    n_tiles: int,
    patch_area: float,
    ncc_threshold: float,
    subplane_refine: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = i * BAND
    rows = BAND + 2 * HALO
    c0 = j * TILE
    wd = curr_s.shape[1]
    ref_w = TILE + 2 * EXT

    copies = [
        pltpu.make_async_copy(
            curr_hbm.at[pl.ds(row0, rows), pl.ds(c0, wd)], curr_s, sems.at[0]
        ),
        pltpu.make_async_copy(
            ref_hbm.at[pl.ds(row0, rows), pl.ds(c0, ref_w)], ref_s, sems.at[1]
        ),
        pltpu.make_async_copy(
            valid_hbm.at[pl.ds(row0, rows), pl.ds(c0, ref_w)], valid_s, sems.at[2]
        ),
        pltpu.make_async_copy(
            dlo_hbm.at[pl.ds(row0, rows), pl.ds(c0, TILE)], dlo_s, sems.at[3]
        ),
        pltpu.make_async_copy(
            dhi_hbm.at[pl.ds(row0, rows), pl.ds(c0, TILE)], dhi_s, sems.at[4]
        ),
        pltpu.make_async_copy(
            xlim_hbm.at[pl.ds(row0, rows)], xlim_s, sems.at[5]
        ),
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    area = jnp.float32(patch_area)
    bm = _band_matrix(rows)

    # template stats on the tile (+-2 col halo from the padded ref window;
    # seed_init.cu:38-54 semantics)
    ref_c = ref_s[:, EXT - 2 : EXT + TILE + 2]          # [rows, TILE + 4]
    vref_c = (valid_s[:, EXT - 2 : EXT + TILE + 2] > 0.999).astype(jnp.float32)
    sum_t = _box5_y(_box5_x_win(ref_c, TILE), bm)
    denom_t = area * _box5_y(_box5_x_win(ref_c * ref_c, TILE), bm) - sum_t * sum_t
    ref_ok = (_box5_y(_box5_x_win(vref_c, TILE), bm) > (area - 0.5)) & (
        denom_t > 1e-10
    )
    inv_denom_t = jax.lax.rsqrt(jnp.maximum(denom_t, _FLT_MIN))

    dlo = dlo_s[:] - 0.5   # half-plane slack: a band narrower than one
    dhi = dhi_s[:] + 0.5   # integer step must still see one hypothesis
                           # (the extent cap is folded into the bounds)

    xcoord = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, TILE), 1) + c0
    ).astype(jnp.float32)
    xmin_e = xlim_s[:, 0:1]
    xmax_e = xlim_s[:, 1:2]

    neg = jnp.float32(_NEG)
    best_s[:] = jnp.full((rows, TILE), -1.0, jnp.float32)
    bk_s[:] = jnp.full((rows, TILE), -10.0, jnp.float32)
    left_s[:] = jnp.full((rows, TILE), neg, jnp.float32)
    right_s[:] = jnp.full((rows, TILE), neg, jnp.float32)
    prev_s[:] = jnp.full((rows, TILE), neg, jnp.float32)

    # this block's active plane interval (empty blocks: k_hi < k_lo and the
    # group loop below runs zero iterations)
    k_lo = krange_ref[2 * (i * n_tiles + j)]
    k_hi = krange_ref[2 * (i * n_tiles + j) + 1]
    g0 = k_lo // GROUP
    g1 = k_hi // GROUP

    # pre-roll the curr window so group g0's static slices see the g0*GROUP
    # shift the per-group rolls would have accumulated
    curr_s[:] = pltpu.roll(curr_s[:], g0 * GROUP, axis=1)

    # static slice geometry: after o per-group rolls, window lane m holds
    # curr2 column c0 + m - o*GROUP, so plane k = o*GROUP + kp's image
    # column x sits at lane x + pad + EXT - kp — static per unrolled kp.
    off0 = pad + EXT - (GROUP - 1)   # lowest plane-window start in a group

    def group(o, _):
        base = o.astype(jnp.float32) * GROUP
        # the x-half of the curr/curr^2 box sums commutes with the integer
        # shifts: hoist it once per group over the union of the group's
        # plane windows (width TILE + GROUP - 1, +-2 halo on the source)
        w = curr_s[:, off0 - 2 : pad + EXT + TILE + 2]
        xbw_c = _box5_x_win(w, TILE + GROUP - 1)
        xbw_cc = _box5_x_win(w * w, TILE + GROUP - 1)
        for kp in range(GROUP):
            delta = base + kp
            off = pad + EXT - kp
            s_i = _box5_y(xbw_c[:, GROUP - 1 - kp : GROUP - 1 - kp + TILE], bm)
            s_ii = _box5_y(xbw_cc[:, GROUP - 1 - kp : GROUP - 1 - kp + TILE], bm)
            p = curr_s[:, off - 2 : off + TILE + 2] * ref_c
            s_it = _box5_y(_box5_x_win(p, TILE), bm)

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
        curr_s[:] = pltpu.roll(curr_s[:], GROUP, axis=1)
        return 0

    jax.lax.fori_loop(g0, g1 + 1, group, 0)

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
    found) on the rect grid. ``rect_h`` must be a multiple of BAND and
    ``rect_w`` a multiple of TILE."""
    rect_h, rect_w = ref_img.shape
    assert rect_h % BAND == 0, rect_h
    assert rect_w % TILE == 0, rect_w
    n_bands = rect_h // BAND
    n_tiles = rect_w // TILE
    # plane k reads window [pad - k, pad - k + rect_w) of the padded buffer
    # and the box-sum windows carry a +-2 halo, so pad - (num_planes-1) >= 2
    assert num_planes <= pad - 1, (num_planes, pad)

    def zpad(x, fill=0.0):
        z = jnp.full((HALO, x.shape[1]), fill, x.dtype)
        return jnp.concatenate([z, x, z], axis=0)

    # per-(band, tile) active plane interval (for block skipping): the union
    # of the per-pixel disparity bands over valid pixels, padded by the
    # half-plane slack and the band halo rows
    valid_mask = valid > 0.999
    lo_t = jnp.where(valid_mask, disp_lo, jnp.inf).reshape(
        n_bands, BAND, n_tiles, TILE
    )
    hi_t = jnp.where(valid_mask, disp_hi, -jnp.inf).reshape(
        n_bands, BAND, n_tiles, TILE
    )
    k_lo_bt = jnp.floor(jnp.min(lo_t, axis=(1, 3)) - 1.0)   # [n_bands, n_tiles]
    k_hi_bt = jnp.ceil(jnp.max(hi_t, axis=(1, 3)) + 1.0)
    # halo rows of neighbor bands participate in a band's stencils
    k_lo_bt = jnp.minimum(k_lo_bt, jnp.roll(k_lo_bt, 1, axis=0))
    k_lo_bt = jnp.minimum(k_lo_bt, jnp.roll(k_lo_bt, -1, axis=0))
    k_hi_bt = jnp.maximum(k_hi_bt, jnp.roll(k_hi_bt, 1, axis=0))
    k_hi_bt = jnp.maximum(k_hi_bt, jnp.roll(k_hi_bt, -1, axis=0))
    k_lo_bt = jnp.where(jnp.isfinite(k_lo_bt), k_lo_bt, jnp.float32(num_planes))
    k_hi_bt = jnp.where(jnp.isfinite(k_hi_bt), k_hi_bt, -1.0)
    krange = jnp.stack(
        [
            jnp.clip(k_lo_bt, 0, num_planes - 1),
            jnp.clip(k_hi_bt, -1, num_planes - 1),
        ],
        axis=2,
    ).astype(jnp.int32).reshape(-1)

    # [rect_h, 2] -> lane-tiled [rect_h, 128] (cols 0/1 hold the bounds)
    xlim_t = jnp.pad(xlim.astype(jnp.float32), ((0, 0), (0, 126)))

    # HBM window layouts: every per-tile DMA must start 128-aligned, so the
    # curr buffer grows EXT zero columns on the left (also the roll headroom
    # for the group shifts) and ref/valid grow EXT on both sides (their
    # windows carry the +-2 stencil halo; image-edge halos read zeros,
    # matching the XLA oracle's zero-padded box sums)
    curr2 = zpad(jnp.pad(curr_pad, ((0, 0), (EXT, 0))))
    ref2 = zpad(jnp.pad(ref_img, ((0, 0), (EXT, EXT))))
    valid2 = zpad(jnp.pad(valid, ((0, 0), (EXT, EXT))))

    # curr window: covers every plane's slice (+-2 halo) with >=2 lanes of
    # roll-wrap slack; dynamic rotates need a 128-multiple lane dimension
    wd = -(-(EXT + pad + TILE + 2) // 128) * 128

    kernel = functools.partial(
        _sweep_kernel,
        num_planes=num_planes,
        pad=pad,
        n_tiles=n_tiles,
        patch_area=patch_area,
        ncc_threshold=ncc_threshold,
        subplane_refine=subplane_refine,
    )
    rows = BAND + 2 * HALO
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_bands, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[
            pl.BlockSpec(
                (BAND, TILE), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
            )
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM((rows, wd), jnp.float32),
            pltpu.VMEM((rows, TILE + 2 * EXT), jnp.float32),
            pltpu.VMEM((rows, TILE + 2 * EXT), jnp.float32),
            pltpu.VMEM((rows, TILE), jnp.float32),
            pltpu.VMEM((rows, TILE), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, TILE), jnp.float32),
            pltpu.VMEM((rows, TILE), jnp.float32),
            pltpu.VMEM((rows, TILE), jnp.float32),
            pltpu.VMEM((rows, TILE), jnp.float32),
            pltpu.VMEM((rows, TILE), jnp.float32),
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
        curr2,
        ref2,
        valid2,
        zpad(disp_lo),
        zpad(disp_hi),
        zpad(xlim_t, fill=-1.0),
    )
    return out[0], out[1], out[2]

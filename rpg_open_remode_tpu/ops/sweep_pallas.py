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

BAND = 64      # rows per grid step (128 was A/B'd: halving the +-HALO row
               # overhead loses to the wider per-block plane-range unions
               # it induces — 0.6-0.75x across regimes, 2026-08)
TILE = 128     # columns per grid step (one lane register)
HALO = 8       # stencil halo; 2 rows suffice but sublane slices must be 8-aligned
EXT = 128      # column extension of the HBM windows (DMA starts must be
               # 128-aligned, and the curr window needs left headroom for
               # the group rolls)
GROUP = 8      # planes per statically-unrolled group
TILE_OVERRIDE = None   # A/B hook: force the column-tile width (see below)
MXU_XBOX_OVERRIDE = None  # A/B hook: force the MXU x-box on/off (trace-time)


def _band_matrix(h, p=2):
    """(2p+1)-diagonal banded [h, h] matrix: the vertical box sum as one
    MXU matmul (2x faster than sublane rolls in the sweep loop; zero rows
    at the buffer edge only touch discarded halo outputs)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    return (jnp.abs(ii - jj) <= p).astype(jnp.float32)


def _box5_y(x, bm):
    return jnp.dot(bm, x, preferred_element_type=jnp.float32)


def _box5_x_win(w, out_w, p=2):
    """Horizontal (2p+1)-tap box sum of a window carrying a ±p-column
    halo: out[:, t] = sum(w[:, t:t+2p+1]). Addition order is center-out
    (center, -1, +1, -2, +2, ...), matching the roll-based formulation at
    p=2 for bitwise stability."""
    acc = w[:, p : p + out_w]
    for d in range(1, p + 1):
        acc = acc + w[:, p - d : p - d + out_w]
        acc = acc + w[:, p + d : p + d + out_w]
    return acc


def _sweep_kernel(
    krange_ref,    # SMEM prefetch [n_bands * n_tiles * 2]: per-block planes
    curr_hbm,      # ANY [rect_h + 2*HALO, EXT + rect_w + 2*pad]
    ref_hbm,       # ANY [rect_h + 2*HALO, rect_w + 2*EXT]
    valid_hbm,
    dlo_hbm,       # ANY [rect_h + 2*HALO, rect_w]
    dhi_hbm,
    xlim_hbm,      # ANY [rect_h + 2*HALO, 128]: cols 0/1 = eroded x-interval
    disp_out,      # VMEM [BAND, tile]
    ncc_out,
    found_out,
    curr_2s,       # scratch VMEM [2, rows, wd] (double-buffered inputs)
    ref_2s,        # scratch VMEM [2, rows, tile + 2*EXT]
    valid_2s,
    dlo_2s,        # scratch VMEM [2, rows, tile]
    dhi_2s,
    xlim_2s,       # scratch VMEM [2, rows, 128]
    best_s,
    bk_s,
    left_s,
    right_s,
    prev_s,
    sems,          # DMA semaphores (2, 6)
    *,
    num_planes: int,
    pad: int,
    n_tiles: int,
    tile: int,
    patch_side: int,
    ncc_threshold: float,
    subplane_refine: bool,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = BAND + 2 * HALO
    wd = curr_2s.shape[2]
    ref_w = tile + 2 * EXT
    n_steps = pl.num_programs(0) * n_tiles
    flat = i * n_tiles + j
    par = jax.lax.rem(flat, 2)

    # double-buffered input pipeline: step f computes on slot f%2 while
    # step f+1's windows stream into the other slot — the DMA latency of
    # 48 small windows would otherwise serialize with compute
    def _copies(f, slot):
        bi = f // n_tiles
        bj = jax.lax.rem(f, n_tiles)
        r0 = bi * BAND
        cc = bj * tile
        return [
            pltpu.make_async_copy(
                curr_hbm.at[pl.ds(r0, rows), pl.ds(cc, wd)],
                curr_2s.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                ref_hbm.at[pl.ds(r0, rows), pl.ds(cc, ref_w)],
                ref_2s.at[slot], sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                valid_hbm.at[pl.ds(r0, rows), pl.ds(cc, ref_w)],
                valid_2s.at[slot], sems.at[slot, 2],
            ),
            pltpu.make_async_copy(
                dlo_hbm.at[pl.ds(r0, rows), pl.ds(cc, tile)],
                dlo_2s.at[slot], sems.at[slot, 3],
            ),
            pltpu.make_async_copy(
                dhi_hbm.at[pl.ds(r0, rows), pl.ds(cc, tile)],
                dhi_2s.at[slot], sems.at[slot, 4],
            ),
            pltpu.make_async_copy(
                xlim_hbm.at[pl.ds(r0, rows)],
                xlim_2s.at[slot], sems.at[slot, 5],
            ),
        ]

    @pl.when(flat == 0)
    def _():
        for c in _copies(flat, par):
            c.start()

    @pl.when(flat + 1 < n_steps)
    def _():
        for c in _copies(flat + 1, 1 - par):
            c.start()

    for c in _copies(flat, par):
        c.wait()

    curr_s = curr_2s.at[par]
    ref_s = ref_2s.at[par]
    valid_s = valid_2s.at[par]
    dlo_s = dlo_2s.at[par]
    dhi_s = dhi_2s.at[par]
    xlim_s = xlim_2s.at[par]
    c0 = j * tile

    neg = jnp.float32(_NEG)
    best_s[:] = jnp.full((rows, tile), -1.0, jnp.float32)
    bk_s[:] = jnp.full((rows, tile), -10.0, jnp.float32)
    left_s[:] = jnp.full((rows, tile), neg, jnp.float32)
    right_s[:] = jnp.full((rows, tile), neg, jnp.float32)
    prev_s[:] = jnp.full((rows, tile), neg, jnp.float32)

    # this block's active plane interval (empty blocks: k_hi < k_lo — the
    # whole sweep body below is skipped, including the template stats: in
    # steady state most tiles are fully converged/diverged and pay only
    # their DMAs and the constant output writes)
    k_lo = krange_ref[2 * (i * n_tiles + j)]
    k_hi = krange_ref[2 * (i * n_tiles + j) + 1]
    g0 = k_lo // GROUP
    g1 = k_hi // GROUP

    @pl.when(k_lo <= k_hi)
    def _sweep_body():
        hp = patch_side // 2
        area = jnp.float32(patch_side * patch_side)
        bm = _band_matrix(rows, hp)
        # large patches (focal-scaled HD/FHD configs): the per-plane
        # horizontal box sum of curr*ref costs 2*hp VPU adds over ~20
        # vregs — at patch 15 that is ~25% of the kernel's instruction
        # issue (the measured bound at FHD). Run it as one banded
        # [rows, tile+2hp] x [tile+2hp, tile] MXU matmul instead; at the
        # reference 5x5 the 4 adds are cheaper than the matmul.
        mxu_xbox = (
            patch_side >= 9 if MXU_XBOX_OVERRIDE is None else MXU_XBOX_OVERRIDE
        )
        if mxu_xbox:
            ii = jax.lax.broadcasted_iota(
                jnp.int32, (tile + 2 * hp, tile), 0
            )
            jj = jax.lax.broadcasted_iota(
                jnp.int32, (tile + 2 * hp, tile), 1
            )
            xm = ((ii - jj >= 0) & (ii - jj <= 2 * hp)).astype(jnp.float32)

        # template stats on the tile (+-hp col halo from the padded ref
        # window; seed_init.cu:38-54 semantics)
        ref_c = ref_s[:, EXT - hp : EXT + tile + hp]    # [rows, tile + 2hp]
        vref_c = (valid_s[:, EXT - hp : EXT + tile + hp] > 0.999).astype(
            jnp.float32
        )
        sum_t = _box5_y(_box5_x_win(ref_c, tile, hp), bm)
        denom_t = (
            area * _box5_y(_box5_x_win(ref_c * ref_c, tile, hp), bm)
            - sum_t * sum_t
        )
        ref_ok = (_box5_y(_box5_x_win(vref_c, tile, hp), bm) > (area - 0.5)) & (
            denom_t > 1e-10
        )
        inv_denom_t = jax.lax.rsqrt(jnp.maximum(denom_t, _FLT_MIN))

        dlo = dlo_s[:] - 0.5   # half-plane slack: a band narrower than one
        dhi = dhi_s[:] + 0.5   # integer step must still see one hypothesis
                               # (the extent cap is folded into the bounds)

        xcoord = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, tile), 1) + c0
        ).astype(jnp.float32)
        xmin_e = xlim_s[:, 0:1]
        xmax_e = xlim_s[:, 1:2]

        # pre-roll the curr window so group g0's static slices see the
        # g0*GROUP shift the per-group rolls would have accumulated
        curr_s[:] = pltpu.roll(curr_s[:], g0 * GROUP, axis=1)

        # static slice geometry: after o per-group rolls, window lane m
        # holds curr2 column c0 + m - o*GROUP, so plane k = o*GROUP + kp's
        # image column x sits at lane x + pad + EXT - kp — static per
        # unrolled kp.
        off0 = pad + EXT - (GROUP - 1)  # lowest plane-window start in a group
        uw = tile + GROUP - 1           # union width of a group's windows

        def group(o, _):
            base = o.astype(jnp.float32) * GROUP
            # the x-half of the curr/curr^2 box sums commutes with the
            # integer shifts: hoist it once per group over the union of the
            # group's plane windows (width uw, +-2 halo on the source).
            # (Hoisting the y-half too and batching all GROUP s_it matmuls
            # into one [rows, GROUP*tile] call was tried and is bitwise
            # identical but 8-18% SLOWER on this toolchain: the kernel is
            # not MXU-fill-bound, and the per-plane unaligned lane slices
            # of the batched outputs cost more relayouts than the concat.)
            w = curr_s[:, off0 - hp : pad + EXT + tile + hp]
            xbw_c = _box5_x_win(w, uw, hp)
            xbw_cc = _box5_x_win(w * w, uw, hp)
            for kp in range(GROUP):
                delta = base + kp
                off = pad + EXT - kp
                prod = curr_s[:, off - hp : off + tile + hp] * ref_c
                if mxu_xbox:
                    prod_x = jnp.dot(
                        prod, xm, preferred_element_type=jnp.float32
                    )
                else:
                    prod_x = _box5_x_win(prod, tile, hp)
                # one [rows, 3*tile] matmul instead of three [rows, tile]
                # ones: the MXU pipeline fill amortizes over 3x the columns
                xy = jnp.concatenate(
                    [
                        xbw_c[:, GROUP - 1 - kp : GROUP - 1 - kp + tile],
                        xbw_cc[:, GROUP - 1 - kp : GROUP - 1 - kp + tile],
                        prod_x,
                    ],
                    axis=1,
                )
                s = _box5_y(xy, bm)
                s_i = s[:, :tile]
                s_ii = s[:, tile : 2 * tile]
                s_it = s[:, 2 * tile :]

                num = area * s_it - s_i * sum_t
                den_l = area * s_ii - s_i * s_i
                ncc = (
                    num * jax.lax.rsqrt(jnp.maximum(den_l, _FLT_MIN))
                    * inv_denom_t
                )
                x_src = xcoord - delta
                ok = (
                    ref_ok
                    & (den_l > 1e-10)  # textureless curr patch: the exact
                                       # num cancels to 0 but float residue
                                       # / tiny denominator can fake a high
                                       # NCC
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


def block_plane_intervals(
    valid, disp_lo, disp_hi, num_planes: int, n_bands: int, n_tiles: int,
    tile: int,
):
    """Per-(band, tile) active plane interval for block skipping: the union
    of the per-pixel disparity bands over valid pixels, padded by the
    half-plane slack and the band halo rows. Empty blocks return
    ``k_hi < k_lo``. Returns two int32 ``[n_bands, n_tiles]`` arrays.

    This is both the kernel's scalar-prefetch input and the basis of the
    bench's compute-efficiency accounting (a block executes
    ``(k_hi//GROUP - k_lo//GROUP + 1) * GROUP`` planes).

    (A compacted per-block occupied-GROUP list was A/B'd as an alternative:
    bitwise identical but 4-9% slower — depth varies smoothly, so within a
    block the per-pixel bands tile the interval hull with no gaps (measured
    occupancy == hull exactly at mid-convergence), and the list's
    variable-amount rolls + SMEM reads only add overhead.)"""
    valid_mask = valid > 0.999
    lo_t = jnp.where(valid_mask, disp_lo, jnp.inf).reshape(
        n_bands, BAND, n_tiles, tile
    )
    hi_t = jnp.where(valid_mask, disp_hi, -jnp.inf).reshape(
        n_bands, BAND, n_tiles, tile
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
    return (
        jnp.clip(k_lo_bt, 0, num_planes - 1).astype(jnp.int32),
        jnp.clip(k_hi_bt, -1, num_planes - 1).astype(jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_planes", "pad", "patch_side", "ncc_threshold",
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
    patch_side: int,
    subplane_refine: bool,
):
    """Run the fused integer-disparity sweep. Returns (disp_best, best_ncc,
    found) on the rect grid. ``rect_h`` must be a multiple of BAND and
    ``rect_w`` a multiple of tile."""
    rect_h, rect_w = ref_img.shape
    assert rect_h % BAND == 0, rect_h
    assert rect_w % TILE == 0, rect_w
    # vertical stencil halo must fit the zero-padded HALO rows; the column
    # halos ride the EXT-padded windows (EXT = 128 >> any sane patch)
    assert patch_side % 2 == 1 and patch_side // 2 <= HALO, patch_side
    # wider tiles amortize per-instruction overhead; 128 is the
    # alignment floor (coarse half-res widths are odd multiples of 128).
    # (Padding odd-128 grids up to a 256 tile — empty disparity bands in
    # the pad, outputs sliced — was A/B'd on hardware and LOST: 0.98-1.00x
    # at 1408 wide / 255 planes, 0.89-0.93x at 896 / 127. The 128-tile
    # fused stats matmul is already [rows, 384] wide, so MXU fill is not
    # the bottleneck, and narrower tiles skip planes at finer granularity.)
    # TILE_OVERRIDE: experiment hook (set before FIRST trace of a shape —
    # it is read at trace time and baked into the cached executable).
    tile = TILE_OVERRIDE or (256 if rect_w % 256 == 0 else 128)
    n_bands = rect_h // BAND
    n_tiles = rect_w // tile
    # plane k reads window [pad - k, pad - k + rect_w) of the padded buffer
    # and the box-sum windows carry a +-(patch//2) halo riding the EXT
    # zero columns, so only the window start must stay in the buffer
    assert num_planes <= pad - 1, (num_planes, pad)

    def zpad(x, fill=0.0):
        z = jnp.full((HALO, x.shape[1]), fill, x.dtype)
        return jnp.concatenate([z, x, z], axis=0)

    k_lo_bt, k_hi_bt = block_plane_intervals(
        valid, disp_lo, disp_hi, num_planes, n_bands, n_tiles, tile
    )
    krange = jnp.stack([k_lo_bt, k_hi_bt], axis=2).reshape(-1)

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

    # curr window: covers every plane's slice (+-patch//2 halo) with roll-
    # wrap slack; dynamic rotates need a 128-multiple lane dimension
    wd = -(-(EXT + pad + tile + patch_side // 2) // 128) * 128

    kernel = functools.partial(
        _sweep_kernel,
        num_planes=num_planes,
        pad=pad,
        n_tiles=n_tiles,
        tile=tile,
        patch_side=patch_side,
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
                (BAND, tile), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
            )
        ] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, rows, wd), jnp.float32),
            pltpu.VMEM((2, rows, tile + 2 * EXT), jnp.float32),
            pltpu.VMEM((2, rows, tile + 2 * EXT), jnp.float32),
            pltpu.VMEM((2, rows, tile), jnp.float32),
            pltpu.VMEM((2, rows, tile), jnp.float32),
            pltpu.VMEM((2, rows, 128), jnp.float32),
            pltpu.VMEM((rows, tile), jnp.float32),
            pltpu.VMEM((rows, tile), jnp.float32),
            pltpu.VMEM((rows, tile), jnp.float32),
            pltpu.VMEM((rows, tile), jnp.float32),
            pltpu.VMEM((rows, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 6)),
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

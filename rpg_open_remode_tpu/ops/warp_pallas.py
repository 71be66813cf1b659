"""Pallas TPU kernels for the two-pass scanline warp.

The XLA tent-matmul resamplers in ``utils/warp.py`` build a dense
[out, in, chunk] weight tensor in HBM per pass (~600 MB of traffic for a
640x480 warp -> ~1.2 ms/pass).  These kernels exploit what is special about
*rectification* warps: the sample-offset fields ``q(yo,c) - yo`` (vertical
pass) and ``u(r,xo) - xo`` (horizontal pass) vary by only a few pixels
across a row band — small tilt + near-unity scale.  Each band therefore
resamples from a narrow window of shifted copies of the source:

  out[yo, c] = sum_j  tent(q[yo, c] - (lo_b + j)) * img[lo_b + j, c]

with ``j < SPAN`` and ``lo_b`` the band's minimum source index (computed in
XLA, scalar-prefetched so the kernel can DMA the right source window).  The
shifted copies are produced by one window DMA + SPAN static unit rolls —
no gathers, no weight tensors, pure VPU accumulation.

Offsets beyond the window are clamped (graceful blur instead of
corruption), and a runtime guard (`_band_lims`'s ``fits``) switches the
whole pass to the exact XLA resampler when a warp's offsets overflow the
tap window (extreme rotations). Ragged output heights, non-block-multiple
widths and wider-than-source outputs are padded internally and sliced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BAND = 64        # output rows (axis0) / sublane rows (axis1) per grid step
_ALIGN = 8

# Source-window taps per output element. Each pass compiles a narrow and a
# wide variant and picks the narrowest whose per-window offset range fits
# (then the exact XLA resampler as the final fallback): typical
# rectification warps span 4-6 rows per (band, col-block) in the vertical
# pass (SPAN_V_SMALL covers that plus the 8-row alignment rounding of the
# window starts).
#
# Round-5: the horizontal pass is now column-blocked like the vertical one
# (per-(band, 128-col-block) windows). Its fit test was previously over
# ENTIRE 64-row bands, where the rect/image scale mismatch contributes a
# linear (s-1)*x ramp across the full row — ~24 px at 640 but growing with
# absolute width AND with pose distance from the keyframe (the fitted rect
# scale drifts as the footprint grows): at 1920x1080 the spans blow past
# any fixed whole-band budget by mid-keyframe, and frames silently paid the
# ~20x XLA fallback (measured round 5: FHD steady-state frames cost 100+ ms
# with a nearly-empty sweep — the warps were the cost). Block-local offset
# ranges are set by tilt over 64 rows + scale over 128 cols + perspective
# curvature — a few pixels at ANY width and pose, so the narrow span
# almost always fits and the taps per output drop 40 -> 24 on the common
# path.
SPAN_V = (16, 48)
SPAN_U = (24, 64)

CBW = 128          # column-block width of the vertical pass (the tilt of a
                   # rectification warp is a linear ramp in x, so narrower
                   # blocks keep the per-window row span within SPAN)
# Horizontal-pass output col blocks: 256 when the (padded) output width
# allows (fewer, larger DMAs — at 640-class widths the 128-block variant
# measured ~+0.3 ms/frame of DMA/fixed overhead vs the old whole-row
# kernel), 128 otherwise. Offset ranges over 256 cols are still a few px
# for rectification warps, so the narrow span fits either way. The source
# window carries the DMA-alignment residual (< 128) + OCB + span, rounded
# to a lane multiple; left padding covers block offsets down to -(OCB-1).
OCB_CHOICES = {128: (384, 128), 256: (512, 256)}   # ocb -> (winw, padl)


def _resample0_kernel(
    start_ref,     # SMEM prefetch [n_bands * n_cb]: window starts
    coord_hbm,     # ANY [Ho, W] sample-row field q
    img_hbm,       # ANY [C, Hs, W]
    out_ref,       # VMEM [C, BAND, CBW]
    coord_s,       # VMEM [BAND, CBW]
    win_s,         # VMEM [C, BAND + span, CBW]
    sems,
    *, n_ch: int, hs: int, n_cb: int, span: int,
):
    win = BAND + span
    b = pl.program_id(0)
    cb = pl.program_id(1)
    start = pl.multiple_of(start_ref[b * n_cb + cb], _ALIGN)
    c1 = pltpu.make_async_copy(
        coord_hbm.at[pl.ds(b * BAND, BAND), pl.ds(cb * CBW, CBW)],
        coord_s,
        sems.at[0],
    )
    c2 = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(start, win), pl.ds(cb * CBW, CBW)],
        win_s,
        sems.at[1],
    )
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()

    # out[r] = sum_j tent(q[r] - (start + r + j)) * win[r + j]; the tap-j
    # window rows are produced by cascaded unit sublane rolls
    r_local = jax.lax.broadcasted_iota(jnp.int32, (BAND, CBW), 0).astype(
        jnp.float32
    )
    q = jnp.clip(coord_s[:], 0.0, hs - 1.0)
    # local row r takes taps from win rows r + [0, SPAN): weight of tap j is
    # tent(q - (start + r + j)) = tent(offr - j)
    offr = jnp.clip(q - start.astype(jnp.float32) - r_local, 0.0, span - 1.0)

    # tap loop outside, channels inside: the tent weight depends only on
    # the coordinate field, so one weight map per tap serves every channel
    # (the window copies roll in place in scratch VMEM)
    for ch in range(n_ch):
        out_ref[ch] = jnp.zeros((BAND, CBW), jnp.float32)
    for j in range(span):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(offr - jnp.float32(j)))
        for ch in range(n_ch):
            out_ref[ch] = out_ref[ch] + w * win_s[ch, 0:BAND, :]
            win_s[ch] = pltpu.roll(win_s[ch], win - 1, axis=0)


def _resample1_kernel(
    meta_ref,      # SMEM prefetch [n_bands * n_ocb * 2]: (start_al, rb)
    coord_hbm,     # ANY [H, Wo] sample-col field u
    img_hbm,       # ANY [C, H, ws2] (left-padded by padl)
    out_ref,       # VMEM [C, BAND, ocb]
    coord_2s,      # VMEM [2, BAND, ocb] (double-buffered)
    win_2s,        # VMEM [2, C, BAND, winw]
    sems,          # DMA semaphores (2, 2)
    *,
    n_ch: int,
    n_ocb: int,
    ws_true: int,
    span: int,
    ocb: int,
    winw: int,
    padl: int,
):
    b = pl.program_id(0)
    cb = pl.program_id(1)
    flat = b * n_ocb + cb
    n_steps = pl.num_programs(0) * n_ocb
    par = jax.lax.rem(flat, 2)

    def _copies(f, slot):
        bb = f // n_ocb
        cc = jax.lax.rem(f, n_ocb)
        start = pl.multiple_of(meta_ref[2 * f], 128)
        return [
            pltpu.make_async_copy(
                coord_hbm.at[pl.ds(bb * BAND, BAND), pl.ds(cc * ocb, ocb)],
                coord_2s.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                img_hbm.at[:, pl.ds(bb * BAND, BAND), pl.ds(start, winw)],
                win_2s.at[slot], sems.at[slot, 1],
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

    start = meta_ref[2 * flat]
    rb = meta_ref[2 * flat + 1]
    # block window start in absolute source coords: lo_abs = start + rb -
    # padl; the tap weight needs offr = u - lo_abs - x_local =
    # (u - x_global) - mins_cb, so subtract the block's GLOBAL column base
    lo_cb = (start + rb - padl - cb * ocb).astype(jnp.float32)

    xo = (
        jax.lax.broadcasted_iota(jnp.int32, (BAND, ocb), 1) + cb * ocb
    ).astype(jnp.float32)
    u = jnp.clip(coord_2s[par], 0.0, ws_true - 1.0)
    off = u - xo                           # global output coords
    offr = jnp.clip(off - lo_cb, 0.0, span - 1.0)

    # window lanes shifted so that sh_j[:, x] = img[:, x + lo_abs + j]:
    # one dynamic pre-roll left by rb (roll right by WINW - rb), then
    # static unit rolls per tap, in place. Tap loop outside, channels
    # inside: one tent-weight map per tap serves every channel.
    win = win_2s.at[par]
    for ch in range(n_ch):
        win[ch] = pltpu.roll(win[ch], (winw - rb) % winw, axis=1)
        out_ref[ch] = jnp.zeros((BAND, ocb), jnp.float32)
    for j in range(span):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(offr - jnp.float32(j)))
        for ch in range(n_ch):
            out_ref[ch] = out_ref[ch] + w * win[ch, :, :ocb]
            win[ch] = pltpu.roll(win[ch], winw - 1, axis=1)


def _out_sds(shape, *refs):
    """ShapeDtypeStruct carrying the UNION of the inputs' varying-mesh-axes
    sets (required for pallas_call outputs under shard_map with check_vma:
    e.g. a replicated image resampled at state-derived, device-varying
    coordinates produces a varying output). Capture from the original
    arrays, outside any lax.cond: branch tracers do not expose vma."""
    try:
        vma = frozenset().union(*(jax.typeof(r).vma for r in refs))
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
    except (AttributeError, TypeError):
        return jax.ShapeDtypeStruct(shape, jnp.float32)


def _band_lims(field, valid, n_bands, band, lo_min, n_cb=1, align=_ALIGN):
    """Per-(band, col-block) window starts + maxima from an offset field
    (XLA side), flattened [n_bands * n_cb]. The caller clips the starts to
    its window bounds and tests per-span fit (`_fits`).

    Out-of-source samples are excluded from the extrema: their clamp ramp
    would otherwise drag the window far from the in-range offsets (such
    pixels sample approximately under the Pallas path and are masked by
    footprint validity downstream). ``align`` rounds starts down for
    sublane-aligned DMA (the vertical pass); the horizontal pass rolls
    lanes and needs no alignment, sparing its fit test the rounding slack."""
    w = field.shape[-1]
    f = jnp.where(valid, field, jnp.inf).reshape(n_bands, band, n_cb, w // n_cb)
    m = jnp.min(f, axis=(1, 3)).reshape(-1)
    m = jnp.where(jnp.isfinite(m), m, jnp.float32(lo_min))
    mins = jnp.floor(m).astype(jnp.int32)
    if align > 1:
        mins = (mins // align) * align
    fneg = jnp.where(valid, field, -jnp.inf).reshape(
        n_bands, band, n_cb, w // n_cb
    )
    mx = jnp.max(fneg, axis=(1, 3)).reshape(-1)
    return mins, mx


def _fits(mins, mx, span):
    """Does every window's offset range fit in ``span`` taps? (ceil covers
    the bilinear upper tap)"""
    return jnp.all(
        jnp.where(
            jnp.isfinite(mx),
            mx - mins.astype(jnp.float32) <= span - 1.5,
            True,
        )
    )


@functools.partial(jax.jit, static_argnames=("n_ch", "hs", "width"))
def resample_rows_pallas(img, q, n_ch, hs, width):
    """img [C, Hs, W], q [Ho, W] -> [C, Ho, W]; Ho % BAND == 0.

    The source is padded top/bottom so every band's [start, start+WIN) row
    window stays in bounds without clipping (clipped starts would break the
    per-row tap alignment)."""
    ho = q.shape[0]
    n_bands = ho // BAND
    # the column-block grid needs a CBW-divisible width: pad the source with
    # zero columns and the coordinates with out-of-range values (excluded
    # from every window), then slice the result
    w_true = width
    width = ((width + CBW - 1) // CBW) * CBW
    if width != w_true:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, width - w_true)))
        q = jnp.concatenate(
            [q, jnp.full((ho, width - w_true), -1.0, q.dtype)], axis=1
        )
    pad_top, pad_bot = BAND, BAND + SPAN_V[-1]
    img = jnp.pad(img, ((0, 0), (pad_top, pad_bot), (0, 0)))
    hs_p = hs + pad_top + pad_bot
    in_range = (q >= 0.0) & (q <= hs - 1.0)
    q = jnp.clip(q, 0.0, hs - 1.0) + pad_top
    # window start per (band, col-block): min of (q - local_row), so row r
    # finds its samples at win rows r + [0, span)
    n_cb = width // CBW
    local = jnp.arange(ho, dtype=jnp.float32)[:, None] % BAND
    mins, mx = _band_lims(q - local, in_range, n_bands, BAND, 0, n_cb)
    hs = hs_p

    def make_variant(span):
        lo_s = jnp.clip(mins, 0, hs_p - (BAND + span))
        fits_s = _fits(lo_s, mx, span)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_bands, n_cb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (n_ch, BAND, CBW),
                lambda b, cb, *_: (0, b, cb),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((BAND, CBW), jnp.float32),
                pltpu.VMEM((n_ch, BAND + span, CBW), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _resample0_kernel, n_ch=n_ch, hs=hs, n_cb=n_cb, span=span
        )

        def run(lo_small, lo_big, q_, img_):
            lo_ = lo_small if span == SPAN_V[0] else lo_big
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_sds,
                interpret=jax.default_backend() == "cpu",
            )(lo_, q_, img_)

        return run, fits_s, lo_s

    out_sds = _out_sds((n_ch, ho, width), img, q, mins)
    run_small, fits_small, lo_small = make_variant(SPAN_V[0])
    run_big, fits_big, lo_big = make_variant(SPAN_V[1])

    def run_xla(lo_small, lo_big, q_, img_):
        from rpg_open_remode_tpu.utils import warp as warp_xla

        return warp_xla.resample_rows(img_, q_)

    def big_or_xla(lo_small, lo_big, q_, img_):
        # runtime guard: offsets that overflow even the wide tap window
        # (strong rotation) fall back to the exact XLA resampler
        return jax.lax.cond(
            fits_big, run_big, run_xla, lo_small, lo_big, q_, img_
        )

    out = jax.lax.cond(
        fits_small, run_small, big_or_xla, lo_small, lo_big, q, img
    )
    return out[..., :w_true]


@functools.partial(jax.jit, static_argnames=("n_ch", "ws", "wo"))
def resample_cols_pallas(img, u, n_ch, ws, wo):
    """img [C, H, Ws], u [H, Wo] -> [C, H, Wo]; H % BAND == 0.

    Column-blocked (round 5): each (64-row band, 128-col output block) DMAs
    its own winw-lane source window (start 128-aligned for the DMA, the
    residual removed with one dynamic lane pre-roll), so the span fit test
    is per BLOCK — the global (scale-1)*width offset ramp that made
    whole-band spans overflow at large widths/baselines (and silently paid
    the ~20x XLA fallback) cancels into the per-block window start."""
    h = u.shape[0]
    n_bands = h // BAND
    ws_true = ws
    wo_true = wo
    # block size: 256 when the 128-padded output width divides (fewer,
    # larger DMAs — OCB_CHOICES note above), 128 otherwise
    wo128 = ((wo + 127) // 128) * 128
    ocb = 256 if wo128 % 256 == 0 else 128
    winw, padl = OCB_CHOICES[ocb]
    # output blocks: pad the column count with OUT-OF-RANGE coordinates (so
    # the padding cannot influence any block's window) and slice the result
    wo = ((wo + ocb - 1) // ocb) * ocb
    if wo != wo_true:
        u = jnp.concatenate(
            [u, jnp.full((h, wo - wo_true), -1.0, u.dtype)], axis=1
        )
    n_ocb = wo // ocb
    # source padding: padl zero lanes on the left (block-local offsets
    # reach -(ocb-1)); right padding so every aligned window start + winw
    # stays in bounds (start_al <= padl + ws_true - 1 rounded down)
    ws2 = ((padl + ws_true + 127) // 128) * 128 + winw
    img2 = jnp.pad(img, ((0, 0), (0, 0), (padl, ws2 - padl - ws_true)))

    xo = jnp.arange(wo, dtype=jnp.float32)[None, :]
    in_range = (u >= 0.0) & (u <= ws_true - 1.0)
    off = jnp.clip(u, 0.0, ws_true - 1.0) - xo
    # per-(band, col-block) offset windows; lane rolls need no start
    # alignment (align=1) — the DMA alignment residual is carried in rb
    mins, mx = _band_lims(off, in_range, n_bands, BAND, 0, n_cb=n_ocb,
                          align=1)
    cb_idx = jnp.tile(jnp.arange(n_ocb, dtype=jnp.int32), n_bands)
    lo_abs = cb_idx * ocb + mins
    # empty blocks (all coords out of range): any in-bounds window
    lo_abs = jnp.where(
        jnp.isfinite(mx), lo_abs, jnp.zeros_like(lo_abs)
    )
    # u >= 0 bounds lo_abs >= -(ocb - 1) >= -padl + 1, so start_al >= 0
    start_al = ((lo_abs + padl) // 128) * 128
    rb = lo_abs + padl - start_al              # in [0, 128)
    meta = jnp.stack([start_al, rb], axis=1).astype(jnp.int32).reshape(-1)
    out_sds2 = _out_sds((n_ch, h, wo), img, u, mins)

    def make_variant(span):
        fits_s = _fits(mins, mx, span)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_bands, n_ocb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (n_ch, BAND, ocb), lambda b, cb, *_: (0, b, cb),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, BAND, ocb), jnp.float32),
                pltpu.VMEM((2, n_ch, BAND, winw), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        kernel = functools.partial(
            _resample1_kernel, n_ch=n_ch, n_ocb=n_ocb, ws_true=ws_true,
            span=span, ocb=ocb, winw=winw, padl=padl,
        )

        def run(meta_, u_, img_):
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_sds2,
                interpret=jax.default_backend() == "cpu",
            )(meta_, u_, img_)

        return run, fits_s

    run_small, fits_small = make_variant(SPAN_U[0])
    run_big, fits_big = make_variant(SPAN_U[1])

    def run_xla(meta_, u_, img_):
        from rpg_open_remode_tpu.utils import warp as warp_xla

        return warp_xla.resample_cols(img_[..., padl:padl + ws_true], u_)

    def big_or_xla(meta_, u_, img_):
        return jax.lax.cond(fits_big, run_big, run_xla, meta_, u_, img_)

    out = jax.lax.cond(fits_small, run_small, big_or_xla, meta, u, img2)
    return out[..., :wo_true]

"""Fast image warps for TPU: two-pass scanline resampling on the MXU.

Why this exists: the reference samples images with hardware bilinear texture
reads at arbitrary per-pixel coordinates (src/epipolar_match.cu:103-123,
src/depthmap.cpp:95-106).  A literal port is a 2-D gather; XLA lowers both
general gathers and `take_along_axis` to ~3 ms per tap per 640x480 image on
this TPU — unusable in a per-frame loop.  TPUs have no gather unit, but they
have an enormous matmul unit, so interpolation is recast as a contraction:

  out[yo, c] = sum_yi  tent(v[yo, c] - yi) * img[yi, c]

with ``tent(d) = max(0, 1 - |d|)`` — exactly linear interpolation, built as a
dense [Yo, Yi, chunk] weight tensor on the fly and contracted on the MXU.
This runs ~1 ms per full-image pass instead of ~3 ms per *tap*, and the
weights are shared across channels, so warping a stack of aligned fields
costs the same as warping one.

A projective (homography) warp decomposes *exactly* into two such 1-D passes
(Catmull & Smith 1980, "3-D transformations of images in scanline order"):

  pass 1 (vertical):   A(x_s, y_o) = img(x_s, q(x_s, y_o))
  pass 2 (horizontal): out(x_o, y_o) = A(u(x_o, y_o), y_o)

where ``(u, v)`` are the source coordinates of output pixel ``(x_o, y_o)``
under H and the auxiliary ``q(X, y) = v(x~, y)`` with ``x~`` solving
``u(x~, y) = X`` (closed form for a homography).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8  # python float: see rect_match._FLT_MIN note


def _safe(den):
    return jnp.where(jnp.abs(den) < _EPS, jnp.where(den >= 0, _EPS, -_EPS), den)


# ---------------------------------------------------------------------------
# 1-D resampling passes
# ---------------------------------------------------------------------------


def resample_rows(img: jnp.ndarray, v: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """Sample each column of ``img`` at fractional row positions ``v``.

    ``img``: [..., Hs, W] (leading axes = channels, warped with shared
    weights); ``v``: [Ho, W]. Returns [..., Ho, W]. Clamp addressing.
    Implemented as chunked tent-weight contractions on the MXU.
    """
    hs = img.shape[-2]
    w = img.shape[-1]
    v = jnp.clip(v, 0.0, hs - 1.0)
    yi = jnp.arange(hs, dtype=jnp.float32)
    outs = []
    for c0 in range(0, w, chunk):
        cw = min(chunk, w - c0)
        vs = jax.lax.dynamic_slice_in_dim(v, c0, cw, axis=-1)       # [Ho, cw]
        im = jax.lax.dynamic_slice_in_dim(img, c0, cw, axis=-1)     # [..., Hs, cw]
        wm = jnp.maximum(0.0, 1.0 - jnp.abs(vs[:, None, :] - yi[None, :, None]))
        # precision=HIGHEST: TPU matmuls otherwise truncate inputs to bf16,
        # which quantizes interpolated depth/disparity fields far too coarsely
        outs.append(
            jnp.einsum(
                "oic,...ic->...oc",
                wm,
                im,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    return jnp.concatenate(outs, axis=-1)


def resample_cols(img: jnp.ndarray, u: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """Sample each row of ``img`` at fractional column positions ``u``.

    ``img``: [..., H, Ws]; ``u``: [H, Wo]. Returns [..., H, Wo].
    """
    ws = img.shape[-1]
    h = img.shape[-2]
    u = jnp.clip(u, 0.0, ws - 1.0)
    xi = jnp.arange(ws, dtype=jnp.float32)
    outs = []
    for r0 in range(0, h, chunk):
        rh = min(chunk, h - r0)
        us = jax.lax.dynamic_slice_in_dim(u, r0, rh, axis=-2)       # [rh, Wo]
        im = jax.lax.dynamic_slice_in_dim(img, r0, rh, axis=-2)     # [..., rh, Ws]
        wm = jnp.maximum(0.0, 1.0 - jnp.abs(us[:, :, None] - xi[None, None, :]))
        outs.append(
            jnp.einsum(
                "roi,...ri->...ro",
                wm,
                im,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        )
    return jnp.concatenate(outs, axis=-2)


# ---------------------------------------------------------------------------
# Homography warp (exact two-pass)
# ---------------------------------------------------------------------------


def homography_coords(H: jnp.ndarray, xo: jnp.ndarray, yo: jnp.ndarray):
    """Source coordinates (u, v) of output pixels under 3x3 ``H`` (maps
    output pixel homogeneous coords -> source pixel coords)."""
    den = _safe(H[2, 0] * xo + H[2, 1] * yo + H[2, 2])
    u = (H[0, 0] * xo + H[0, 1] * yo + H[0, 2]) / den
    v = (H[1, 0] * xo + H[1, 1] * yo + H[1, 2]) / den
    return u, v


def shift_origin(H: jnp.ndarray, x0, y0) -> jnp.ndarray:
    """Fold a TRACED output-window origin into the homography:
    ``H @ translate(x0, y0)``, so the warp itself runs with a static (0, 0)
    origin. ``homography_warp``'s fast banded-Pallas path requires static
    origins, while the homography entries are traced anyway — composing the
    shift keeps sampling positions identical and the fast path eligible."""
    col2 = x0 * H[:, 0] + y0 * H[:, 1] + H[:, 2]
    return jnp.concatenate([H[:, 0:1], H[:, 1:2], col2[:, None]], axis=1)


def _pallas_warp_ok(img, out_height, y0) -> bool:
    """The banded Pallas resamplers need a static window origin and a real
    TPU backend (interpret mode is far slower than the XLA path). Ragged
    output heights and non-col-block source widths are padded internally
    (752-wide live frames fall on this path: the XLA fallback costs ~9x on
    the 6-channel rectification warp, scripts measured 2026-08)."""
    return jax.default_backend() == "tpu" and isinstance(y0, (int, float))


def homography_warp(
    img: jnp.ndarray,
    H: jnp.ndarray,
    out_height: int,
    out_width: int,
    x0: float = 0.0,
    y0: float = 0.0,
    impl: str = "auto",
):
    """Warp ``img [..., Hs, Ws]`` by homography ``H`` (output pixel -> source
    pixel) onto the grid ``x in [x0, x0+out_width)``, ``y in [y0,
    y0+out_height)``.

    Returns ``(warped [..., Ho, Wo], u, v)`` where (u, v) are the source
    coordinates of each output pixel — out-of-image samples are
    clamp-extended; callers mask with (u, v) when that matters.

    ``impl``: 'auto' uses the banded Pallas resamplers on TPU when shapes
    permit, else the exact XLA tent-matmul path; 'xla' / 'pallas' force.
    """
    hs, ws = img.shape[-2], img.shape[-1]
    a, b, c = H[0, 0], H[0, 1], H[0, 2]
    d, e, f = H[1, 0], H[1, 1], H[1, 2]
    g, h, i = H[2, 0], H[2, 1], H[2, 2]

    yo = y0 + jnp.arange(out_height, dtype=jnp.float32)[:, None]   # [Ho, 1]
    xs = jnp.arange(ws, dtype=jnp.float32)[None, :]                # [1, Ws]

    # Pass 1 (vertical): for each source column X and output row yo, the row
    # to sample is q(X, yo) = v(x~, yo) where u(x~, yo) = X:
    #   x~ = (X (h yo + i) - b yo - c) / (a - X g)
    hy_i = h * yo + i
    x_t = (xs * hy_i - b * yo - c) / _safe(a - xs * g)             # [Ho, Ws]
    q = (d * x_t + e * yo + f) / _safe(g * x_t + hy_i)             # [Ho, Ws]
    # Pass 2 coordinates
    xo = x0 + jnp.arange(out_width, dtype=jnp.float32)[None, :]    # [1, Wo]
    u, v = homography_coords(H, xo, yo)

    use_pallas = impl == "pallas" or (
        impl == "auto" and _pallas_warp_ok(img, out_height, y0)
    )
    if use_pallas:
        from rpg_open_remode_tpu.ops import warp_pallas

        squeeze = img.ndim == 2
        img3 = img[None] if squeeze else img.reshape((-1,) + img.shape[-2:])
        n_ch = img3.shape[0]
        # ragged output heights: run the banded kernels on a rounded-up row
        # count and slice the result. Pad rows carry an OUT-OF-RANGE
        # coordinate sentinel (same pattern as the kernels' column padding)
        # so they are excluded from the per-block window extrema — padding
        # with replicated real coordinates inflates the last band's
        # `q - local_row` extent by up to pad_rows-1 and falsely trips the
        # span fit test to the XLA fallback (measured: the 3ch 720p
        # back-warp ran 5.4 ms instead of 0.3 because 48 pad rows pushed
        # band 11 past SPAN_V; pad-row outputs are discarded either way)
        band = warp_pallas.BAND
        ho_pad = -(-out_height // band) * band
        if ho_pad != out_height:
            pad_rows = ho_pad - out_height
            q_p = jnp.concatenate(
                [q, jnp.full((pad_rows, q.shape[1]), -1.0, q.dtype)]
            )
            u_p = jnp.concatenate(
                [
                    jnp.broadcast_to(u, (out_height, out_width)),
                    jnp.full((pad_rows, out_width), -1.0, u.dtype),
                ]
            )
        else:
            q_p = q
            u_p = jnp.broadcast_to(u, (out_height, out_width))
        mid = warp_pallas.resample_rows_pallas(img3, q_p, n_ch, hs, ws)
        out = warp_pallas.resample_cols_pallas(mid, u_p, n_ch, ws, out_width)
        out = out[:, :out_height]
        out = out[0] if squeeze else out.reshape(img.shape[:-2] + out.shape[-2:])
        return out, u, v

    mid = resample_rows(img, q)                                    # [..., Ho, Ws]
    out = resample_cols(mid, u)                                    # [..., Ho, Wo]
    return out, u, v


def warp_grid(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Resample ``img [H, W]`` at an arbitrary smooth coordinate grid
    ``(u, v)`` via the two 1-D passes (vertical then horizontal).

    For non-projective warps this separation is approximate — the vertical
    pass samples at v(x, y) instead of v(u(x, y), y), an error of order
    ``dv/dx * (u - x)`` — negligible for the near-identity smooth warps it
    is meant for (lens undistortion remaps, depthmap.cpp:45-61,95-106).
    Exact homographies should use ``homography_warp``; the 4-tap gather
    (``bilinear_gather``) is exact for anything but ~40x slower on TPU.
    """
    ho, wo = u.shape
    mid = resample_rows(img, v) if jax.default_backend() != "tpu" else None
    if mid is None:
        from rpg_open_remode_tpu.ops import warp_pallas

        img3 = img[None]
        band = warp_pallas.BAND
        ho_pad = -(-ho // band) * band
        # out-of-range sentinel pad rows: see homography_warp (replicated
        # coordinates would inflate the last band's fit-test extent)
        v_p = v if ho_pad == ho else jnp.concatenate(
            [v, jnp.full((ho_pad - ho, v.shape[1]), -1.0, v.dtype)]
        )
        u_p = u if ho_pad == ho else jnp.concatenate(
            [u, jnp.full((ho_pad - ho, u.shape[1]), -1.0, u.dtype)]
        )
        mid = warp_pallas.resample_rows_pallas(
            img3, v_p, 1, img.shape[0], img.shape[1]
        )
        out = warp_pallas.resample_cols_pallas(mid, u_p, 1, img.shape[1], wo)
        return out[0, :ho]
    return resample_cols(mid, u)


def bilinear_gather(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain 4-tap bilinear gather (clamp addressing). SLOW on TPU (~13 ms
    per 640x480 image) — oracle/testing use only; hot paths go through the
    two-pass matmul resamplers above."""
    h, w = img.shape[-2], img.shape[-1]
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, w - 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    i00 = img[..., v0, u0]
    i01 = img[..., v0, u1]
    i10 = img[..., v1, u0]
    i11 = img[..., v1, u1]
    top = i00 + fu * (i01 - i00)
    bot = i10 + fu * (i11 - i10)
    return top + fv * (bot - top)


# ---------------------------------------------------------------------------
# Camera / plane helpers
# ---------------------------------------------------------------------------


def _mat3(rows) -> jnp.ndarray:
    """3x3 from scalar entries via stacks — jnp.array over nested lists with
    literal rows bakes hidden array constants into the trace, which jax
    hoists as extra executable parameters (and mis-dispatches across traces
    of identical computations)."""
    return jnp.stack([jnp.stack([jnp.asarray(e, jnp.float32) for e in r]) for r in rows])


def intrinsic_matrix(cam) -> jnp.ndarray:
    return _mat3(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]]
    )


def intrinsic_inv(cam) -> jnp.ndarray:
    return _mat3(
        [
            [1.0 / cam.fx, 0.0, -cam.cx / cam.fx],
            [0.0, 1.0 / cam.fy, -cam.cy / cam.fy],
            [0.0, 0.0, 1.0],
        ]
    )


def infinite_homography(R: jnp.ndarray, t: jnp.ndarray, cam):
    """(A, e) with A = K R K^-1 (infinite homography) and e = K t (epipole
    direction), for the fronto-parallel plane family H_w = A + w e [0 0 1]
    mapping reference pixels to current-frame pixels at inverse z-depth w."""
    K = intrinsic_matrix(cam)
    A = K @ R @ intrinsic_inv(cam)
    e = K @ t
    return A, e


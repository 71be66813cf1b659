"""Two-pass warp: XLA tent-matmul resamplers vs gather oracle, and the
banded Pallas resamplers vs the XLA path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpg_open_remode_tpu.utils import warp


def _smooth_image(h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(20):
        cy, cx = rng.rand() * h, rng.rand() * w
        s = 8 + 20 * rng.rand()
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)).astype(
            np.float32
        )
    return img


def _rect_like_H(theta=0.02, tx=5.0, ty=-3.0, scale=1.01):
    """A rectification-shaped homography: small rotation + offset + scale."""
    c, s = np.cos(theta), np.sin(theta)
    return jnp.asarray(
        np.array(
            [[scale * c, -s, tx], [s, scale * c, ty], [2e-6, -1e-6, 1.0]],
            np.float32,
        )
    )


class TestXlaWarp:
    def test_matches_bilinear_gather(self):
        img = jnp.asarray(_smooth_image(96, 128))
        H = _rect_like_H()
        out, u, v = warp.homography_warp(img, H, 96, 128, impl="xla")
        oracle = warp.bilinear_gather(img, u, v)
        inside = (np.asarray(u) > 1) & (np.asarray(u) < 126) & \
                 (np.asarray(v) > 1) & (np.asarray(v) < 94)
        err = np.abs(np.asarray(out) - np.asarray(oracle))[inside]
        assert err.max() < 1e-4, err.max()

    def test_multichannel_shares_weights(self):
        img = jnp.stack([jnp.asarray(_smooth_image(96, 128, s)) for s in range(3)])
        H = _rect_like_H()
        out, _, _ = warp.homography_warp(img, H, 96, 128, impl="xla")
        for ch in range(3):
            single, _, _ = warp.homography_warp(img[ch], H, 96, 128, impl="xla")
            np.testing.assert_allclose(
                np.asarray(out[ch]), np.asarray(single), atol=1e-6
            )

    def test_shift_origin_equals_explicit_window(self):
        """Folding a (possibly traced) window origin into the homography
        (warp.shift_origin, used by the sharded band warps to stay on the
        fast static-origin path) must sample identically to passing the
        origin explicitly."""
        img = jnp.asarray(_smooth_image(96, 128))
        H = _rect_like_H()
        for x0, y0 in [(-8.0, 24.0), (5.0, 0.0), (0.0, -3.5)]:
            want, u0, v0 = warp.homography_warp(
                img, H, 48, 96, x0=x0, y0=y0, impl="xla"
            )
            got, u1, v1 = warp.homography_warp(
                img, warp.shift_origin(H, jnp.float32(x0), jnp.float32(y0)),
                48, 96, impl="xla",
            )
            np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(u0), np.asarray(u1),
                                       atol=1e-4)
            np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                       atol=1e-4)


class TestPallasWarp:
    @pytest.mark.parametrize(
        "shape",
        [(128, 256, 128, 256), (128, 256, 128, 384), (160, 256, 96, 256)],
    )
    def test_matches_xla(self, shape):
        """Banded shift-resampling kernels (interpret mode on CPU) must match
        the exact XLA path for rectification-like warps."""
        hs, ws, ho, wo = shape
        img = jnp.stack(
            [jnp.asarray(_smooth_image(hs, ws, s)) for s in range(2)]
        )
        H = _rect_like_H(theta=0.03, tx=12.0, ty=-6.0, scale=1.02)
        want, u, v = warp.homography_warp(img, H, ho, wo, x0=-8.0, impl="xla")
        got, _, _ = warp.homography_warp(img, H, ho, wo, x0=-8.0, impl="pallas")
        # compare where the sample lands inside the source (outside is
        # clamp-extended identically but span-window clamping may differ)
        inside = (np.asarray(u) > 2) & (np.asarray(u) < ws - 3) & \
                 (np.asarray(v) > 2) & (np.asarray(v) < hs - 3)
        err = np.abs(np.asarray(got) - np.asarray(want))[:, inside]
        assert err.max() < 1e-3, err.max()

    def test_wide_span_variant_for_moderate_rotation(self):
        """A moderate rotation overflows the narrow tap window but fits the
        wide one — the middle branch of the span cascade must still match
        the exact XLA path."""
        hs, ws = 128, 256
        img = jnp.asarray(_smooth_image(hs, ws, 7))
        H = _rect_like_H(theta=0.14, tx=4.0, ty=2.0, scale=1.0)
        want, u, v = warp.homography_warp(img, H, hs, ws, impl="xla")
        got, _, _ = warp.homography_warp(img, H, hs, ws, impl="pallas")
        inside = (np.asarray(u) > 2) & (np.asarray(u) < ws - 3) & \
                 (np.asarray(v) > 2) & (np.asarray(v) < hs - 3)
        err = np.abs(np.asarray(got) - np.asarray(want))[inside]
        assert err.max() < 1e-3, err.max()

    def test_span_guard_falls_back_for_strong_rotation(self):
        """Offsets of a strongly rotated warp overflow the banded kernels'
        tap window; the runtime guard must fall back to the exact XLA path,
        keeping impl='pallas' == impl='xla'. theta must overflow BOTH
        passes' wide variants ((1-cos t)*ws > SPAN_U[-1] horizontally,
        sin(t)*CBW > SPAN_V[-1] vertically) — 0.9 rad clears the 64-tap
        horizontal span introduced for the 1080p-class wide warps."""
        hs, ws = 128, 256
        img = jnp.asarray(_smooth_image(hs, ws, 4))
        H = _rect_like_H(theta=0.9, tx=0.0, ty=0.0, scale=1.0)
        want, _, _ = warp.homography_warp(img, H, hs, ws, impl="xla")
        got, _, _ = warp.homography_warp(img, H, hs, ws, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)

    @pytest.mark.parametrize("shape", [(240, 320, 240, 320), (128, 320, 96, 320)])
    def test_non_cbw_width(self, shape):
        """Widths that are not 128-column multiples must pad internally
        (a dropped-tail bug here only manifested at 320-wide images)."""
        hs, ws, ho, wo = shape
        img = jnp.stack([jnp.asarray(_smooth_image(hs, ws, s)) for s in range(2)])
        H = _rect_like_H(theta=0.02, tx=4.0, ty=-2.0, scale=1.01)
        want, u, v = warp.homography_warp(img, H, ho, wo, impl="xla")
        got, _, _ = warp.homography_warp(img, H, ho, wo, impl="pallas")
        inside = (np.asarray(u) > 2) & (np.asarray(u) < ws - 3) & \
                 (np.asarray(v) > 2) & (np.asarray(v) < hs - 3)
        err = np.abs(np.asarray(got) - np.asarray(want))[:, inside]
        assert err.max() < 1e-3, err.max()

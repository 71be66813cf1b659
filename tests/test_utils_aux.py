"""Auxiliary-subsystem tests: Scharr gradients vs a scipy oracle
(test/sobel.cu analog), pyramid builder, the profiling harness, the
epipolar inspector (epipolar_test.cpp analog), depth colorizer, and the
undistortion remap (depthmap.cpp:45-61,95-106 analog)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from rpg_open_remode_tpu.utils import image_ops, profiling, visualize


class TestScharr:
    def test_matches_scipy_oracle(self):
        """Scharr x/y gradients vs scipy.ndimage.correlate with the same
        kernel and nearest (clamp) boundary — interior must match exactly,
        mirroring the reference's OpenCV-oracle test
        (test/device_image_test.cpp:158-283)."""
        rng = np.random.default_rng(7)
        img = rng.random((40, 56)).astype(np.float32)
        kx = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32)
        got_x = np.asarray(image_ops.scharr_x(jnp.asarray(img)))
        want_x = ndimage.correlate(img, kx, mode="nearest")
        np.testing.assert_allclose(got_x, want_x, atol=1e-4)
        got_y = np.asarray(image_ops.scharr_y(jnp.asarray(img)))
        want_y = ndimage.correlate(img, kx.T, mode="nearest")
        np.testing.assert_allclose(got_y, want_y, atol=1e-4)

    def test_gradient_magnitude_flat_is_zero(self):
        flat = jnp.full((16, 16), 0.7)
        assert float(jnp.max(image_ops.gradient_magnitude(flat))) < 1e-5


class TestPyramid:
    def test_downsample_box_average(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        d = np.asarray(image_ops.downsample2(img))
        assert d.shape == (2, 2)
        assert d[0, 0] == pytest.approx((0 + 1 + 4 + 5) / 4)

    def test_pyramid_levels(self):
        img = jnp.zeros((64, 96))
        lv = image_ops.pyramid(img, 3)
        assert [x.shape for x in lv] == [(64, 96), (32, 48), (16, 24)]


class TestProfiling:
    def test_timer_stats(self):
        t = profiling.Timer()
        for _ in range(3):
            with t.measure():
                pass
        r = t.report()
        assert r["n"] == 3 and r["mean_s"] >= 0.0

    def test_metrics_log_ndjson(self, tmp_path):
        p = tmp_path / "m.ndjson"
        log = profiling.MetricsLog(str(p))
        log.log(0, {"converged": jnp.float32(5), "note": "x"})
        log.close()
        import json

        row = json.loads(p.read_text().strip())
        assert row == {"frame": 0, "converged": 5.0, "note": "x"}

    def test_amortized_nonnegative(self):
        x = jnp.ones((64, 64))
        per = profiling.Timer.amortized(lambda i: x * (i + 1), n=4, repeats=1)
        assert per >= 0.0


class TestEpipolarInspector:
    def test_line_passes_through_gt_correspondence(self, small_frames):
        """The drawn epipolar line of a ref pixel must contain its GT match
        in the current image (the invariant a human checks by eye in the
        reference's interactive tool)."""
        from rpg_open_remode_tpu.utils.camera import PinholeCamera

        cam = PinholeCamera.create(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        ref, curr = small_frames[0], small_frames[4]
        T_wr = np.concatenate([ref.T_world_curr, [[0, 0, 0, 1]]])
        T_wc = np.concatenate([curr.T_world_curr, [[0, 0, 0, 1]]])
        T_curr_ref = (np.linalg.inv(T_wc) @ T_wr)[:3]

        K = np.array(
            [[120.3, 0, 79.5], [0, -120.0, 59.5], [0, 0, 1.0]]
        )
        F = visualize.fundamental_matrix(T_curr_ref, K)
        x, y = 80, 60
        d = float(ref.depth[y, x])
        f = np.linalg.inv(K) @ [x, y, 1.0]
        p = T_curr_ref[:, :3] @ (f * d) + T_curr_ref[:, 3]
        u = K[0, 0] * p[0] / p[2] + K[0, 2]
        v = K[1, 1] * p[1] / p[2] + K[1, 2]
        line = F @ [x, y, 1.0]
        dist = abs(line @ [u, v, 1.0]) / np.hypot(line[0], line[1])
        assert dist < 0.5, dist

        img = visualize.epipolar_pair(
            ref.image, curr.image, T_curr_ref, cam, [(x, y)], depths=[d]
        )
        assert img.shape == (120, 320, 3)
        assert (img == [255, 0, 0]).all(-1).any()   # line drawn
        assert (img == [0, 255, 0]).all(-1).any()   # pick drawn

    def test_colorize_depth(self):
        d = np.linspace(1.0, 2.0, 100).reshape(10, 10)
        rgb = visualize.colorize_depth(d)
        assert rgb.shape == (10, 10, 3) and rgb.dtype == np.uint8
        assert not (rgb[0, 0] == rgb[-1, -1]).all()
        masked = visualize.colorize_depth(d, mask=np.zeros_like(d, bool))
        assert (masked == 0).all()


class TestUndistortion:
    def test_identity_when_no_distortion(self):
        from rpg_open_remode_tpu.models.depthmap import Depthmap

        eng = Depthmap(64, 48, fx=50.0, cx=31.5, fy=-49.0, cy=23.5)
        rng = np.random.default_rng(3)
        img = rng.random((48, 64)).astype(np.float32)
        eng.init_undistortion_map(0.0, 0.0, 0.0, 0.0)
        out = np.asarray(eng.input_image(img))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_radial_distortion_matches_numpy_model(self):
        """The remap grid must implement the plumb-bob model: undistorted
        output pixel samples the distorted source coordinate."""
        from rpg_open_remode_tpu.models.depthmap import undistort_map
        from rpg_open_remode_tpu.utils.camera import PinholeCamera

        cam = PinholeCamera.create(fx=50.0, fy=-49.0, cx=31.5, cy=23.5)
        k1, k2, p1, p2 = 0.08, -0.01, 0.001, -0.002
        gu, gv = undistort_map(48, 64, cam, k1, k2, p1, p2)
        # numpy oracle at a few probe pixels
        for (yy, xx) in [(10, 20), (24, 32), (40, 55)]:
            x = (xx - 31.5) / 50.0
            y = (yy - 23.5) / -49.0
            r2 = x * x + y * y
            radial = 1 + k1 * r2 + k2 * r2 * r2
            xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
            yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
            assert float(gu[yy, xx]) == pytest.approx(50.0 * xd + 31.5, abs=1e-3)
            assert float(gv[yy, xx]) == pytest.approx(-49.0 * yd + 23.5, abs=1e-3)


class TestWarpGrid:
    def test_matches_gather_for_undistortion_remap(self):
        """The two-pass grid warp must match the exact 4-tap gather on a
        realistic lens-undistortion field (smooth, near-identity)."""
        import jax.numpy as jnp

        from rpg_open_remode_tpu.models.depthmap import undistort_map
        from rpg_open_remode_tpu.utils import warp as warp_ops
        from rpg_open_remode_tpu.utils.camera import PinholeCamera

        rng = np.random.default_rng(5)
        h, w = 96, 128
        # smooth image (separation error scales with image gradients)
        img = np.zeros((h, w), np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        for _ in range(15):
            cy, cx = rng.random() * h, rng.random() * w
            s = 6 + 15 * rng.random()
            img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)).astype(np.float32)
        cam = PinholeCamera.create(fx=100.0, fy=-99.0, cx=(w - 1) / 2, cy=(h - 1) / 2)
        gu, gv = undistort_map(h, w, cam, 0.06, -0.01, 0.001, -0.001)
        got = np.asarray(warp_ops.warp_grid(jnp.asarray(img), gu, gv))
        want = np.asarray(warp_ops.bilinear_gather(jnp.asarray(img), gu, gv))
        interior = np.zeros((h, w), bool)
        interior[4:-4, 4:-4] = True
        err = np.abs(got - want)[interior]
        assert err.max() < 0.02 * img.max(), err.max()

"""Unit tests: SE3, camera, interpolation, triangulation vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from rpg_open_remode_tpu.utils import se3, interp
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.ops import triangulation

import oracles


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    return se3.from_quat_t(q[0], q[1], q[2], q[3], t[0], t[1], t[2])


class TestSE3:
    def test_quat_rotation_orthonormal(self, rng):
        T = np.asarray(random_pose(rng))
        R = T[:, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)

    def test_identity_quat(self):
        T = np.asarray(se3.from_quat_t(1, 0, 0, 0, 1, 2, 3))
        np.testing.assert_allclose(T[:, :3], np.eye(3), atol=1e-7)
        np.testing.assert_allclose(T[:, 3], [1, 2, 3], atol=1e-7)

    def test_inv_compose(self, rng):
        T = random_pose(rng)
        I = np.asarray(se3.compose(T, se3.inv(T)))
        np.testing.assert_allclose(I, np.asarray(se3.identity()), atol=1e-6)

    def test_apply_matches_matrix(self, rng):
        T = random_pose(rng)
        p = rng.normal(size=(7, 3)).astype(np.float32)
        got = np.asarray(se3.apply(T, p))
        Tn = np.asarray(T)
        want = p @ Tn[:, :3].T + Tn[:, 3]
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_compose_associative_with_numpy(self, rng):
        A, B = random_pose(rng), random_pose(rng)
        An, Bn = np.asarray(A), np.asarray(B)
        want_R = An[:, :3] @ Bn[:, :3]
        want_t = An[:, :3] @ Bn[:, 3] + An[:, 3]
        got = np.asarray(se3.compose(A, B))
        np.testing.assert_allclose(got[:, :3], want_R, atol=1e-6)
        np.testing.assert_allclose(got[:, 3], want_t, atol=1e-6)


class TestCamera:
    def test_roundtrip(self):
        cam = PinholeCamera.create(481.2, -480.0, 319.5, 239.5)
        u = jnp.array([10.0, 320.0, 631.5])
        v = jnp.array([5.0, 240.0, 470.2])
        xyz = cam.cam2world(u, v) * 2.7  # arbitrary depth scaling
        u2, v2 = cam.world2cam(xyz)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-4)

    def test_one_pix_angle(self):
        cam = PinholeCamera.create(481.2, -480.0, 319.5, 239.5)
        assert float(cam.one_pix_angle()) == pytest.approx(
            2 * np.arctan2(1.0, 2 * 481.2), abs=1e-7
        )

    def test_bearing_grid_normalized(self):
        cam = PinholeCamera.create(100.0, -90.0, 31.5, 23.5)
        f = np.asarray(cam.bearing_grid(48, 64))
        assert f.shape == (3, 48, 64)
        np.testing.assert_allclose(np.linalg.norm(f, axis=0), 1.0, atol=1e-6)
        # center pixel looks straight ahead
        np.testing.assert_allclose(f[:, 23, 31], [0.005, 0.0, 1.0] / np.linalg.norm([0.005, 0, 1]), atol=1e-2)


class TestInterp:
    def test_bilinear_matches_oracle(self, rng):
        img = rng.random((17, 23)).astype(np.float32)
        xs = rng.uniform(-2, 25, size=50)
        ys = rng.uniform(-2, 19, size=50)
        got = np.asarray(interp.bilinear(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys)))
        want = np.array([oracles.bilinear(img, x, y) for x, y in zip(xs, ys)])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bilinear_exact_at_integers(self, rng):
        img = rng.random((9, 11)).astype(np.float32)
        got = np.asarray(
            interp.bilinear(jnp.asarray(img), jnp.arange(11.0), jnp.full(11, 4.0))
        )
        np.testing.assert_allclose(got, img[4], atol=0)

    def test_box_sum_matches_oracle(self, rng):
        img = rng.random((20, 30)).astype(np.float32)
        got = np.asarray(interp.box_sum(jnp.asarray(img), 5, -2))
        want, _ = oracles.template_stats(img, 5)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestTriangulation:
    def test_recovers_known_point(self, rng):
        # Ground truth: a point seen from two cameras
        pt_ref = np.array([0.3, -0.2, 2.0], np.float32)
        T_ref_curr = random_pose(rng)
        T_curr_ref = se3.inv(T_ref_curr)
        pt_curr = np.asarray(se3.apply(T_curr_ref, pt_ref))
        f_ref = pt_ref / np.linalg.norm(pt_ref)
        f_curr = pt_curr / np.linalg.norm(pt_curr)
        got = np.asarray(
            triangulation.triangulate_midpoint(
                jnp.asarray(f_ref), jnp.asarray(f_curr), T_ref_curr
            )
        )
        np.testing.assert_allclose(got, pt_ref, atol=1e-4)

    def test_matches_oracle_field(self, rng):
        n = 32
        f_ref = rng.normal(size=(n, 3)).astype(np.float32)
        f_ref /= np.linalg.norm(f_ref, axis=1, keepdims=True)
        f_curr = rng.normal(size=(n, 3)).astype(np.float32)
        f_curr /= np.linalg.norm(f_curr, axis=1, keepdims=True)
        T = random_pose(rng)
        got = np.asarray(
            triangulation.triangulate_midpoint(jnp.asarray(f_ref), jnp.asarray(f_curr), T)
        )
        Tn = np.asarray(T)
        for i in range(n):
            want = oracles.triangulate(f_ref[i], f_curr[i], Tn[:, :3], Tn[:, 3])
            np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=2e-4)

    def test_uncertainty_matches_oracle(self, rng):
        f = np.array([0.1, 0.05, 1.0], np.float32)
        f /= np.linalg.norm(f)
        t = np.array([0.2, 0.01, 0.02], np.float32)
        one_pix = 2 * np.arctan2(1.0, 2 * 481.2)
        for z in [0.8, 1.5, 3.0]:
            got = float(
                triangulation.triangulation_uncertainty(
                    jnp.asarray(z, jnp.float32), jnp.asarray(f), jnp.asarray(t), one_pix
                )
            )
            want = oracles.triangulation_uncertainty(z, f, t, one_pix)
            assert got == pytest.approx(want, rel=1e-3)
            assert got > 0

    def test_uncertainty_shrinks_with_baseline(self):
        f = np.array([0.0, 0.0, 1.0], np.float32)
        one_pix = 2 * np.arctan2(1.0, 2 * 481.2)
        taus = [
            float(
                triangulation.triangulation_uncertainty(
                    jnp.asarray(1.5, jnp.float32),
                    jnp.asarray(f),
                    jnp.asarray([bl, 0.0, 0.0], jnp.float32),
                    one_pix,
                )
            )
            for bl in [0.05, 0.1, 0.3]
        ]
        assert taus[0] > taus[1] > taus[2] > 0

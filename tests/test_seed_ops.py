"""Tests for seed init/check/update and the TV-L1 denoiser vs numpy oracles.

Mirrors the reference test strategy (SURVEY.md section 4): CPU
reimplementations as oracles, init-value invariants, state-machine
invariants.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.ops import seed_init, seed_check, denoise
from rpg_open_remode_tpu.utils.camera import PinholeCamera

import oracles

CFG = RemodeConfig()


@pytest.fixture(scope="module")
def ref_state(rng=None):
    rng = np.random.default_rng(7)
    img = rng.random((40, 60)).astype(np.float32)
    cam = PinholeCamera.create(50.0, -49.0, 29.5, 19.5)
    state = empty_state(40, 60, cam)
    scene = SceneParams.create(0.8, 2.8, CFG)
    T = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1).astype(jnp.float32)
    return seed_init.init_seeds(state, jnp.asarray(img), T, scene, CFG), img, scene


class TestSeedInit:
    def test_init_invariants(self, ref_state):
        """seed_matrix_test.cpp:101-110 analog: exact init values."""
        state, _, scene = ref_state
        rng_d = float(scene.max_depth - scene.min_depth)
        np.testing.assert_allclose(np.asarray(state.mu), (0.8 + 2.8) / 2, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(state.sigma_sq), rng_d * rng_d / 36.0, rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(state.a), 10.0)
        np.testing.assert_allclose(np.asarray(state.b), 10.0)
        assert np.all(np.asarray(state.conv) == int(ConvergenceState.UPDATE))

    def test_template_stats_vs_oracle(self, ref_state):
        """seed_matrix_test.cpp:121-150 analog: 5x5 NCC template stats."""
        state, img, _ = ref_state
        want_sum, want_denom = oracles.template_stats(img, 5)
        np.testing.assert_allclose(np.asarray(state.sum_templ), want_sum, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(state.const_templ_denom), want_denom, rtol=1e-3, atol=1e-4
        )

    def test_denom_nonnegative_on_flat_patch(self):
        """Catastrophic-cancellation regression: flat image -> denom == 0,
        never negative (the reference needs float64 for this,
        seed_init.cu:53-54; we use the stable variance form)."""
        img = jnp.full((20, 20), 0.73125, jnp.float32)
        _, denom = seed_init.template_stats(img, CFG)
        assert np.all(np.asarray(denom) >= 0.0)
        np.testing.assert_allclose(np.asarray(denom), 0.0, atol=1e-6)


class TestSeedCheck:
    def test_classify_vs_oracle(self):
        rng = np.random.default_rng(11)
        h, w = 24, 30
        mu = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
        sigma_sq = rng.uniform(0.0, 0.01, (h, w)).astype(np.float32)
        a = rng.uniform(0.5, 50.0, (h, w)).astype(np.float32)
        b = rng.uniform(0.5, 50.0, (h, w)).astype(np.float32)
        epsilon = 0.002
        border = seed_check.border_mask(h, w, CFG)
        got = np.asarray(
            seed_check.classify_seeds(
                jnp.asarray(mu), jnp.asarray(sigma_sq), jnp.asarray(a),
                jnp.asarray(b), jnp.float32(epsilon), border, CFG,
            )
        )
        want = oracles.classify(mu, sigma_sq, a, b, epsilon, CFG.eta_inlier,
                                CFG.eta_outlier, CFG.patch_side)
        np.testing.assert_array_equal(got, want)

    def test_border_ring(self):
        border = np.asarray(seed_check.border_mask(30, 40, CFG))
        assert border[0, 0] and border[4, 20] and border[20, 35]
        assert not border[5, 5] and not border[24, 34]
        assert border[25, 20] and border[20, 35]


class TestSeedUpdateMoments:
    def test_posterior_moments_vs_oracle(self):
        """Vectorized Bayes update equals the per-seed oracle formulas."""
        from rpg_open_remode_tpu.ops.seed_update import _normpdf

        rng = np.random.default_rng(5)
        n = 64
        mu = rng.uniform(1.0, 2.0, n).astype(np.float32)
        sigma_sq = rng.uniform(0.001, 0.1, n).astype(np.float32)
        a = rng.uniform(5, 20, n).astype(np.float32)
        b = rng.uniform(5, 20, n).astype(np.float32)
        depth = rng.uniform(1.0, 2.0, n).astype(np.float32)
        tau_sq = rng.uniform(0.0001, 0.01, n).astype(np.float32)
        depth_range = 2.0

        # Evaluate the same closed-form expressions the kernel applies
        s_sq = (tau_sq * sigma_sq) / (tau_sq + sigma_sq)
        m = s_sq * (mu / sigma_sq + depth / tau_sq)
        c1 = (a / (a + b)) * np.asarray(
            _normpdf(jnp.asarray(depth), jnp.asarray(mu), jnp.asarray(sigma_sq + tau_sq))
        )
        c2 = (b / (a + b)) / depth_range
        nc = c1 + c2
        c1, c2 = c1 / nc, c2 / nc
        f = c1 * ((a + 1) / (a + b + 1)) + c2 * (a / (a + b + 1))
        e = c1 * ((a + 1) * (a + 2)) / ((a + b + 1) * (a + b + 2)) + c2 * (
            a * (a + 1) / ((a + b + 1) * (a + b + 2))
        )
        got_mu = c1 * m + c2 * mu
        got_sig = c1 * (s_sq + m * m) + c2 * (sigma_sq + mu * mu) - got_mu * got_mu
        got_a = (e - f) / (f - e / f)
        got_b = got_a * (1 - f) / f

        for i in range(n):
            w_mu, w_sig, w_a, w_b = oracles.seed_update_single(
                mu[i], sigma_sq[i], a[i], b[i], depth[i], tau_sq[i], depth_range
            )
            assert got_mu[i] == pytest.approx(w_mu, rel=1e-4)
            assert got_sig[i] == pytest.approx(w_sig, rel=1e-3, abs=1e-7)
            assert got_a[i] == pytest.approx(w_a, rel=1e-3)
            assert got_b[i] == pytest.approx(w_b, rel=1e-3)


class TestDenoise:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(13)
        h, w = 20, 26
        mu = rng.uniform(1.0, 2.0, (h, w)).astype(np.float32)
        a = rng.uniform(5, 20, (h, w)).astype(np.float32)
        b = rng.uniform(5, 20, (h, w)).astype(np.float32)
        sigma_sq = rng.uniform(0.001, 0.05, (h, w)).astype(np.float32)
        depth_range = 1.7
        got = np.asarray(
            denoise.denoise(
                jnp.asarray(mu), jnp.asarray(a), jnp.asarray(b),
                jnp.asarray(sigma_sq), jnp.float32(depth_range), CFG,
                lam=0.5, iterations=30,
            )
        )
        want = oracles.tvl1_denoise(mu, a, b, sigma_sq, depth_range, 0.5, 30)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_smooths_noise(self):
        """Denoised field has lower total variation than the input."""
        rng = np.random.default_rng(17)
        h, w = 40, 40
        clean = np.fromfunction(lambda y, x: 1.5 + 0.3 * np.sin(x / 9.0), (h, w))
        noisy = (clean + rng.normal(0, 0.05, (h, w))).astype(np.float32)
        a = np.full((h, w), 20.0, np.float32)
        b = np.full((h, w), 5.0, np.float32)
        sigma_sq = np.full((h, w), 0.001, np.float32)
        out = np.asarray(
            denoise.denoise(
                jnp.asarray(noisy), jnp.asarray(a), jnp.asarray(b),
                jnp.asarray(sigma_sq), jnp.float32(1.0), CFG,
                lam=0.7, iterations=150,
            )
        )
        tv = lambda im: np.abs(np.diff(im, axis=0)).sum() + np.abs(np.diff(im, axis=1)).sum()
        assert tv(out) < 0.5 * tv(noisy)
        rmse_in = np.sqrt(np.mean((noisy - clean) ** 2))
        rmse_out = np.sqrt(np.mean((out - clean) ** 2))
        assert rmse_out < rmse_in

    def test_pallas_matches_xla(self):
        """The fused all-in-VMEM Pallas kernel and the pure-XLA fori_loop
        implementation must agree to float tolerance."""
        import dataclasses

        rng = np.random.default_rng(23)
        h, w = 24, 32
        mu = rng.uniform(1.0, 2.0, (h, w)).astype(np.float32)
        a = rng.uniform(5, 20, (h, w)).astype(np.float32)
        b = rng.uniform(5, 20, (h, w)).astype(np.float32)
        sigma_sq = rng.uniform(0.001, 0.05, (h, w)).astype(np.float32)
        args = (
            jnp.asarray(mu), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(sigma_sq), jnp.float32(1.7),
        )
        got = np.asarray(
            denoise.denoise(
                *args,
                dataclasses.replace(CFG, use_pallas=True, pallas_interpret=True),
                lam=0.5, iterations=20,
            )
        )
        want = np.asarray(
            denoise.denoise(*args, dataclasses.replace(CFG, use_pallas=False),
                            lam=0.5, iterations=20)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_tiled_pallas_matches_xla(self):
        """The banded chunked-iteration kernel (frames beyond the VMEM cap,
        ops/denoise_pallas.tvl1_pallas_tiled) must agree with the XLA loop:
        band interiors are exact when the halo is >= 2 rows per chunked
        iteration. Covers multiple bands, a non-band-multiple height, and a
        remainder chunk (37 = 16 + 16 + 5)."""
        from rpg_open_remode_tpu.ops import denoise_pallas

        rng = np.random.default_rng(29)
        h, w = 150, 256          # 3 bands of 64 (padded to 192)
        mu = rng.uniform(1.0, 2.0, (h, w)).astype(np.float32)
        a = rng.uniform(5, 20, (h, w)).astype(np.float32)
        b = rng.uniform(5, 20, (h, w)).astype(np.float32)
        sigma_sq = rng.uniform(0.001, 0.05, (h, w)).astype(np.float32)
        large_sigma_sq = 1.7 * 1.7 * CFG.large_sigma_sq_factor
        g = denoise.compute_weights(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(sigma_sq), large_sigma_sq
        )
        lam = jnp.float32(0.5)
        got = np.asarray(
            denoise_pallas.tvl1_pallas_tiled(
                jnp.asarray(mu), g, lam, 37, CFG, chunk_iters=16
            )
        )

        u = u_head = jnp.asarray(mu)
        p_x = p_y = jnp.zeros_like(u)
        for _ in range(37):
            u, u_head, p_x, p_y = denoise.tvl1_iteration(
                u, u_head, p_x, p_y, jnp.asarray(mu), g, lam, CFG
            )
        np.testing.assert_allclose(got, np.asarray(u), rtol=1e-5, atol=1e-6)


class TestDepthPropagation:
    """Keyframe-to-keyframe warm start (ops/propagate.py, beyond-reference):
    propagated priors must be accurate where declared valid, and a
    propagating engine must converge a new keyframe faster than the
    reference's flat restart."""

    def _run_keyframe(self, frames, cfg, n_updates):
        from rpg_open_remode_tpu.models.depthmap import Depthmap

        f0 = frames[0]
        d = f0.depth[np.isfinite(f0.depth)]
        eng = Depthmap(160, 120, fx=120.3, cx=79.5, fy=-120.0, cy=59.5,
                       cfg=cfg)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
        for fr in frames[1 : 1 + n_updates]:
            eng.update(fr.image, Tcw(fr))
        return eng, Tcw

    def test_prior_accuracy_where_valid(self):
        from rpg_open_remode_tpu.models.state import SceneParams
        from rpg_open_remode_tpu.ops import propagate
        from rpg_open_remode_tpu.utils import synthetic
        from rpg_open_remode_tpu.utils.camera import PinholeCamera

        cam_p = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=40, width=160, height=120,
                                    cam=cam_p, seed=4)
        cfg = RemodeConfig(num_planes=96)
        eng, Tcw = self._run_keyframe(frames, cfg, 30)

        new = frames[31]
        d_new = new.depth[np.isfinite(new.depth)]
        scene = SceneParams.create(d_new.min(), d_new.max(), cfg)
        cam = PinholeCamera.create(**cam_p)
        mu_p, sig_p, a_p, b_p, valid = propagate.propagate_depth(
            eng.state, jnp.asarray(Tcw(new)), scene, cam, cfg
        )
        valid = np.asarray(valid)
        assert valid.mean() > 0.15, valid.mean()
        err = np.abs(np.asarray(mu_p) - new.depth)[valid & np.isfinite(new.depth)]
        rng = float(d_new.max() - d_new.min())
        # priors must sit well inside their own +-3 sigma band
        assert np.median(err) < 0.05 * rng, (np.median(err), rng)
        band = 3.0 * np.sqrt(np.asarray(sig_p))[valid & np.isfinite(new.depth)]
        assert (err < band).mean() > 0.9, (err < band).mean()

    def test_warm_start_narrows_uncertainty_faster(self):
        """After a keyframe switch with a short life (the fast-motion
        shape), the propagating engine must have far more low-uncertainty
        seeds than the flat restart, at equal-or-better accuracy. (Full
        CONVERGED-state counts also need the Beta inlier ratio to clear
        eta_inlier, which takes ~25 updates on this small scene either way
        — the eval on the real scene measures that end to end.)"""
        from rpg_open_remode_tpu.utils import synthetic

        cam_p = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=36, width=160, height=120,
                                    cam=cam_p, seed=4)
        stats = {}
        for flag in (False, True):
            cfg = RemodeConfig(num_planes=96, propagate_depth=flag)
            eng, Tcw = self._run_keyframe(frames, cfg, 24)
            new = frames[26]
            d_new = new.depth[np.isfinite(new.depth)]
            eng.set_reference_image(new.image, Tcw(new),
                                    d_new.min(), d_new.max())
            for fr in frames[27:35]:
                eng.update(fr.image, Tcw(fr))
            st = eng.state
            eps = float(np.asarray(st.scene.epsilon))
            low = np.asarray(st.sigma_sq) < 4.0 * eps
            m = low & np.isfinite(new.depth)
            err = np.abs(np.asarray(st.mu) - new.depth)[m]
            rng = float(d_new.max() - d_new.min())
            stats[flag] = (int(low.sum()),
                           float(np.median(err)) / rng if m.any() else np.inf)
        n_flat, e_flat = stats[False]
        n_prop, e_prop = stats[True]
        assert n_prop > 1.5 * max(n_flat, 1), stats
        assert e_prop < max(1.5 * e_flat, 0.02), stats

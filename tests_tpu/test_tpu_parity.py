"""Real-TPU parity: Mosaic-lowered Pallas kernels vs their XLA formulations.

tests/ pins kernel *semantics* in interpret mode on CPU; this suite pins the
actual TPU lowering (lane rotations, banded-matmul box sums, DMA pipelines,
all-iterations-in-VMEM loops) that the bench otherwise covers only
end-to-end. Skipped automatically off-TPU (see conftest.py).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.depthmap import Depthmap
from rpg_open_remode_tpu.ops import denoise, denoise_pallas
from rpg_open_remode_tpu.utils import synthetic

CAM = dict(fx=240.6, fy=-240.0, cx=159.5, cy=119.5)


def _fetch(x):
    return np.asarray(x)


def _run_engine(frames, cfg):
    f0 = frames[0]
    d = f0.depth[np.isfinite(f0.depth)]
    eng = Depthmap(320, 240, fx=CAM["fx"], cx=CAM["cx"], fy=CAM["fy"],
                   cy=CAM["cy"], cfg=cfg)

    def Tcw(fr):
        T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
        return np.linalg.inv(T)[:3].astype(np.float32)

    eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
    for fr in frames[1:]:
        eng.update(fr.image, Tcw(fr))
    return eng


class TestEnginePallasParity:
    """Full update pipeline (fwd warps + Pallas sweep + back-warp) vs the
    pure-XLA sweep, on hardware."""

    @pytest.fixture(scope="class")
    def engines(self):
        # 30 frames: convergence ramps nonlinearly — 12 updates can
        # legitimately leave every 320x240 seed still UPDATING.
        frames = synthetic.generate(n_frames=30, width=320, height=240,
                                    cam=CAM, seed=3)
        ep = _run_engine(frames, RemodeConfig(use_pallas=True))
        ex = _run_engine(frames, RemodeConfig(use_pallas=False))
        return ep, ex

    def test_flagship_convergence_absolute(self, engines):
        """Absolute health pin on hardware, not just Pallas/XLA relative
        agreement: after 29 updates the 320x240 flagship flow must be well
        converged (the verify drive's healthy signal is >40%)."""
        ep, _ = engines
        pct = ep.converged_percentage()
        assert pct > 40.0, f"converged only {pct:.1f}%"

    def test_convergence_state_agreement(self, engines):
        ep, ex = engines
        cp, cx = _fetch(ep.state.conv), _fetch(ex.state.conv)
        agree = (cp == cx).mean()
        assert agree > 0.98, f"conv maps agree only {agree:.3f}"

    def test_depth_agreement(self, engines):
        ep, ex = engines
        both = (
            (_fetch(ep.state.conv) == int(ConvergenceState.CONVERGED))
            & (_fetch(ex.state.conv) == int(ConvergenceState.CONVERGED))
        )
        assert both.mean() > 0.1, "too few jointly-converged pixels"
        dmu = np.abs(_fetch(ep.state.mu) - _fetch(ex.state.mu))[both]
        assert np.median(dmu) < 1e-3, float(np.median(dmu))
        assert (dmu < 0.01).mean() > 0.99, float((dmu < 0.01).mean())


class TestPatch9SweepParity:
    """Mosaic lowering of the GENERALIZED sweep kernel (9x9 box sums, the
    focal-scaled HD default of RemodeConfig.for_camera) vs the XLA sweep,
    on hardware — the 5x5 classes above don't touch the widened band
    matrices / x-windows."""

    CAM2X = dict(fx=481.2, fy=-480.0, cx=159.5, cy=119.5)

    def _run(self, frames, cfg):
        f0 = frames[0]
        d = f0.depth[np.isfinite(f0.depth)]
        eng = Depthmap(320, 240, fx=self.CAM2X["fx"], cx=self.CAM2X["cx"],
                       fy=self.CAM2X["fy"], cy=self.CAM2X["cy"], cfg=cfg)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
        for fr in frames[1:]:
            eng.update(fr.image, Tcw(fr))
        return eng

    def test_patch9_engine_parity(self):
        frames = synthetic.generate(n_frames=24, width=320, height=240,
                                    cam=self.CAM2X, seed=3)
        cfg_p = RemodeConfig(patch_side=9, num_planes=255, disp_pad=256,
                             use_pallas=True)
        cfg_x = dataclasses.replace(cfg_p, use_pallas=False)
        ep = self._run(frames, cfg_p)
        ex = self._run(frames, cfg_x)
        cp, cx = _fetch(ep.state.conv), _fetch(ex.state.conv)
        agree = (cp == cx).mean()
        assert agree > 0.98, f"conv maps agree only {agree:.3f}"
        both = (
            (cp == int(ConvergenceState.CONVERGED))
            & (cx == int(ConvergenceState.CONVERGED))
        )
        assert both.mean() > 0.05, "too few jointly-converged pixels"
        dmu = np.abs(_fetch(ep.state.mu) - _fetch(ex.state.mu))[both]
        assert np.median(dmu) < 1e-3, float(np.median(dmu))
        assert (dmu < 0.01).mean() > 0.99, float((dmu < 0.01).mean())


class TestDenoisePallasParity:
    def _inputs(self, h, w, seed=5):
        rng = np.random.default_rng(seed)
        mu = rng.uniform(1.0, 2.0, (h, w)).astype(np.float32)
        a = rng.uniform(5, 20, (h, w)).astype(np.float32)
        b = rng.uniform(5, 20, (h, w)).astype(np.float32)
        sig = rng.uniform(0.001, 0.05, (h, w)).astype(np.float32)
        return (jnp.asarray(mu), jnp.asarray(a), jnp.asarray(b),
                jnp.asarray(sig), jnp.float32(1.7))

    def test_fused_vmem_kernel(self):
        args = self._inputs(240, 320)
        cfg_p = RemodeConfig(use_pallas=True)
        cfg_x = RemodeConfig(use_pallas=False)
        got = _fetch(denoise.denoise(*args, cfg_p, lam=0.5, iterations=50))
        want = _fetch(denoise.denoise(*args, cfg_x, lam=0.5, iterations=50))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_tiled_kernel_hd(self):
        """1280x720 exceeds the all-in-VMEM cap: the banded chunked kernel
        must match the XLA loop AND beat it by >=10x (VERDICT r1 item 8)."""
        h, w = 720, 1280
        args = self._inputs(h, w, seed=9)
        mu, a, b, sig, rng_ = args
        assert not denoise_pallas.fits_vmem(h, w)
        cfg_p = RemodeConfig(use_pallas=True)
        cfg_x = RemodeConfig(use_pallas=False)

        got = _fetch(denoise.denoise(*args, cfg_p, lam=0.5, iterations=200))
        want = _fetch(denoise.denoise(*args, cfg_x, lam=0.5, iterations=200))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

        # marginal device time over chained calls (utils/profiling.Timer)
        from rpg_open_remode_tpu.utils.profiling import Timer

        t_pal = Timer.amortized(
            lambda j: denoise.denoise(mu, a, b, sig, rng_, cfg_p,
                                      lam=0.5 + 1e-4 * j, iterations=200),
            n=6, repeats=2,
        )
        t_xla = Timer.amortized(
            lambda j: denoise.denoise(mu, a, b, sig, rng_, cfg_x,
                                      lam=0.5 + 1e-4 * j, iterations=200),
            n=6, repeats=2,
        )
        print(f"tiled {1000*t_pal:.1f} ms vs XLA {1000*t_xla:.1f} ms "
              f"({t_xla/max(t_pal,1e-9):.1f}x)")
        assert t_pal < t_xla / 10.0, (t_pal, t_xla)


class TestWarpPallasParity:
    def test_resample_rows_and_cols(self):
        from rpg_open_remode_tpu.ops import warp_pallas
        from rpg_open_remode_tpu.utils import warp as warp_xla

        rng = np.random.default_rng(11)
        hs, w = 256, 384
        img = rng.standard_normal((2, hs, w)).astype(np.float32)
        ho = 192
        # smooth per-row source coordinates (shear + bow), well inside range
        y = np.arange(ho, dtype=np.float32)[:, None]
        x = np.arange(w, dtype=np.float32)[None, :]
        q = (8.0 + 0.9 * y + 4.0 * np.sin(x / 90.0)).astype(np.float32)

        got = _fetch(warp_pallas.resample_rows_pallas(
            jnp.asarray(img), jnp.asarray(q), 2, hs, w))
        want = _fetch(warp_xla.resample_rows(jnp.asarray(img), jnp.asarray(q)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        h, ws = 192, 384
        img2 = rng.standard_normal((2, h, ws)).astype(np.float32)
        wo = 256
        yy = np.arange(h, dtype=np.float32)[:, None]
        xx = np.arange(wo, dtype=np.float32)[None, :]
        u = (6.0 + 1.1 * xx + 3.0 * np.sin(yy / 60.0)).astype(np.float32)
        got2 = _fetch(warp_pallas.resample_cols_pallas(
            jnp.asarray(img2), jnp.asarray(u), 2, ws, wo))
        want2 = _fetch(warp_xla.resample_cols(jnp.asarray(img2), jnp.asarray(u)))
        np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-4)

    def test_non_cbw_source_width_752(self):
        """752-wide sources (the live-camera width, not a 128-column
        multiple) must take the banded Pallas path via internal padding and
        match the exact XLA resampler inside the source footprint — pins
        the gate relaxation in warp._pallas_warp_ok on real hardware."""
        from rpg_open_remode_tpu.ops import rect_match
        from rpg_open_remode_tpu.utils import se3, warp as warp_ops
        from rpg_open_remode_tpu.utils.camera import PinholeCamera

        W, H = 752, 480
        cam_kw = dict(fx=481.2, fy=-480.0, cx=(W - 1) / 2, cy=(H - 1) / 2)
        frames = synthetic.generate(n_frames=3, width=W, height=H, seed=1,
                                    cam=cam_kw)
        cam = PinholeCamera.create(**cam_kw)
        T = np.linalg.inv(np.concatenate(
            [frames[2].T_world_curr, [[0, 0, 0, 1]]]))[:3].astype(np.float32)
        T_curr_ref = se3.compose(jnp.asarray(T),
                                 jnp.asarray(frames[0].T_world_curr))
        g = rect_match.rect_geometry(T_curr_ref, cam, H, W)
        img = jnp.asarray(np.stack([frames[0].image] * 3))
        want, u, v = warp_ops.homography_warp(
            img, g["H_rect_to_ref"], g["rect_h"], g["rect_w"], impl="xla")
        got, _, _ = warp_ops.homography_warp(
            img, g["H_rect_to_ref"], g["rect_h"], g["rect_w"], impl="pallas")
        inside = (np.asarray(u) > 2) & (np.asarray(u) < W - 3) & \
                 (np.asarray(v) > 2) & (np.asarray(v) < H - 3)
        assert inside.mean() > 0.5
        err = np.abs(_fetch(got) - _fetch(want))[:, inside]
        assert err.max() < 1e-3, err.max()

    def test_wide_span_variants(self):
        """Per-window offsets that overflow the narrow tap windows must take
        the wide variants (and still match the exact XLA path) — pins the
        span cascade's middle branch on real Mosaic lowering."""
        from rpg_open_remode_tpu.ops import warp_pallas
        from rpg_open_remode_tpu.utils import warp as warp_xla

        rng = np.random.default_rng(13)
        hs, w = 256, 384
        img = rng.standard_normal((2, hs, w)).astype(np.float32)
        ho = 192
        y = np.arange(ho, dtype=np.float32)[:, None]
        x = np.arange(w, dtype=np.float32)[None, :]
        # strong bow: per-(band, col-block) row span ~25 (+ alignment
        # rounding) — above SPAN_V[0]-1.5, below SPAN_V[1]-1.5
        q = (30.0 + 0.85 * y + 8.0 * np.sin(x / 45.0)).astype(np.float32)
        got = _fetch(warp_pallas.resample_rows_pallas(
            jnp.asarray(img), jnp.asarray(q), 2, hs, w))
        want = _fetch(warp_xla.resample_rows(jnp.asarray(img), jnp.asarray(q)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

        h, ws = 192, 384
        wo = 256
        img2 = rng.standard_normal((2, h, ws)).astype(np.float32)
        yy = np.arange(h, dtype=np.float32)[:, None]
        xx = np.arange(wo, dtype=np.float32)[None, :]
        # per-band column span ~42 — above SPAN_U[0]-1.5, below SPAN_U[1]-1.5
        u = (48.0 + 1.0 * xx + 22.0 * np.sin(yy / 25.0)).astype(np.float32)
        got2 = _fetch(warp_pallas.resample_cols_pallas(
            jnp.asarray(img2), jnp.asarray(u), 2, ws, wo))
        want2 = _fetch(warp_xla.resample_cols(jnp.asarray(img2), jnp.asarray(u)))
        np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-4)

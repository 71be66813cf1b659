"""Matcher + end-to-end pipeline tests on the synthetic ray-traced sequence.

The synthetic scene provides exact ground truth, replacing the reference's
traj_over_table dataset tests (SURVEY.md section 4): matched positions are
checked against analytic GT correspondences, and the full Bayesian pipeline
must converge toward GT depth.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.ops import epipolar, seed_init
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera

CAM_SMALL = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)


def make_cam():
    return PinholeCamera.create(**CAM_SMALL)


def setup_state(frames, cfg):
    cam = make_cam()
    f0 = frames[0]
    h, w = f0.image.shape
    state = empty_state(h, w, cam)
    d = f0.depth[np.isfinite(f0.depth)]
    scene = SceneParams.create(d.min(), d.max(), cfg)
    T_world_ref = jnp.asarray(f0.T_world_curr)
    state = seed_init.init_seeds(
        state, jnp.asarray(f0.image), T_world_ref, scene, cfg
    )
    return state, cam


def gt_correspondence(frame_ref, frame_curr, cam):
    """Analytic GT match position of every ref pixel in the curr frame."""
    T_world_ref = np.concatenate([frame_ref.T_world_curr, [[0, 0, 0, 1]]])
    T_world_curr = np.concatenate([frame_curr.T_world_curr, [[0, 0, 0, 1]]])
    T_curr_ref = np.linalg.inv(T_world_curr) @ T_world_ref
    h, w = frame_ref.image.shape
    f = np.asarray(cam.bearing_grid(h, w)).transpose(1, 2, 0)  # [H,W,3]
    pts_ref = f * frame_ref.depth[..., None]
    pts_curr = pts_ref @ T_curr_ref[:3, :3].T + T_curr_ref[:3, 3]
    u = float(cam.fx) * pts_curr[..., 0] / pts_curr[..., 2] + float(cam.cx)
    v = float(cam.fy) * pts_curr[..., 1] / pts_curr[..., 2] + float(cam.cy)
    return u, v, np.asarray(T_curr_ref[:3], np.float32)


@pytest.fixture(scope="module")
def frames():
    from rpg_open_remode_tpu.utils import synthetic

    return synthetic.generate(n_frames=12, width=160, height=120, cam=CAM_SMALL, seed=3)


class TestMatchers:
    @pytest.mark.parametrize("mode", ["rect", "sweep", "walk"])
    def test_match_near_gt(self, frames, mode):
        """With a wide-open search band, matched positions should land near
        the analytic GT correspondence for confident (high-NCC) pixels."""
        cfg = RemodeConfig(match_mode=mode, num_planes=96)
        state, cam = setup_state(frames, cfg)
        curr = frames[6]  # ~0.14 m baseline
        u_gt, v_gt, T_curr_ref = gt_correspondence(frames[0], curr, cam)

        res = epipolar.match(
            state, jnp.asarray(curr.image), jnp.asarray(T_curr_ref), cam, cfg
        )
        found = np.asarray(res.found)
        ncc = np.asarray(res.best_ncc)
        uu, vv = np.asarray(res.u), np.asarray(res.v)

        h, w = curr.image.shape
        interior = np.zeros((h, w), bool)
        interior[10:-10, 10:-10] = True
        confident = found & interior & (ncc > 0.85)
        assert confident.mean() > 0.25, f"too few confident matches: {confident.mean()}"
        err = np.hypot(uu - u_gt, vv - v_gt)[confident]
        # sub-2px median match error against analytic GT
        assert np.median(err) < 2.0, f"median match error {np.median(err)}"

    @pytest.mark.parametrize("fast_mode", ["rect", "sweep"])
    def test_sweep_agrees_with_walk(self, frames, fast_mode):
        """The TPU-native matchers and the reference-semantics walk must find
        compatible matches where both are confident."""
        curr = frames[4]
        results = {}
        for mode in [fast_mode, "walk"]:
            cfg = RemodeConfig(match_mode=mode, num_planes=127)
            state, cam = setup_state(frames, cfg)
            _, _, T_curr_ref = gt_correspondence(frames[0], curr, cam)
            results[mode] = epipolar.match(
                state, jnp.asarray(curr.image), jnp.asarray(T_curr_ref), cam, cfg
            )
        s, wk = results[fast_mode], results["walk"]
        both = (
            np.asarray(s.found)
            & np.asarray(wk.found)
            & (np.asarray(s.best_ncc) > 0.9)
            & (np.asarray(wk.best_ncc) > 0.9)
        )
        h, w = curr.image.shape
        interior = np.zeros((h, w), bool)
        interior[10:-10, 10:-10] = True
        both &= interior
        assert both.mean() > 0.2
        du = np.asarray(s.u) - np.asarray(wk.u)
        dv = np.asarray(s.v) - np.asarray(wk.v)
        err = np.hypot(du, dv)[both]
        assert np.median(err) < 1.5, f"sweep/walk disagree: median {np.median(err)}"

    def test_tumble_motion_agrees_with_walk(self):
        """Strong mixed rotation + diagonal translation (the reference's walk
        handles arbitrary motion, epipolar_match.cu:63-96): the rectified
        matcher must keep finding matches the walk oracle agrees with, and
        the warp resamplers' wide-tap-window variants must hold up."""
        from rpg_open_remode_tpu.utils import synthetic

        cam_p = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=8, width=160, height=120,
                                    cam=cam_p, seed=6, motion="tumble")
        curr = frames[5]
        results = {}
        for mode in ["rect", "walk"]:
            cfg = RemodeConfig(match_mode=mode, num_planes=96)
            cam = PinholeCamera.create(**cam_p)
            f0 = frames[0]
            state = empty_state(120, 160, cam)
            d = f0.depth[np.isfinite(f0.depth)]
            scene = SceneParams.create(d.min(), d.max(), cfg)
            state = seed_init.init_seeds(
                state, jnp.asarray(f0.image), jnp.asarray(f0.T_world_curr),
                scene, cfg,
            )
            T = np.concatenate([curr.T_world_curr, [[0, 0, 0, 1]]])
            T_curr_world = np.linalg.inv(T)[:3].astype(np.float32)
            T_curr_ref = se3.compose(
                jnp.asarray(T_curr_world), state.T_world_ref
            )
            results[mode] = epipolar.match(
                state, jnp.asarray(curr.image), jnp.asarray(T_curr_ref),
                cam, cfg,
            )
        s, wk = results["rect"], results["walk"]
        both = (
            np.asarray(s.found) & np.asarray(wk.found)
            & (np.asarray(s.best_ncc) > 0.9)
            & (np.asarray(wk.best_ncc) > 0.9)
        )
        interior = np.zeros((120, 160), bool)
        interior[10:-10, 10:-10] = True
        both &= interior
        assert both.mean() > 0.15, both.mean()
        err = np.hypot(
            (np.asarray(s.u) - np.asarray(wk.u))[both],
            (np.asarray(s.v) - np.asarray(wk.v))[both],
        )
        assert np.median(err) < 1.5, np.median(err)

    def test_forward_motion_fallback(self):
        """Dominantly axial motion (epipole inside the image) collapses
        stereo rectification; the matcher must auto-fall-back to the plane
        sweep and stay comparable to the reference-semantics walk
        (epipolar_match.cu:63-96 handles any motion direction)."""
        from rpg_open_remode_tpu.utils import synthetic

        fwd = synthetic.generate(n_frames=12, width=160, height=120,
                                 cam=CAM_SMALL, seed=4, motion="forward",
                                 step=0.046)
        curr = fwd[10]
        interior = np.zeros((120, 160), bool)
        interior[10:-10, 10:-10] = True

        out = {}
        for name, cfg in [
            ("auto", RemodeConfig(num_planes=96)),
            ("rect_raw", RemodeConfig(num_planes=96,
                                      forward_motion_fallback=False)),
            ("walk", RemodeConfig(num_planes=96, match_mode="walk")),
        ]:
            state, cam = setup_state(fwd, cfg)
            u_gt, v_gt, T_curr_ref = gt_correspondence(fwd[0], curr, cam)
            res = epipolar.match(
                state, jnp.asarray(curr.image), jnp.asarray(T_curr_ref),
                cam, cfg,
            )
            conf = (np.asarray(res.found) & interior
                    & (np.asarray(res.best_ncc) > 0.85))
            err = np.hypot(np.asarray(res.u) - u_gt,
                           np.asarray(res.v) - v_gt)
            out[name] = (conf.mean(),
                         float(np.median(err[conf])) if conf.any() else np.inf)

        # the fallback must engage and match the walk's coverage/accuracy
        assert out["auto"][0] > 0.7 * out["walk"][0], out
        assert out["auto"][1] < 2.0, out
        # and the raw rectified sweep must be demonstrably broken here
        # (guards against the dispatch silently taking the rect branch)
        assert out["rect_raw"][0] < 0.5 * out["auto"][0], out

    def test_degenerate_zero_baseline_self_match(self, frames):
        """epipolar_test.cpp:138-225 analog: same frame, same pose. Every
        pixel must end in a legal state, and any UPDATE pixel's match must
        land on its own coordinates."""
        cfg = RemodeConfig(num_planes=64)
        state, cam = setup_state(frames, cfg)
        T_ident = np.asarray(se3.identity())
        res = epipolar.match(
            state, jnp.asarray(frames[0].image), jnp.asarray(T_ident), cam, cfg
        )
        found = np.asarray(res.found)
        uu, vv = np.asarray(res.u), np.asarray(res.v)
        h, w = frames[0].image.shape
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        ok = found & (np.asarray(state.const_templ_denom) > 1e-6)
        interior = np.zeros((h, w), bool)
        interior[6:-6, 6:-6] = True
        ok &= interior
        if ok.any():
            err = np.hypot(uu - xx, vv - yy)[ok]
            assert np.percentile(err, 90) < 0.1


class TestPipeline:
    def test_convergence_over_sequence(self):
        """Full engine over the synthetic sequence: seeds must converge and
        converged depths must be accurate (north-star accuracy analog:
        paper section IV reports >60% of converged seeds within 2.6% of the
        depth range)."""
        from rpg_open_remode_tpu.utils import synthetic

        frames = synthetic.generate(n_frames=40, width=160, height=120,
                                    cam=CAM_SMALL, seed=3)
        cfg = RemodeConfig(num_planes=96)
        f0 = frames[0]
        h, w = f0.image.shape
        d = f0.depth[np.isfinite(f0.depth)]
        engine = dm.Depthmap(w, h, CAM_SMALL["fx"], CAM_SMALL["cx"],
                             CAM_SMALL["fy"], CAM_SMALL["cy"], cfg=cfg)
        T_world_ref = np.concatenate([f0.T_world_curr, [[0, 0, 0, 1]]])
        engine.set_reference_image(
            f0.image, np.linalg.inv(T_world_ref)[:3], d.min(), d.max()
        )
        for fr in frames[1:]:
            T_world_curr = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            stats = engine.update(fr.image, np.linalg.inv(T_world_curr)[:3])

        conv = engine.convergence_map()
        mu = engine.depthmap()
        converged = conv == int(ConvergenceState.CONVERGED)
        frac = converged.mean()
        assert frac > 0.15, f"only {frac:.1%} converged after {len(frames)-1} frames"

        err = np.abs(mu - f0.depth)[converged]
        depth_range = float(d.max() - d.min())
        rmse = np.sqrt(np.mean(err**2))
        assert rmse < 0.05 * depth_range, f"converged RMSE {rmse} vs range {depth_range}"
        # paper-style completeness: most converged seeds within 2.6% of range
        assert (err < 0.026 * depth_range).mean() > 0.6

    def test_all_states_legal(self, frames):
        cfg = RemodeConfig(num_planes=64)
        f0 = frames[0]
        h, w = f0.image.shape
        d = f0.depth[np.isfinite(f0.depth)]
        engine = dm.Depthmap(w, h, CAM_SMALL["fx"], CAM_SMALL["cx"],
                             CAM_SMALL["fy"], CAM_SMALL["cy"], cfg=cfg)
        T0 = np.concatenate([f0.T_world_curr, [[0, 0, 0, 1]]])
        engine.set_reference_image(f0.image, np.linalg.inv(T0)[:3], d.min(), d.max())
        T1 = np.concatenate([frames[2].T_world_curr, [[0, 0, 0, 1]]])
        engine.update(frames[2].image, np.linalg.inv(T1)[:3])
        conv = engine.convergence_map()
        legal = {int(s) for s in ConvergenceState}
        assert set(np.unique(conv)).issubset(legal)
        # border ring is exactly BORDER (seed_matrix_test.cpp:219-241 analog)
        assert np.all(conv[:5, :] == int(ConvergenceState.BORDER))
        assert np.all(conv[:, :5] == int(ConvergenceState.BORDER))
        assert np.all(conv[-5:, :] == int(ConvergenceState.BORDER))
        assert np.all(conv[:, -5:] == int(ConvergenceState.BORDER))


class TestPallasSweep:
    def test_pallas_matches_xla_sweep(self, frames):
        """The fused Pallas disparity sweep and the pure-XLA sweep implement
        identical math — matched positions and NCC must agree closely."""
        import dataclasses

        state_cfg = RemodeConfig(num_planes=64)
        state, cam = setup_state(frames, state_cfg)
        curr = frames[5]
        _, _, T_curr_ref = gt_correspondence(frames[0], curr, cam)
        res = {}
        for use in (True, False):
            cfg = dataclasses.replace(state_cfg, use_pallas=use, pallas_interpret=True)
            res[use] = epipolar.match(
                state, jnp.asarray(curr.image), jnp.asarray(T_curr_ref), cam, cfg
            )
        a, b = res[True], res[False]
        fa, fb = np.asarray(a.found), np.asarray(b.found)
        # found maps agree except knife-edge threshold cases
        assert (fa == fb).mean() > 0.995, (fa != fb).mean()
        both = fa & fb
        if both.any():
            # knife-edge peak ties between adjacent planes may differ by the
            # float summation order; bound the bulk, allow rare tie flips
            d_ncc = np.abs(
                np.asarray(a.best_ncc)[both] - np.asarray(b.best_ncc)[both]
            )
            assert np.quantile(d_ncc, 0.999) < 0.01, np.quantile(d_ncc, 0.999)
            assert (d_ncc > 0.05).mean() < 1e-3, d_ncc.max()
            err = np.hypot(
                (np.asarray(a.u) - np.asarray(b.u))[both],
                (np.asarray(a.v) - np.asarray(b.v))[both],
            )
            assert np.percentile(err, 95) < 0.1, np.percentile(err, 95)

    @pytest.mark.parametrize("patch_side", [5, 9])
    def test_pallas_block_skipping_band_layouts(self, patch_side):
        """Pathological per-pixel band layouts must not change results: the
        kernel's per-(band, tile) plane intervals, group rounding, and the
        dynamic pre-roll to the first group are pure skip optimizations.
        Exercises empty tiles, bands crossing tile seams, single-pixel
        stragglers, and tiles whose interval starts mid-group, against the
        XLA sweep that has no block skipping at all. patch_side=9 covers
        the generalized box sums of the focal-scaled HD default."""
        from rpg_open_remode_tpu.ops import rect_match, sweep_pallas

        rng = np.random.default_rng(7)
        rect_h, rect_w, pad, planes = 128, 512, 128, 127
        ref = rng.random((rect_h, rect_w), dtype=np.float32)
        # curr = ref shifted by a spatially varying integer disparity field
        # is unnecessary for parity — any curr exercises the same code
        curr_pad = rng.random((rect_h, rect_w + 2 * pad), dtype=np.float32)
        valid = np.ones((rect_h, rect_w), np.float32)
        xlim = np.tile(
            np.array([[-200.0, rect_w + 200.0]], np.float32), (rect_h, 1)
        )

        lo = np.full((rect_h, rect_w), np.inf, np.float32)
        hi = np.full((rect_h, rect_w), -np.inf, np.float32)
        # narrow bands around a depth-gradient-like ramp in one stripe
        ramp = np.linspace(5, 100, rect_w, dtype=np.float32)[None, :]
        lo[:40], hi[:40] = ramp - 2, ramp + 2
        # one single-pixel wide-band straggler inside an otherwise empty tile
        lo[70, 300], hi[70, 300] = 0.0, 120.0
        # a band interval starting mid-group, crossing a tile seam
        lo[90:110, 250:260], hi[90:110, 250:260] = 17.0, 23.0
        # rows whose interval sits at the top of the plane range
        lo[120:, :64], hi[120:, :64] = 120.0, 126.0

        args = [jnp.asarray(x) for x in (curr_pad, xlim, ref, valid, lo, hi)]
        cfg = RemodeConfig(num_planes=planes, pallas_interpret=True,
                           patch_side=patch_side)
        d_x, n_x, f_x = rect_match._sweep_xla(
            *args, cfg, num_planes=planes, pad=pad, subplane_refine=True
        )
        d_p, n_p, f_p = sweep_pallas.disparity_sweep(
            *args, cfg.ncc_threshold, planes, pad, cfg.patch_side, True
        )
        f_x, f_p = np.asarray(f_x) > 0.5, np.asarray(f_p) > 0.5
        assert (f_x == f_p).mean() > 0.999, (f_x != f_p).mean()
        both = f_x & f_p
        if both.any():
            assert np.allclose(
                np.asarray(d_p)[both], np.asarray(d_x)[both], atol=1e-3
            )

class TestProductionShapes:
    def test_update_step_traces_at_hd_sizes(self):
        """Shape/alignment handling at production resolutions (752x480 live,
        720p, 1080p): the rect grid, tile selection, warp blocking and the
        Pallas sweep geometry must all trace — eval_shape catches alignment
        asserts without paying HD compute on CPU."""
        import functools

        from rpg_open_remode_tpu.models.depthmap import update_step
        from rpg_open_remode_tpu.models.state import empty_state
        from rpg_open_remode_tpu.ops.rect_match import rect_shape

        for (w, h) in [(752, 480), (1280, 720), (1920, 1080)]:
            cam = PinholeCamera.create(
                fx=w * 0.75, fy=-h * 1.0, cx=(w - 1) / 2, cy=(h - 1) / 2
            )
            st = empty_state(h, w, cam)
            cfg = RemodeConfig()
            img = jax.ShapeDtypeStruct((h, w), jnp.uint8)
            T = jax.ShapeDtypeStruct((3, 4), jnp.float32)
            out = jax.eval_shape(
                functools.partial(update_step, cam=cam, cfg=cfg), st, img, T
            )
            rh, rw = rect_shape(h, w)
            assert rh % 64 == 0 and rw % 128 == 0, (w, h, rh, rw)
            assert out[0].mu.shape == (h, w)

    def test_disp_pad_is_padding_neutral(self):
        """A wider disparity window (cfg.disp_pad) with the same num_planes
        must be pure padding: identical posteriors to the default config."""
        import functools

        from rpg_open_remode_tpu.models.depthmap import update_step
        from rpg_open_remode_tpu.models.state import SceneParams, empty_state
        from rpg_open_remode_tpu.ops import seed_init
        from rpg_open_remode_tpu.utils import synthetic

        cam_kw = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        cam = PinholeCamera.create(**cam_kw)
        frames = synthetic.generate(n_frames=5, width=160, height=120,
                                    cam=cam_kw, seed=2)
        f0 = frames[0]
        d = f0.depth[np.isfinite(f0.depth)]

        def run(cfg):
            scene = SceneParams.create(d.min(), d.max(), cfg)
            st = seed_init.init_seeds(
                empty_state(120, 160, cam), jnp.asarray(f0.image),
                jnp.asarray(f0.T_world_curr), scene, cfg)
            for fr in frames[1:]:
                T = np.linalg.inv(np.concatenate(
                    [fr.T_world_curr, [[0, 0, 0, 1]]]))[:3].astype(np.float32)
                st, _ = jax.jit(
                    functools.partial(update_step, cam=cam, cfg=cfg)
                )(st, jnp.asarray(fr.image), jnp.asarray(T))
            return st

        base = RemodeConfig(num_planes=48)
        wide = dataclasses.replace(base, disp_pad=256)
        st_a, st_b = run(base), run(wide)
        np.testing.assert_array_equal(np.asarray(st_a.mu), np.asarray(st_b.mu))
        np.testing.assert_array_equal(
            np.asarray(st_a.conv), np.asarray(st_b.conv)
        )


class TestCameraConventions:
    @pytest.mark.parametrize("fx,fy", [(120.3, -120.0), (-120.3, 120.0),
                                       (120.3, 120.0)])
    def test_rect_matcher_any_focal_signs(self, fx, fy):
        """The rectified matcher must find accurate matches whatever the
        focal-length sign convention (the dataset camera has fy < 0; other
        stacks use fx < 0 or all-positive)."""
        from rpg_open_remode_tpu.utils import synthetic

        cam_p = dict(fx=fx, fy=fy, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=8, width=160, height=120,
                                    cam=cam_p, seed=3)
        cfg = RemodeConfig(num_planes=96)
        cam = PinholeCamera.create(**cam_p)
        f0 = frames[0]
        state = empty_state(120, 160, cam)
        d = f0.depth[np.isfinite(f0.depth)]
        scene = SceneParams.create(d.min(), d.max(), cfg)
        state = seed_init.init_seeds(
            state, jnp.asarray(f0.image), jnp.asarray(f0.T_world_curr),
            scene, cfg,
        )
        curr = frames[6]
        u_gt, v_gt, T_curr_ref = gt_correspondence_cam(frames[0], curr, cam)
        res = epipolar.match(
            state, jnp.asarray(curr.image), jnp.asarray(T_curr_ref), cam, cfg
        )
        found = np.asarray(res.found)
        ncc = np.asarray(res.best_ncc)
        interior = np.zeros((120, 160), bool)
        interior[10:-10, 10:-10] = True
        confident = found & interior & (ncc > 0.85)
        assert confident.mean() > 0.2, confident.mean()
        err = np.hypot(np.asarray(res.u) - u_gt, np.asarray(res.v) - v_gt)[confident]
        assert np.median(err) < 2.0, np.median(err)


def gt_correspondence_cam(frame_ref, frame_curr, cam):
    T_world_ref = np.concatenate([frame_ref.T_world_curr, [[0, 0, 0, 1]]])
    T_world_curr = np.concatenate([frame_curr.T_world_curr, [[0, 0, 0, 1]]])
    T_curr_ref = np.linalg.inv(T_world_curr) @ T_world_ref
    h, w = frame_ref.image.shape
    f = np.asarray(cam.bearing_grid(h, w)).transpose(1, 2, 0)
    pts_ref = f * frame_ref.depth[..., None]
    pts_curr = pts_ref @ T_curr_ref[:3, :3].T + T_curr_ref[:3, 3]
    u = float(cam.fx) * pts_curr[..., 0] / pts_curr[..., 2] + float(cam.cx)
    v = float(cam.fy) * pts_curr[..., 1] / pts_curr[..., 2] + float(cam.cy)
    return u, v, np.asarray(T_curr_ref[:3], np.float32)

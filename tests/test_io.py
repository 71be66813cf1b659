"""Tests for the IO layer: dataset loader (reference on-disk format),
native C++ runtime vs Python fallbacks, point-cloud export, checkpoint
round trip, and the keyframe lifecycle node."""

import os
import subprocess

import numpy as np
import pytest

from rpg_open_remode_tpu import native
from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.io import (
    Dataset,
    backproject_converged,
    convergence_overlay,
    load_state,
    save_pointcloud_ply,
    save_state,
)
from rpg_open_remode_tpu.io.dataset import quat_to_rotation


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """A tiny on-disk dataset in the exact reference layout
    (test/dataset.cpp: sequence file + images/ + depthmaps/)."""
    root = tmp_path_factory.mktemp("remode_ds")
    (root / "images").mkdir()
    (root / "depthmaps").mkdir()
    rng = np.random.default_rng(3)
    w, h = 32, 24
    lines = []
    for i in range(3):
        name = f"frame_{i:04d}.png"
        img = rng.integers(0, 255, (h, w), dtype=np.uint8)
        from PIL import Image

        Image.fromarray(img, mode="L").save(root / "images" / name)
        depth_cm = rng.uniform(80.0, 300.0, (h, w)).astype(np.float32)
        with open(root / "depthmaps" / f"frame_{i:04d}.depth", "w") as f:
            f.write(" ".join(f"{v:.3f}" for v in depth_cm.ravel()))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        lines.append(
            f"{name} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}"
        )
        if i == 0:
            ref = (img, depth_cm / 100.0, t.astype(np.float32), q.astype(np.float32))
    with open(root / "seq.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return root, ref, (w, h)


class TestDataset:
    def test_sequence_parse_and_read(self, fake_dataset):
        root, (img0, depth0, t0, q0), (w, h) = fake_dataset
        ds = Dataset("seq.txt", path=str(root))
        assert ds.read_data_sequence()
        assert len(ds) == 3
        e = ds[0]
        assert e.depthmap_file == "frame_0000.depth"
        np.testing.assert_allclose(e.translation, t0, rtol=1e-5)
        got_img = ds.read_image(e)
        np.testing.assert_array_equal(got_img, img0)
        got_depth = ds.read_depthmap(e, w, h)
        np.testing.assert_allclose(got_depth, depth0, atol=1e-4)

    def test_prefetcher_matches_synchronous_reads(self, fake_dataset):
        """FramePrefetcher must deliver the same frames in the same order as
        synchronous reads, and report missing-GT as None rather than dying."""
        from rpg_open_remode_tpu.io.dataset import FramePrefetcher

        root, _, (w, h) = fake_dataset
        ds = Dataset("seq.txt", path=str(root))
        assert ds.read_data_sequence()
        want = [
            (e, ds.read_image(e), ds.read_depthmap(e, w, h)) for e in ds
        ]
        pf = FramePrefetcher(ds, depth=2, gt_shape=(w, h))
        got = list(pf)
        pf.close()
        assert len(got) == len(want)
        for (we, wi, wd), (ge, gi, gd) in zip(want, got):
            assert ge.image_file == we.image_file
            np.testing.assert_array_equal(gi, wi)
            np.testing.assert_allclose(gd, wd, atol=1e-5)

    def test_prefetcher_propagates_worker_errors(self, fake_dataset):
        from rpg_open_remode_tpu.io.dataset import FramePrefetcher

        root, _, _ = fake_dataset
        ds = Dataset("seq.txt", path=str(root))
        assert ds.read_data_sequence()
        bad = Dataset("seq.txt", path=str(root / "nonexistent"))
        with pytest.raises(FileNotFoundError):
            list(FramePrefetcher(bad, ds, depth=2))

    def test_env_var_path(self, fake_dataset, monkeypatch):
        root, _, _ = fake_dataset
        monkeypatch.setenv("RMD_TEST_DATA_PATH", str(root))
        ds = Dataset("seq.txt")
        assert ds.load_path_from_env()
        assert ds.read_data_sequence(0, 2)
        assert len(ds) == 2

    def test_pose_convention(self, fake_dataset):
        """T_curr_world must invert T_world_curr (dataset_main.cpp:89)."""
        root, _, _ = fake_dataset
        ds = Dataset("seq.txt", path=str(root))
        ds.read_data_sequence()
        e = ds[1]
        A = np.concatenate([e.T_world_curr, [[0, 0, 0, 1]]])
        B = np.concatenate([e.T_curr_world, [[0, 0, 0, 1]]])
        np.testing.assert_allclose(A @ B, np.eye(4), atol=1e-5)

    def test_quat_rotation_orthonormal(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=4)
        R = quat_to_rotation(*q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)


GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "data", "golden_dataset")


class TestGoldenDataset:
    """Golden-bytes fixture in the exact reference on-disk format
    (test/dataset.cpp:94-186) with the edge cases a self-generated fake
    dataset never exercises: CRLF line endings, blank and short lines,
    trailing tokens after the pose, PGM comment lines / one-line headers,
    tab- and CRLF-separated .depth values, scientific notation."""

    def _load(self):
        ds = Dataset("first_2_frames_sequence.txt", path=GOLDEN)
        assert ds.read_data_sequence()
        return ds

    def test_sequence_bytes(self):
        ds = self._load()
        # blank and short lines are skipped (the reference would construct
        # garbage entries from them, dataset.cpp:100-117 — a deliberate
        # robustness divergence); trailing tokens are ignored like the
        # reference's stringstream extraction
        assert [e.image_file for e in ds] == [
            "frame_000.pgm", "frame_001.png", "frame_002.pgm"
        ]
        assert [e.depthmap_file for e in ds] == [
            "frame_000.depth", "frame_001.depth", "frame_002.depth"
        ]
        np.testing.assert_allclose(ds[0].translation, [0.1, -0.2, 1.5])
        np.testing.assert_allclose(ds[1].quaternion, [0.0, 0.1, 0.0, 0.9949874])
        # start/end line-window semantics (dataset.cpp:98-101): line
        # numbers count PHYSICAL lines, including skipped ones
        ds2 = Dataset("first_2_frames_sequence.txt", path=GOLDEN)
        assert ds2.read_data_sequence(2, 3)
        assert [e.image_file for e in ds2] == ["frame_001.png"]

    @pytest.mark.parametrize("force_python", [False, True])
    def test_images_bytes(self, force_python, monkeypatch):
        if force_python:
            monkeypatch.setattr(native, "get_lib", lambda: None)
        ds = self._load()
        np.testing.assert_array_equal(
            ds.read_image(ds[0]), np.load(os.path.join(GOLDEN, "expected_img0.npy"))
        )
        np.testing.assert_array_equal(
            ds.read_image(ds[1]), np.load(os.path.join(GOLDEN, "expected_img1.npy"))
        )
        np.testing.assert_array_equal(
            ds.read_image(ds[2]), np.load(os.path.join(GOLDEN, "expected_img2.npy"))
        )

    @pytest.mark.parametrize("force_python", [False, True])
    def test_depth_bytes(self, force_python, monkeypatch):
        if force_python:
            monkeypatch.setattr(native, "get_lib", lambda: None)
        ds = self._load()
        d0 = ds.read_depthmap(ds[0], 8, 6)
        np.testing.assert_allclose(
            d0, np.load(os.path.join(GOLDEN, "expected_depth0.npy")),
            rtol=1e-6,
        )
        d2 = ds.read_depthmap(ds[2], 8, 6)
        np.testing.assert_allclose(
            d2, np.load(os.path.join(GOLDEN, "expected_depth2.npy")),
            rtol=1e-6,
        )

    def test_missing_depth_raises(self):
        ds = self._load()
        with pytest.raises((FileNotFoundError, ValueError)):
            ds.read_depthmap(ds[1], 8, 6)   # frame_001.depth doesn't exist


class TestNative:
    def test_parse_float_file_native_vs_python(self, tmp_path):
        path = tmp_path / "vals.txt"
        rng = np.random.default_rng(1)
        vals = rng.uniform(0, 500, 1000).astype(np.float32)
        path.write_text("\n".join(f"{v:.4f}" for v in vals))
        lib = native.get_lib()
        got = native.parse_float_file(str(path), 1000, scale=0.01)
        np.testing.assert_allclose(got, np.round(vals, 4) * 0.01, rtol=1e-5)
        if lib is not None:
            # force the pure-python fallback and compare
            native._lib, native._tried = None, True
            try:
                got_py = native.parse_float_file(str(path), 1000, scale=0.01)
            finally:
                native._lib, native._tried = lib, True
            np.testing.assert_allclose(got, got_py, rtol=1e-6)

    def test_native_lib_builds(self):
        # the toolchain exists in this image, so the native path must load
        assert native.get_lib() is not None

    def test_pgm_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (17, 23), dtype=np.uint8)
        p = tmp_path / "img.pgm"
        with open(p, "wb") as f:
            f.write(b"P5\n# comment\n23 17\n255\n")
            f.write(img.tobytes())
        got = native.read_pgm(str(p))
        np.testing.assert_array_equal(got, img)

    def test_ply_write(self, tmp_path):
        xyz = np.arange(30, dtype=np.float32).reshape(10, 3)
        inten = np.linspace(0, 1, 10, dtype=np.float32)
        p = tmp_path / "cloud.ply"
        native.write_ply(str(p), xyz, inten)
        raw = p.read_bytes()
        header_end = raw.index(b"end_header\n") + len(b"end_header\n")
        assert b"element vertex 10" in raw[:header_end]
        body = np.frombuffer(raw[header_end:], "<f4").reshape(10, 4)
        np.testing.assert_allclose(body[:, :3], xyz)
        np.testing.assert_allclose(body[:, 3], inten)


def _converged_engine():
    from rpg_open_remode_tpu.models import depthmap as dm
    from rpg_open_remode_tpu.utils import synthetic

    cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
    frames = synthetic.generate(n_frames=32, width=160, height=120, cam=cam, seed=3)
    f0 = frames[0]
    d = f0.depth[np.isfinite(f0.depth)]
    eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"], cam["cy"],
                      cfg=RemodeConfig(num_planes=64))
    def Tcw(fr):
        T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
        return np.linalg.inv(T)[:3].astype(np.float32)
    eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
    for fr in frames[1:]:
        eng.update(fr.image, Tcw(fr))
    return eng, frames


class TestPointcloud:
    def test_backprojection_hits_gt_geometry(self):
        """World points of converged seeds must lie near the GT surface:
        back-project with GT depth and compare (publisher.cpp:69-87)."""
        eng, frames = _converged_engine()
        state = eng.state
        xyz, intensity = backproject_converged(state)
        assert xyz.shape[0] > 100
        assert np.isfinite(xyz).all()
        # oracle: back-project GT depths of the same pixels on the host
        conv = np.asarray(state.conv) == int(ConvergenceState.CONVERGED)
        f = np.asarray(state.f_ref).transpose(1, 2, 0)[conv]
        gt_d = frames[0].depth[conv]
        T = np.asarray(state.T_world_ref)
        pts_ref = f * gt_d[:, None]
        want = pts_ref @ T[:, :3].T + T[:, 3]
        err = np.linalg.norm(xyz - want, axis=1)
        assert np.median(err) < 0.05  # metres; mu ~ GT depth for converged

    def test_ply_export_and_overlay(self, tmp_path):
        eng, _ = _converged_engine()
        n = save_pointcloud_ply(str(tmp_path / "kf.ply"), eng.state)
        assert n > 0 and (tmp_path / "kf.ply").stat().st_size > 16 * n
        rgb = convergence_overlay(eng.state)
        assert rgb.shape == (120, 160, 3)
        conv = np.asarray(eng.state.conv)
        assert (rgb[conv == int(ConvergenceState.CONVERGED)] == [0, 0, 255]).all()

    def test_npz_export_matches_ply_points(self, tmp_path):
        from rpg_open_remode_tpu.io import save_pointcloud_npz

        eng, _ = _converged_engine()
        n = save_pointcloud_npz(str(tmp_path / "kf.npz"), eng.state)
        z = np.load(tmp_path / "kf.npz")
        assert z["xyz"].shape == (n, 3) and np.isfinite(z["xyz"]).all()

    def test_voxel_downsample_means(self):
        from rpg_open_remode_tpu.io import voxel_downsample

        # two clusters inside distinct 0.1-m voxels + one lone point
        xyz = np.array(
            [
                [0.01, 0.01, 0.01], [0.03, 0.02, 0.04],   # voxel (0,0,0)
                [0.51, 0.52, 0.53],                        # voxel (5,5,5)
                [-0.29, 0.0, 0.0],                         # voxel (-3,0,0)
            ],
            np.float32,
        )
        inten = np.array([0.2, 0.4, 0.6, 0.8], np.float32)
        out, oi = voxel_downsample(xyz, inten, 0.1)
        assert out.shape == (3, 3)
        # the merged cluster averages position and intensity
        i = np.argmin(np.linalg.norm(out - [0.02, 0.015, 0.025], axis=1))
        np.testing.assert_allclose(out[i], [0.02, 0.015, 0.025], atol=1e-6)
        np.testing.assert_allclose(oi[i], 0.3, atol=1e-6)
        # empty input passes through
        e_xyz, e_i = voxel_downsample(
            np.zeros((0, 3), np.float32), np.zeros((0,), np.float32), 0.1
        )
        assert e_xyz.shape == (0, 3) and e_i.shape == (0,)

    def test_node_publishes_convergence_every_n(self):
        """Mid-keyframe convergence publishing (publish_conv_every_n,
        depthmap_node.cpp:158-162): the registered consumer must receive
        RGB overlays at the configured cadence."""
        import dataclasses

        from rpg_open_remode_tpu.models.depthmap import Depthmap
        from rpg_open_remode_tpu.models.node import DepthmapNode
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=13, width=160, height=120,
                                    cam=cam, seed=5)
        cfg = dataclasses.replace(
            RemodeConfig(num_planes=48), publish_conv_every_n=4,
            max_dist_from_ref=100.0, ref_compl_perc=101.0,  # no switching
        )

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        eng = Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"], cam["cy"],
                       cfg=cfg)
        overlays = []
        node = DepthmapNode(eng, cfg=cfg, on_convergence=overlays.append)
        d0 = frames[0].depth[np.isfinite(frames[0].depth)]
        for fr in frames:
            node.process_frame(fr.image, Tcw(fr), float(d0.min()),
                               float(d0.max()))
        node.close()
        # 13 msgs, cadence 4 -> msgs 4, 8, 12 publish
        assert len(overlays) == 3, len(overlays)
        assert overlays[0].shape == (120, 160, 3)
        assert overlays[0].dtype == np.uint8

    def test_stagger_stats_collision_no_junk_keyframes(self):
        """When a forced stagger reseed and a policy-stride stats dispatch
        land on the SAME frame, the lagged policy must not finalize the
        freshly reseeded slot against the old keyframe's stats (the
        generation snapshot is taken before the reseed): no keyframe may
        complete with zero updates."""
        from rpg_open_remode_tpu.models.multikeyframe import (
            BatchedDepthmap, MultiKeyframeNode,
        )
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        # large steps so dist_from_ref exceeds 0.5 m quickly — the stale
        # stats would trip the distance rule if the guard were broken
        frames = synthetic.generate(n_frames=30, width=160, height=120,
                                    cam=cam, seed=5, step=0.08)
        cfg = RemodeConfig(num_planes=48)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        eng = BatchedDepthmap(2, 160, 120, cam["fx"], cam["cx"],
                              cam["fy"], cam["cy"], cfg=cfg)
        # stagger == policy_stride: every forced reseed collides with a
        # stats dispatch on the same frame
        node = MultiKeyframeNode(eng, policy_stride=6, stagger=6)
        d0 = frames[0].depth[np.isfinite(frames[0].depth)]
        for fr in frames:
            node.process_frame(fr.image, Tcw(fr), float(d0.min()),
                               float(d0.max()))
        node.close()
        for r in node.keyframes:
            assert r.n_updates > 0, "keyframe finalized with zero updates"

    def test_global_map_weighted_fusion_exact(self, monkeypatch):
        """Incremental fusion must hold exact running means: fusing 2 points
        then 1 point of the same voxel equals the mean of all 3 (prior voxel
        means re-enter weighted by their point counts, not as one point)."""
        from rpg_open_remode_tpu.io import GlobalMap, pointcloud as pc_mod

        clouds = iter([
            (np.array([[0.01, 0.0, 0.0], [0.05, 0.0, 0.0]], np.float32),
             np.array([0.1, 0.3], np.float32)),
            (np.array([[0.09, 0.0, 0.0]], np.float32),
             np.array([0.8], np.float32)),
        ])
        monkeypatch.setattr(
            pc_mod, "backproject_converged", lambda s, d: next(clouds)
        )
        gmap = GlobalMap(voxel=0.2)

        class R:
            state = None
            denoised_depth = None

        gmap.add_keyframe(R())
        gmap.add_keyframe(R())
        xyz, inten = gmap.cloud()
        assert xyz.shape == (1, 3)
        np.testing.assert_allclose(xyz[0], [0.05, 0.0, 0.0], atol=1e-7)
        np.testing.assert_allclose(inten[0], 0.4, atol=1e-7)

    def test_global_map_fuses_keyframes(self):
        """Two overlapping keyframes of the same surface must fuse into a
        bounded map: the fused point count stays near one keyframe's count
        (duplicates merge into shared voxels), and the map lies on the GT
        surface like the per-keyframe clouds do."""
        from rpg_open_remode_tpu.io import GlobalMap

        eng, frames = _converged_engine()

        class R:  # duck-typed KeyframeResult
            def __init__(self, state, depth):
                self.state = state
                self.denoised_depth = depth

        state = eng.state
        depth = np.asarray(state.mu)
        gmap = GlobalMap(voxel=0.02)
        gmap.add_keyframe(R(state, depth))
        n1 = gmap.cloud()[0].shape[0]
        assert n1 > 100
        # same keyframe again: a perfect overlap must not grow the map
        gmap.add_keyframe(R(state, depth))
        xyz2, inten2 = gmap.cloud()
        assert xyz2.shape[0] == n1
        assert gmap.n_keyframes == 2
        assert np.isfinite(xyz2).all() and np.isfinite(inten2).all()

    def test_scale_mat_display_normalization(self):
        """Depthmap.scale_mat mirrors the reference's display min-max
        normalization (depthmap.cpp:158-169)."""
        from rpg_open_remode_tpu.models.depthmap import Depthmap

        d = np.array([[1.0, 2.0], [3.0, 5.0]], np.float32)
        s = Depthmap.scale_mat(d)
        assert s.min() == 0.0 and s.max() == 1.0
        flat = Depthmap.scale_mat(np.full((2, 2), 7.0, np.float32))
        assert (flat == 0.0).all()


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        """Saving then loading must reproduce the state bitwise, and an
        update from the restored state must equal one from the original."""
        eng, frames = _converged_engine()
        p = str(tmp_path / "state.npz")
        save_state(p, eng.state)
        restored = load_state(p)
        import dataclasses as dc

        for f in dc.fields(eng.state):
            if f.name == "scene":
                continue
            np.testing.assert_array_equal(
                np.asarray(getattr(eng.state, f.name)),
                np.asarray(getattr(restored, f.name)),
                err_msg=f.name,
            )
        # continuation equivalence
        from rpg_open_remode_tpu.models import depthmap as dm
        import jax.numpy as jnp

        fr = frames[-1]
        T = np.linalg.inv(np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]]))[:3]
        a, _ = dm.update_step(eng.state, jnp.asarray(fr.image),
                              jnp.asarray(T, jnp.float32), eng.cam, eng.cfg)
        b, _ = dm.update_step(restored, jnp.asarray(fr.image),
                              jnp.asarray(T, jnp.float32), eng.cam, eng.cfg)
        np.testing.assert_array_equal(np.asarray(a.mu), np.asarray(b.mu))


class TestNode:
    def test_keyframe_lifecycle(self):
        """The node must take a reference, update, hit a switch trigger
        (converged% or distance), export asynchronously, and re-seed
        (depthmap_node.cpp:96-182)."""
        from rpg_open_remode_tpu.models import depthmap as dm
        from rpg_open_remode_tpu.models.node import DepthmapNode, NodeState
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=56, width=160, height=120,
                                    cam=cam, seed=3)
        cfg = RemodeConfig(num_planes=64, ref_compl_perc=4.0,
                           max_dist_from_ref=0.45, denoise_iters=30)
        eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"],
                          cam["cy"], cfg=cfg)
        exported = []
        node = DepthmapNode(eng, cfg=cfg, on_keyframe=exported.append)
        for fr in frames:
            T = np.linalg.inv(np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]]))[:3]
            d = fr.depth[np.isfinite(fr.depth)]
            node.process_frame(fr.image, T, d.min(), d.max())
        node.close()
        assert len(node.keyframes) >= 2, "should complete multiple keyframes"
        assert exported == node.keyframes
        # keyframes finalize on either trigger (converged% OR distance,
        # depthmap_node.cpp:148); at this scale the distance rule fires
        # first — the lifecycle mechanics are what this test pins down
        for kf in node.keyframes:
            assert kf.n_updates > 0
            assert np.isfinite(kf.denoised_depth).all()
            assert kf.state.shape == (120, 160)


class TestCLI:
    def test_cli_run_synthetic(self, tmp_path):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = tmp_path / "out"
        r = subprocess.run(
            [
                "python", "-m", "rpg_open_remode_tpu.cli",
                "--platform", "cpu", "run", "--synthetic", "--frames", "25", "--width", "128",
                "--height", "96", "--fx", "96.0", "--fy", "-95.0",
                "--out", str(out),
            ],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "processed 25 frames" in r.stdout
        assert any(out.glob("kf_*_depth.npy")), list(out.iterdir())
        assert any(out.glob("kf_*_cloud.ply"))

    def test_cli_run_stdin_stream(self, tmp_path):
        """Live input: frames piped as '<path> tx ty tz qx qy qz qw min max'
        lines (the /svo/dense_input analog). The golden dataset's malformed
        lines exercise the skip path; valid frames must be ingested."""
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        gold = os.path.join(root, "tests", "data", "golden_dataset")
        lines = []
        for ln in open(os.path.join(gold, "first_2_frames_sequence.txt")):
            p = ln.split()
            if not p:
                continue
            img = os.path.join(gold, "images", p[0])
            if os.path.exists(img) and len(p) >= 8:
                # well-formed: path + pose + depth bounds
                lines.append(" ".join([img] + p[1:8] + ["0.5", "3.0"]))
            else:
                lines.append(ln.rstrip())   # malformed, must be skipped
        stream = "\n".join(lines) + "\n"
        r = subprocess.run(
            [
                "python", "-m", "rpg_open_remode_tpu.cli",
                "--platform", "cpu", "run", "--stdin",
                "--width", "8", "--height", "6",
                "--fx", "6.0", "--fy", "-6.0",
                "--out", str(tmp_path / "out"),
            ],
            input=stream, capture_output=True, text=True, timeout=600,
            cwd=root, env=dict(os.environ, JAX_PLATFORMS="cpu"),
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "processed 3 frames" in r.stdout, r.stdout
        assert "skipping malformed line" in r.stdout


class TestBatchedKeyframes:
    def test_batched_matches_individual_engines(self):
        """A vmapped 2-keyframe batch must produce the same posteriors as
        two independent single-keyframe engines."""
        from rpg_open_remode_tpu.models import depthmap as dm
        from rpg_open_remode_tpu.models.multikeyframe import BatchedDepthmap
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=10, width=160, height=120,
                                    cam=cam, seed=5)
        cfg = RemodeConfig(num_planes=48)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        batched = BatchedDepthmap(2, 160, 120, cam["fx"], cam["cx"],
                                  cam["fy"], cam["cy"], cfg=cfg)
        singles = []
        for slot, ref_idx in enumerate((0, 2)):
            f = frames[ref_idx]
            d = f.depth[np.isfinite(f.depth)]
            batched.seed_keyframe(slot, f.image, Tcw(f), d.min(), d.max())
            eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"],
                              cam["cy"], cfg=cfg)
            eng.set_reference_image(f.image, Tcw(f), d.min(), d.max())
            singles.append(eng)

        for fr in frames[3:8]:
            batched.update(fr.image, Tcw(fr))
            for eng in singles:
                eng.update(fr.image, Tcw(fr))

        for slot, eng in enumerate(singles):
            st = batched.keyframe_state(slot)
            np.testing.assert_allclose(
                np.asarray(st.mu), np.asarray(eng.state.mu),
                rtol=1e-4, atol=1e-5,
            )
            match = (np.asarray(st.conv) == np.asarray(eng.state.conv)).mean()
            assert match > 0.999, match


class TestMultiKeyframeNode:
    def test_staggered_ring_lifecycle(self):
        """The multi-keyframe node must stagger slot restarts, run the
        switch policy per slot, finalize keyframes asynchronously (finite
        denoised depth), and feed the global map."""
        from rpg_open_remode_tpu.io import GlobalMap
        from rpg_open_remode_tpu.models.multikeyframe import (
            BatchedDepthmap, MultiKeyframeNode,
        )
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=45, width=160, height=120,
                                    cam=cam, seed=5)
        cfg = RemodeConfig(num_planes=48)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        eng = BatchedDepthmap(2, 160, 120, cam["fx"], cam["cx"],
                              cam["fy"], cam["cy"], cfg=cfg)
        gmap = GlobalMap(voxel=0.05)
        node = MultiKeyframeNode(eng, on_keyframe=gmap.add_keyframe,
                                 policy_stride=3, stagger=8)
        d0 = frames[0].depth[np.isfinite(frames[0].depth)]
        bounds = (float(d0.min()), float(d0.max()))
        for fr in frames:
            node.process_frame(fr.image, Tcw(fr), *bounds)
        node.close()

        # startup staggering diversified the slots: different keyframe poses
        T0 = np.asarray(eng.keyframe_state(0).T_world_ref)
        T1 = np.asarray(eng.keyframe_state(1).T_world_ref)
        assert not np.allclose(T0, T1)
        # the 45-frame trajectory travels ~1 m at max_dist_from_ref=0.5, so
        # the distance policy must have completed keyframes
        assert len(node.keyframes) >= 1
        for r in node.keyframes:
            assert np.isfinite(r.denoised_depth).all()
            assert r.n_updates > 0
        assert gmap.n_keyframes == len(node.keyframes)
        assert gmap.cloud()[0].shape[0] > 0


class TestChunkedUpdate:
    def test_chunk_matches_per_frame_updates(self):
        """update_chunk (one lax.scan dispatch over K stacked frames) must
        reproduce K sequential update() calls exactly — same math, only the
        dispatch granularity differs."""
        from rpg_open_remode_tpu.models import depthmap as dm
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=7, width=160, height=120,
                                    cam=cam, seed=5)
        cfg = RemodeConfig(num_planes=48)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        def make():
            eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"],
                              cam["cy"], cfg=cfg)
            f0 = frames[0]
            d = f0.depth[np.isfinite(f0.depth)]
            eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
            return eng

        # uint8 chunk exercises the in-scan prep path too
        imgs_u8 = np.stack([
            np.clip(fr.image * 255.0, 0, 255).astype(np.uint8)
            for fr in frames[1:]
        ])
        Ts = np.stack([Tcw(fr) for fr in frames[1:]])

        seq = make()
        per_frame_stats = [seq.update(imgs_u8[k], Ts[k])
                           for k in range(len(Ts))]

        chunked = make()
        packed = np.asarray(chunked.update_chunk(imgs_u8, Ts))

        np.testing.assert_array_equal(np.asarray(seq.state.mu),
                                      np.asarray(chunked.state.mu))
        np.testing.assert_array_equal(np.asarray(seq.state.sigma_sq),
                                      np.asarray(chunked.state.sigma_sq))
        np.testing.assert_array_equal(np.asarray(seq.state.a),
                                      np.asarray(chunked.state.a))
        np.testing.assert_array_equal(np.asarray(seq.state.conv),
                                      np.asarray(chunked.state.conv))
        assert packed.shape == (len(Ts), len(dm.PACKED_STATS_KEYS))
        for k, st in enumerate(per_frame_stats):
            np.testing.assert_allclose(
                packed[k], np.asarray(st["packed"]), rtol=1e-6)


class TestDeterminism:
    def test_update_bitwise_reproducible(self):
        """Two runs of the same update on the same inputs must agree
        bitwise — the property the reference's racy TV kernel and unsynced
        publisher cannot give (SURVEY.md section 5)."""
        from rpg_open_remode_tpu.models import depthmap as dm
        from rpg_open_remode_tpu.utils import synthetic
        import jax.numpy as jnp

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=4, width=160, height=120,
                                    cam=cam, seed=9)

        def run():
            eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"],
                              cam["cy"], cfg=RemodeConfig(num_planes=48))
            f0 = frames[0]
            d = f0.depth[np.isfinite(f0.depth)]
            T = np.concatenate([f0.T_world_curr, [[0, 0, 0, 1]]])
            eng.set_reference_image(f0.image, np.linalg.inv(T)[:3],
                                    d.min(), d.max())
            for fr in frames[1:]:
                T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
                eng.update(fr.image, np.linalg.inv(T)[:3])
            den = eng.denoised_depthmap(0.5, 40)
            return eng.state, den

        s1, d1 = run()
        s2, d2 = run()
        np.testing.assert_array_equal(np.asarray(s1.mu), np.asarray(s2.mu))
        np.testing.assert_array_equal(np.asarray(s1.sigma_sq),
                                      np.asarray(s2.sigma_sq))
        np.testing.assert_array_equal(np.asarray(s1.conv), np.asarray(s2.conv))
        np.testing.assert_array_equal(d1, d2)

    def test_restore_resumes_identically(self, tmp_path):
        """restore(load_state(save_state(x))) continues exactly like the
        original engine."""
        from rpg_open_remode_tpu.models import depthmap as dm
        from rpg_open_remode_tpu.utils import synthetic

        cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
        frames = synthetic.generate(n_frames=6, width=160, height=120,
                                    cam=cam, seed=9)
        cfg = RemodeConfig(num_planes=48)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"],
                          cam["cy"], cfg=cfg)
        f0 = frames[0]
        d = f0.depth[np.isfinite(f0.depth)]
        eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
        for fr in frames[1:3]:
            eng.update(fr.image, Tcw(fr))
        save_state(str(tmp_path / "ck.npz"), eng.state)

        fresh = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"],
                            cam["cy"], cfg=cfg)
        fresh.restore(load_state(str(tmp_path / "ck.npz")))
        for fr in frames[3:]:
            eng.update(fr.image, Tcw(fr))
            fresh.update(fr.image, Tcw(fr))
        np.testing.assert_array_equal(np.asarray(eng.state.mu),
                                      np.asarray(fresh.state.mu))
        np.testing.assert_array_equal(np.asarray(eng.state.conv),
                                      np.asarray(fresh.state.conv))

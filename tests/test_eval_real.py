"""Drive the real-dataset eval path (eval.eval_real_dataset, the
--data-path mode) end-to-end on a synthesized on-disk dataset laid out in
the exact reference format (sequence file + images/*.png +
depthmaps/*.depth in ASCII centimetres; test/dataset.cpp:94-186) — proving
the on-ramp works byte-for-byte before the real traj_over_table data is
fetched (scripts/fetch_traj_over_table.sh)."""

import numpy as np
import pytest


def _rot_to_quat_xyzw(R):
    """Inverse of io.dataset.quat_to_rotation (w,x,y,z) -> (x,y,z,w)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # pragma: no cover - synthetic poses stay far from w=0
        x, y, z = 1.0, 0.0, 0.0
    return np.array([x, y, z, w], np.float64)


@pytest.fixture(scope="module")
def synth_dataset_on_disk(tmp_path_factory):
    from PIL import Image

    from rpg_open_remode_tpu.utils import synthetic

    W, H = 160, 120
    cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
    frames = synthetic.generate(n_frames=30, width=W, height=H, cam=cam,
                                seed=5)
    root = tmp_path_factory.mktemp("real_ds")
    (root / "images").mkdir()
    (root / "depthmaps").mkdir()
    lines = []
    for i, fr in enumerate(frames):
        name = f"scene_{i:03d}.png"
        img_u8 = np.clip(fr.image * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(img_u8, mode="L").save(root / "images" / name)
        # reference .depth format: ASCII floats in CENTIMETRES
        depth_cm = np.where(np.isfinite(fr.depth), fr.depth * 100.0, 1e9)
        with open(root / "depthmaps" / f"scene_{i:03d}.depth", "w") as f:
            f.write(" ".join(f"{v:.4f}" for v in depth_cm.ravel()))
        R, t = fr.T_world_curr[:, :3], fr.T_world_curr[:, 3]
        q = _rot_to_quat_xyzw(R)
        lines.append(
            f"{name} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
            f"{q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"
        )
    seq = "first_200_frames_traj_over_table_input_sequence.txt"
    with open(root / seq, "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(root), (W, H), cam, frames


class TestEvalRealDataset:
    def test_runs_reference_experiment(self, synth_dataset_on_disk):
        import eval as ev

        root, (W, H), cam, frames = synth_dataset_on_disk
        r = ev.eval_real_dataset(
            root, n_frames=30, denoise=False, size=(W, H),
            cam=dict(fx=cam["fx"], cx=cam["cx"], fy=cam["fy"], cy=cam["cy"]),
        )
        assert r["frames"] == 30
        assert r["resolution"] == f"{W}x{H}"
        assert r["mean_update_s"] > 0 and r["var_update_s"] >= 0
        # the synthetic scene converges measurably in 29 updates (the
        # verify-skill healthy-signal bar is >40% at this shape)
        assert r["converged_pct"] > 20.0, r
        assert r["within_2p6pct_raw"] > 0.6, r

    def test_skips_loudly_when_missing(self, tmp_path):
        import eval as ev

        with pytest.raises(FileNotFoundError, match="fetch_traj_over_table"):
            ev.eval_real_dataset(str(tmp_path))

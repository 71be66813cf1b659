"""Accuracy evaluation in the style of the REMODE paper's section IV.

Reproduces the reference's offline experiment shape (test/dataset_main.cpp:
one fixed keyframe, ~200 timed updates, final denoise) on the hardened
synthetic ray-traced scene (photometric noise, vignetting, textureless
patches, two occluders — utils/synthetic.py) with exact ground truth, at
the paper's three operating points (Tables I-II):

  over_table    640x480, 0.023 m/frame, one fixed keyframe, 200 frames
  fast_motion   640x480, 1.61 m/s @ 60 fps = 0.0268 m/frame (paper Table I);
                keyframes switch by the reference's distance rule
                (max_dist_from_ref = 0.5 m, depthmap_node.cpp:80,148 → 18
                updates per keyframe); reported as mean per-keyframe
                convergence/accuracy over the sequence. Note the Beta-prior
                arithmetic: from a=b=10, a/(a+b) > 0.7 needs >=14 inlier
                updates, so segments shorter than ~15 updates can never
                converge — the 0.5 m rule sits just above that floor.
  live_752x480  752x480, 0.023 m/frame, one fixed keyframe (the paper's
                live-camera resolution)

Metrics per operating point:
  - depth RMSE of converged seeds (raw and TV-denoised)
  - the paper's headline number: fraction of converged measurements within
    2.6% of the scene depth range (the "15 cm" criterion; >60% published)
  - precision/completeness vs the sigma^2 acceptance threshold (the
    paper's Fig. 4-7 sweep), over_table only

Writes EVAL.json and prints a summary.
"""

from __future__ import annotations

import json

import numpy as np

HARDEN = dict(noise_sigma=0.01, vignette=0.15, n_textureless=3, n_spheres=2)


def _Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)


def _accuracy(eng, gt, depth_range, denoise=True):
    from rpg_open_remode_tpu.config import ConvergenceState

    err_bound = 0.026 * depth_range
    conv = eng.convergence_map()
    mu = eng.depthmap()
    interior = np.zeros_like(conv, bool)
    interior[5:-5, 5:-5] = True
    valid_gt = np.isfinite(gt) & interior
    converged = (conv == int(ConvergenceState.CONVERGED)) & valid_gt
    err_raw = np.abs(mu - gt)
    out = {
        "converged_pct": 100.0 * converged.sum() / valid_gt.sum(),
        "rmse_converged_raw_m": float(np.sqrt(np.mean(err_raw[converged] ** 2)))
        if converged.any() else float("nan"),
        "median_err_converged_m": float(np.median(err_raw[converged]))
        if converged.any() else float("nan"),
        "within_2p6pct_raw": float((err_raw[converged] < err_bound).mean())
        if converged.any() else float("nan"),
    }
    if denoise and converged.any():
        den = eng.denoised_depthmap(0.5, 200)
        err_den = np.abs(den - gt)
        out["rmse_converged_denoised_m"] = float(
            np.sqrt(np.mean(err_den[converged] ** 2))
        )
        out["within_2p6pct_denoised"] = float(
            (err_den[converged] < err_bound).mean()
        )
    return out, (valid_gt, converged, err_raw, err_bound)


def _noisy_Tcw(T_cw, rng, sigma_rot_rad, sigma_t_m):
    """Perturb a 3x4 world->camera pose with small rotation/translation
    noise — the pose-error statistics of a live VO front end (the
    reference ingests SVO poses, paper section III-A; its accuracy numbers
    quietly assume them exact)."""
    w = rng.normal(0.0, sigma_rot_rad, 3)
    th = np.linalg.norm(w)
    if th > 1e-12:
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        dR = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    else:
        dR = np.eye(3)
    T = np.array(T_cw, np.float64)
    T[:, :3] = dR @ T[:, :3]
    T[:, 3] = dR @ T[:, 3] + rng.normal(0.0, sigma_t_m, 3)
    return T.astype(np.float32)


def eval_fixed_keyframe(width, height, cam, n_frames, step, seed=1,
                        curve=False, sweep=False, cfg=None,
                        pose_noise=None):
    """dataset_main-style: frame 0 is the only keyframe. ``pose_noise``
    = (sigma_rot_deg, sigma_t_m): per-frame VO-like pose error applied to
    every UPDATE pose (the keyframe pose stays exact — errors are
    relative to the keyframe in a real pipeline)."""
    from rpg_open_remode_tpu.models.depthmap import Depthmap
    from rpg_open_remode_tpu.utils import synthetic

    frames = synthetic.generate(n_frames=n_frames, width=width, height=height,
                                cam=cam, seed=seed, step=step, **HARDEN)
    f0 = frames[0]
    gt = f0.depth
    d0 = gt[np.isfinite(gt)]
    depth_range = float(d0.max() - d0.min())
    eng = Depthmap(width, height, cam["fx"], cam["cx"], cam["fy"], cam["cy"],
                   cfg=cfg)
    eng.set_reference_image(f0.image, _Tcw(f0), d0.min(), d0.max())
    nrng = np.random.default_rng(seed + 1000) if pose_noise else None
    conv_curve = []
    for i, fr in enumerate(frames[1:], 1):
        T = _Tcw(fr)
        if pose_noise:
            T = _noisy_Tcw(T, nrng, np.deg2rad(pose_noise[0]), pose_noise[1])
        eng.update(fr.image, T)
        if curve and i % 20 == 0:
            conv_curve.append(
                {"frame": i, "converged_pct": eng.converged_percentage()}
            )

    report, (valid_gt, converged, err_raw, err_bound) = _accuracy(
        eng, gt, depth_range
    )
    report.update({
        "frames": n_frames,
        "resolution": f"{width}x{height}",
        "motion_step_m": step,
        "depth_range_m": depth_range,
    })
    if pose_noise:
        report["pose_noise"] = {"sigma_rot_deg": pose_noise[0],
                                "sigma_t_m": pose_noise[1]}
    if curve:
        report["convergence_curve"] = conv_curve
    if sweep:
        sigma_sq = np.asarray(eng.state.sigma_sq)
        rows = []
        for thr in [1e-4, 3e-4, 6e-4, 1e-3, 3e-3, 1e-2, 3e-2]:
            accepted = (sigma_sq < thr) & valid_gt
            n_acc = int(accepted.sum())
            rows.append({
                "sigma_sq_thr": thr,
                "completeness": n_acc / int(valid_gt.sum()),
                "precision": float((err_raw[accepted] < err_bound).mean())
                if n_acc else float("nan"),
            })
        report["precision_completeness"] = rows
    return report


def eval_keyframe_segments(width, height, cam, n_frames, step, seg_len,
                           seed=1, bound_pad=(0.5, 2.5), cfg=None):
    """Fast-motion style: a new keyframe every ``seg_len`` frames (the live
    system switches keyframes by the distance rule, depthmap_node.cpp:148).

    ``bound_pad`` scales the GT depth bounds before seeding, as a live
    SVO-fed system would (the reference's fast-motion dataset spans
    0.97-6.8 m around a ~2 m mean scene, Table I / BASELINE.md). Exact
    per-keyframe GT bounds would be *harder* than reality: a narrow range
    raises the Vogiatzis uniform-outlier density 1/(z_max-z_min) above the
    small-baseline inlier Gaussian peak, so the first few updates of every
    keyframe get outlier-weighted and 18 updates can't reach eta_inlier.
    The accuracy criterion (2.6% of range) still uses the GT range.
    """
    from rpg_open_remode_tpu.models.depthmap import Depthmap
    from rpg_open_remode_tpu.utils import synthetic

    frames = synthetic.generate(n_frames=n_frames, width=width, height=height,
                                cam=cam, seed=seed, step=step, **HARDEN)
    eng = Depthmap(width, height, cam["fx"], cam["cx"], cam["fy"], cam["cy"],
                   cfg=cfg)
    per_kf = []
    i = 0
    while i + seg_len <= n_frames:
        f_ref = frames[i]
        gt = f_ref.depth
        d = gt[np.isfinite(gt)]
        depth_range = float(d.max() - d.min())
        eng.set_reference_image(f_ref.image, _Tcw(f_ref),
                                bound_pad[0] * d.min(), bound_pad[1] * d.max())
        for fr in frames[i + 1 : i + seg_len]:
            eng.update(fr.image, _Tcw(fr))
        acc, _ = _accuracy(eng, gt, depth_range, denoise=False)
        per_kf.append(acc)
        i += seg_len

    def mean_of(key):
        vals = [k[key] for k in per_kf if np.isfinite(k[key])]
        return float(np.mean(vals)) if vals else float("nan")

    return {
        "frames": n_frames,
        "resolution": f"{width}x{height}",
        "motion_step_m": step,
        "keyframes": len(per_kf),
        "updates_per_keyframe": seg_len - 1,
        "mean_converged_pct_per_kf": mean_of("converged_pct"),
        "mean_rmse_converged_m": mean_of("rmse_converged_raw_m"),
        "mean_within_2p6pct": mean_of("within_2p6pct_raw"),
    }


def eval_real_dataset(
    data_path, n_frames=200, denoise=True,
    sequence="first_200_frames_traj_over_table_input_sequence.txt",
    size=(640, 480), cam=None,
):
    """The reference experiment VERBATIM on the real traj_over_table
    dataset (test/dataset_main.cpp:32-135): camera (481.2, -480.0, 319.5,
    239.5) at 640x480, frame 0 is the reference with min/max depth from its
    ground-truth depthmap, frames 1..n-1 update, final denoise(0.5, 200);
    accuracy of converged seeds vs the per-frame-0 GT. Fetch the dataset
    with scripts/fetch_traj_over_table.sh. ``sequence``/``size``/``cam``
    are overridable so tests can drive the same code path on a small
    synthesized on-disk dataset."""
    from rpg_open_remode_tpu.io import Dataset
    from rpg_open_remode_tpu.models.depthmap import Depthmap

    cam = cam or dict(fx=481.2, cx=319.5, fy=-480.0, cy=239.5)
    ds = Dataset(sequence, path=data_path)
    if not ds.read_data_sequence(0, n_frames):
        raise FileNotFoundError(
            f"cannot read {ds.path / ds.sequence_file} — fetch the dataset "
            "with scripts/fetch_traj_over_table.sh"
        )
    W, H = size
    entry0 = ds[0]
    img0 = ds.read_image(entry0)
    gt = ds.read_depthmap(entry0, W, H)
    d0 = gt[np.isfinite(gt)]
    depth_range = float(d0.max() - d0.min())
    eng = Depthmap(W, H, **cam)
    eng.set_reference_image(img0, entry0.T_curr_world, float(d0.min()),
                            float(d0.max()))
    import time

    # timing: drain the async queue once per BLOCK of frames, not per
    # frame — on this tunnel backend any device->host fetch stalls
    # dispatch ~30-40 ms, so a per-frame drain would measure the tunnel
    # round trip, not the update (the reference times per frame because
    # cudaDeviceSynchronize costs ~nothing over PCIe,
    # test/dataset_main.cpp:101-135; mean/var here are per-block means).
    entries = list(ds)[1:]
    images = [ds.read_image(e) for e in entries]   # decode off the clock
    BLOCK = 10
    times = []
    i = 0
    while i < len(entries):
        j = min(i + BLOCK, len(entries))
        t0 = time.perf_counter()
        for k in range(i, j):
            eng.update(images[k], entries[k].T_curr_world)
        float(np.asarray(eng.state.mu[0, 0]))   # drain once per block
        times.append((time.perf_counter() - t0) / (j - i))
        i = j
    report, _ = _accuracy(eng, gt, depth_range, denoise=denoise)
    report.update({
        "frames": len(ds),
        "resolution": f"{W}x{H}",
        "depth_range_m": depth_range,
        "mean_update_s": float(np.mean(times)),
        "var_update_s": float(np.var(times)),
        "timing_block_frames": BLOCK,
        "data_path": str(ds.path),
    })
    return report


def main():
    cam640 = dict(fx=481.2, fy=-480.0, cx=319.5, cy=239.5)
    cam752 = dict(fx=481.2, fy=-480.0, cx=375.5, cy=239.5)

    report = {
        "scene_hardening": HARDEN,
        "reference_published": ">60% of converged within 2.6% of range "
        "(paper section IV, sigma^2_thr = 6e-4); update means Table II: "
        "over_table 38.2ms, fast_motion 49.9ms, live 30.1ms",
    }
    report["over_table"] = eval_fixed_keyframe(
        640, 480, cam640, n_frames=200, step=0.023, curve=True, sweep=True
    )
    print(f"over_table:  conv {report['over_table']['converged_pct']:.1f}%  "
          f"RMSE {report['over_table']['rmse_converged_raw_m']*1000:.1f} mm  "
          f"within-2.6% {100*report['over_table']['within_2p6pct_raw']:.1f}%")

    # robustness: the same experiment with VO-like pose noise on every
    # update (0.1 deg rotation, 2 mm translation per frame — optimistic-
    # realistic visual-odometry error at this scene scale). The depth
    # filter's outlier model should absorb most of it; no reference number
    # exists (the paper assumes SVO poses exact).
    report["over_table_posenoise"] = eval_fixed_keyframe(
        640, 480, cam640, n_frames=200, step=0.023,
        pose_noise=(0.1, 0.002),
    )
    pn = report["over_table_posenoise"]
    print(f"over_table+posenoise: conv {pn['converged_pct']:.1f}%  "
          f"RMSE {pn['rmse_converged_raw_m']*1000:.1f} mm  "
          f"within-2.6% {100*pn['within_2p6pct_raw']:.1f}%")

    # dose-response with the pose-noise MEASUREMENT MODEL on
    # (cfg.pose_noise_rot_deg/_trans_m, ops/seed_update.py): tau widened by
    # the same noise magnitudes injected into the poses — pose error
    # becomes measurement variance instead of outlier evidence
    from rpg_open_remode_tpu.config import RemodeConfig as _RC

    for rot in (0.05, 0.1, 0.2):
        key = f"over_table_posenoise_modeled_{rot}"
        report[key] = eval_fixed_keyframe(
            640, 480, cam640, n_frames=200, step=0.023,
            pose_noise=(rot, 0.002),
            cfg=_RC(pose_noise_rot_deg=rot, pose_noise_trans_m=0.002),
        )
        r = report[key]
        print(f"over_table+posenoise {rot} deg (modeled): "
              f"conv {r['converged_pct']:.1f}%  "
              f"RMSE {r['rmse_converged_raw_m']*1000:.1f} mm  "
              f"within-2.6% {100*r['within_2p6pct_raw']:.1f}%")

    # paper Table I fast-motion pacing: 1.61 m/s at 60 fps; keyframe length
    # from the reference switch rule dist_from_ref > 0.5 m
    fast_step = 1.61 / 60.0
    report["fast_motion"] = eval_keyframe_segments(
        640, 480, cam640, n_frames=190, step=fast_step,
        seg_len=int(0.5 / fast_step) + 1,
    )
    print(f"fast_motion: {report['fast_motion']['keyframes']} keyframes, "
          f"mean conv/kf {report['fast_motion']['mean_converged_pct_per_kf']:.1f}%  "
          f"within-2.6% {100*report['fast_motion']['mean_within_2p6pct']:.1f}%")

    # same fast-motion run with keyframe depth propagation (the
    # beyond-reference warm start, ops/propagate.py)
    from rpg_open_remode_tpu.config import RemodeConfig

    report["fast_motion_propagated"] = eval_keyframe_segments(
        640, 480, cam640, n_frames=190, step=fast_step,
        seg_len=int(0.5 / fast_step) + 1,
        cfg=RemodeConfig(propagate_depth=True),
    )
    fp = report["fast_motion_propagated"]
    print(f"fast_motion+propagate: mean conv/kf "
          f"{fp['mean_converged_pct_per_kf']:.1f}%  "
          f"within-2.6% {100*fp['mean_within_2p6pct']:.1f}%")

    # lifecycle-mode over_table (VERDICT r3: the fixed-keyframe curve
    # saturates at frame ~60, so frames 60-200 measured nothing): keyframes
    # switch by the reference's 0.5 m distance rule over the same 200-frame
    # trajectory (0.023 m/frame -> 22 frames per keyframe), reporting mean
    # per-keyframe accuracy like fast_motion
    report["over_table_lifecycle"] = eval_keyframe_segments(
        640, 480, cam640, n_frames=198, step=0.023,
        seg_len=int(0.5 / 0.023) + 1,
    )
    ol = report["over_table_lifecycle"]
    print(f"over_table_lifecycle: {ol['keyframes']} keyframes, "
          f"mean conv/kf {ol['mean_converged_pct_per_kf']:.1f}%  "
          f"within-2.6% {100*ol['mean_within_2p6pct']:.1f}%")

    # lifecycle + depth propagation: each switch warm-starts from the
    # outgoing posterior (the composition a live system would run)
    report["over_table_lifecycle_propagated"] = eval_keyframe_segments(
        640, 480, cam640, n_frames=198, step=0.023,
        seg_len=int(0.5 / 0.023) + 1,
        cfg=RemodeConfig(propagate_depth=True),
    )
    olp = report["over_table_lifecycle_propagated"]
    print(f"over_table_lifecycle+propagate: "
          f"mean conv/kf {olp['mean_converged_pct_per_kf']:.1f}%  "
          f"within-2.6% {100*olp['mean_within_2p6pct']:.1f}%")

    report["live_752x480"] = eval_fixed_keyframe(
        752, 480, cam752, n_frames=120, step=0.023
    )
    print(f"live_752:    conv {report['live_752x480']['converged_pct']:.1f}%  "
          f"RMSE {report['live_752x480']['rmse_converged_raw_m']*1000:.1f} mm  "
          f"within-2.6% {100*report['live_752x480']['within_2p6pct_raw']:.1f}%")

    # beyond-reference scale: 1280x720 (the bench's hd_720p_fps operating
    # point) at SHIPPED defaults — cfg=None triggers the focal-scaled
    # constants (RemodeConfig.for_camera: 9x9 patch at the same angular
    # footprint as the reference 5x5, doubled disparity window)
    cam720 = dict(fx=962.4, fy=-960.0, cx=639.5, cy=359.5)
    report["hd_1280x720"] = eval_fixed_keyframe(
        1280, 720, cam720, n_frames=80, step=0.023
    )
    print(f"hd_720p:     conv {report['hd_1280x720']['converged_pct']:.1f}%  "
          f"RMSE {report['hd_1280x720']['rmse_converged_raw_m']*1000:.1f} mm  "
          f"within-2.6% {100*report['hd_1280x720']['within_2p6pct_raw']:.1f}%")

    # ablation: the unscaled reference 5x5 patch with only the window
    # widened (the round-3 shipped config) — quantifies what the
    # focal-scaled patch buys at HD
    report["hd_1280x720_p5_wide"] = eval_fixed_keyframe(
        1280, 720, cam720, n_frames=80, step=0.023,
        cfg=RemodeConfig(disp_pad=256, num_planes=255),
    )
    hw = report["hd_1280x720_p5_wide"]
    print(f"hd_720p_p5_wide: conv {hw['converged_pct']:.1f}%  "
          f"RMSE {hw['rmse_converged_raw_m']*1000:.1f} mm  "
          f"within-2.6% {100*hw['within_2p6pct_raw']:.1f}%")

    # 1920x1080 at 3x the reference focal length (shipped focal-scaled
    # config: 15x15 patch, 383 planes — bench point fhd_1080p). 120 frames:
    # 60 under-fed convergence (over-table saturates near frame ~60), and
    # the round-5 column-blocked resampler removed the late-keyframe warp
    # fallbacks that made long FHD runs prohibitively slow.
    cam1080 = dict(fx=1443.6, fy=-1440.0, cx=959.5, cy=539.5)
    report["fhd_1920x1080"] = eval_fixed_keyframe(
        1920, 1080, cam1080, n_frames=120, step=0.023
    )
    fh = report["fhd_1920x1080"]
    print(f"fhd_1080p:   conv {fh['converged_pct']:.1f}%  "
          f"RMSE {fh['rmse_converged_raw_m']*1000:.1f} mm  "
          f"within-2.6% {100*fh['within_2p6pct_raw']:.1f}%")

    # ablation: patch 17 (one step past the shipped angular-parity 15).
    # FHD's conv ceiling is NO_MATCH texture (43% of pixels see too little
    # per-patch contrast at 3x sampling of the fixed-frequency hardened
    # texture; HD: 33%) — a bigger patch gathers more contrast: +2 conv
    # pts and better within-2.6%. Shipped config stays the principled
    # focal-parity scaling; this row bounds what the knob buys.
    report["fhd_1920x1080_p17"] = eval_fixed_keyframe(
        1920, 1080, cam1080, n_frames=60, step=0.023,
        cfg=RemodeConfig.for_camera(cam1080["fx"], patch_side=17),
    )
    f17 = report["fhd_1920x1080_p17"]
    print(f"fhd_1080p_p17: conv {f17['converged_pct']:.1f}%  "
          f"within-2.6% {100*f17['within_2p6pct_raw']:.1f}%")

    _merge_into_eval_json(report, full_suite=True)

    rows = report["over_table"]["precision_completeness"]
    print(f"{'sigma^2_thr':>12} {'completeness':>13} {'precision':>10}")
    for row in rows:
        print(f"{row['sigma_sq_thr']:>12.0e} {row['completeness']:>13.3f} "
              f"{row['precision']:>10.3f}")


# Rows a full synthetic-suite run does NOT produce but must preserve when
# rewriting EVAL.json (the real-data row lands via --data-path on a machine
# with network). Everything else is current-suite-or-dead: keys from renamed
# or removed experiments would otherwise persist forever and silently mix
# rounds/configs in the artifact (advisor, round 4).
_PRESERVED_KEYS = ("traj_over_table_real",)


def _merge_into_eval_json(update: dict, full_suite: bool = False):
    """Write results into EVAL.json.

    ``full_suite=True`` (the synthetic run) REWRITES the file: only the
    rows this run produced plus ``_PRESERVED_KEYS`` survive, so stale keys
    from renamed experiments cannot linger. ``full_suite=False`` (the
    --data-path single-row addition) merges into whatever exists."""
    import os

    prior = {}
    if os.path.exists("EVAL.json"):
        with open("EVAL.json") as f:
            prior = json.load(f)
    if full_suite:
        report = {k: prior[k] for k in _PRESERVED_KEYS if k in prior}
        report.update(update)
    else:
        report = prior
        report.update(update)
    with open("EVAL.json", "w") as f:
        json.dump(report, f, indent=2)


def main_real(data_path, n_frames):
    try:
        r = eval_real_dataset(data_path, n_frames=n_frames)
    except FileNotFoundError as e:
        raise SystemExit(f"SKIPPED (no real dataset): {e}")
    print(f"traj_over_table (REAL): conv {r['converged_pct']:.1f}%  "
          f"RMSE {r['rmse_converged_raw_m']*1000:.1f} mm  "
          f"within-2.6% {100*r['within_2p6pct_raw']:.1f}%  "
          f"update {r['mean_update_s']*1000:.1f} ms "
          f"(paper: 38.2 ms, >60% within 2.6%)")
    _merge_into_eval_json({"traj_over_table_real": r})


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", default=None,
                   help="run the reference experiment on the REAL "
                        "traj_over_table dataset at this path (fetch with "
                        "scripts/fetch_traj_over_table.sh); without it, "
                        "the synthetic suite runs")
    p.add_argument("--frames", type=int, default=200)
    a = p.parse_args()
    if a.data_path:
        main_real(a.data_path, a.frames)
    else:
        main()

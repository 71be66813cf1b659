"""Accuracy evaluation in the style of the REMODE paper's section IV.

Reproduces the reference's offline experiment shape (test/dataset_main.cpp:
one fixed keyframe, ~200 timed updates, final denoise) on the synthetic
ray-traced scene with exact ground truth, and reports the paper's accuracy
metrics:

  - depth RMSE of converged seeds (raw and TV-denoised)
  - the paper's headline number: fraction of converged measurements within
    2.6% of the scene depth range (the "15 cm" criterion; >60% published)
  - precision/completeness as a function of the sigma^2 acceptance
    threshold (the paper's Fig. 4-7 sweep): precision = fraction of
    accepted seeds within the error bound, completeness = accepted seeds
    as a fraction of all interior pixels

Writes EVAL.json and prints a summary table.
"""

from __future__ import annotations

import json

import numpy as np


def main(n_frames: int = 200, width: int = 640, height: int = 480, seed: int = 1):
    from rpg_open_remode_tpu.config import ConvergenceState
    from rpg_open_remode_tpu.models.depthmap import Depthmap
    from rpg_open_remode_tpu.utils import synthetic

    frames = synthetic.generate(
        n_frames=n_frames, width=width, height=height, seed=seed
    )
    f0 = frames[0]
    gt = f0.depth
    d0 = gt[np.isfinite(gt)]
    depth_range = float(d0.max() - d0.min())
    err_bound = 0.026 * depth_range    # the paper's 15 cm / 2.6%-of-range

    eng = Depthmap(width, height, fx=481.2, cx=319.5, fy=-480.0, cy=239.5)

    def Tcw(fr):
        T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
        return np.linalg.inv(T)[:3].astype(np.float32)

    eng.set_reference_image(f0.image, Tcw(f0), d0.min(), d0.max())
    conv_curve = []
    for i, fr in enumerate(frames[1:], 1):
        eng.update(fr.image, Tcw(fr))
        if i % 20 == 0:
            conv_curve.append(
                {"frame": i, "converged_pct": eng.converged_percentage()}
            )

    conv = eng.convergence_map()
    mu = eng.depthmap()
    den = eng.denoised_depthmap(0.5, 200)
    sigma_sq = np.asarray(eng.state.sigma_sq)

    interior = np.zeros_like(conv, bool)
    m = 5
    interior[m:-m, m:-m] = True
    valid_gt = np.isfinite(gt) & interior
    converged = (conv == int(ConvergenceState.CONVERGED)) & valid_gt

    err_raw = np.abs(mu - gt)
    err_den = np.abs(den - gt)
    report = {
        "frames": n_frames,
        "depth_range_m": depth_range,
        "converged_pct": 100.0 * converged.sum() / valid_gt.sum(),
        "rmse_converged_raw_m": float(np.sqrt(np.mean(err_raw[converged] ** 2))),
        "median_err_converged_m": float(np.median(err_raw[converged])),
        "rmse_converged_denoised_m": float(
            np.sqrt(np.mean(err_den[converged] ** 2))
        ),
        "within_2p6pct_raw": float((err_raw[converged] < err_bound).mean()),
        "within_2p6pct_denoised": float((err_den[converged] < err_bound).mean()),
        "reference_published": ">60% of converged within 2.6% of range "
        "(paper section IV, sigma^2_thr = 6e-4)",
        "convergence_curve": conv_curve,
    }

    # precision / completeness sweep over the sigma^2 acceptance threshold
    sweep = []
    for thr in [1e-4, 3e-4, 6e-4, 1e-3, 3e-3, 1e-2, 3e-2]:
        accepted = (sigma_sq < thr) & valid_gt
        n_acc = int(accepted.sum())
        sweep.append(
            {
                "sigma_sq_thr": thr,
                "completeness": n_acc / int(valid_gt.sum()),
                "precision": float((err_raw[accepted] < err_bound).mean())
                if n_acc
                else float("nan"),
            }
        )
    report["precision_completeness"] = sweep

    with open("EVAL.json", "w") as f:
        json.dump(report, f, indent=2)

    print(f"converged: {report['converged_pct']:.1f}%  "
          f"RMSE raw/denoised: {report['rmse_converged_raw_m']*1000:.1f}/"
          f"{report['rmse_converged_denoised_m']*1000:.1f} mm  "
          f"within-2.6%: {100*report['within_2p6pct_raw']:.1f}%"
          f" (reference: >60%)")
    print(f"{'sigma^2_thr':>12} {'completeness':>13} {'precision':>10}")
    for row in sweep:
        print(f"{row['sigma_sq_thr']:>12.0e} {row['completeness']:>13.3f} "
              f"{row['precision']:>10.3f}")


if __name__ == "__main__":
    main()

"""Benchmark: depthmap update throughput per chip at the reference scenario.

Mirrors the reference's offline benchmark (test/dataset_main.cpp:101-135):
640x480 frames, keyframe at frame 0 with GT depth bounds, per-frame timed
updates, then a 200-iteration TV-L1 denoise. Baseline: 38.2 ms/update
(26.2 fps) on the reference GPU (paper Table II, BASELINE.md); north-star
target is >= 50 frames/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_UPDATE_S = 0.0382       # paper Table II, 'over table' mean update time
REF_DENOISE_S = 0.1107      # paper Table II, 200-iteration denoise


def main():
    import jax
    import jax.numpy as jnp

    from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
    from rpg_open_remode_tpu.models.depthmap import Depthmap
    from rpg_open_remode_tpu.utils import synthetic

    n_frames = 60
    warmup = 5
    frames = synthetic.generate(n_frames=n_frames, width=640, height=480, seed=1)
    f0 = frames[0]
    d0 = f0.depth[np.isfinite(f0.depth)]

    cfg = RemodeConfig()
    eng = Depthmap(640, 480, fx=481.2, cx=319.5, fy=-480.0, cy=239.5, cfg=cfg)

    def Tcw(fr):
        T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
        return np.linalg.inv(T)[:3].astype(np.float32)

    eng.set_reference_image(f0.image, Tcw(f0), d0.min(), d0.max())

    times = []
    for i, fr in enumerate(frames[1:], 1):
        t0 = time.perf_counter()
        eng.update(fr.image, Tcw(fr))
        jax.block_until_ready(eng.state.mu)
        dt = time.perf_counter() - t0
        if i > warmup:
            times.append(dt)

    mean_update = float(np.mean(times))
    fps = 1.0 / mean_update

    # accuracy vs analytic ground truth
    conv = eng.convergence_map()
    mu = eng.depthmap()
    converged = conv == int(ConvergenceState.CONVERGED)
    depth_range = float(d0.max() - d0.min())
    if converged.any():
        err = np.abs(mu - f0.depth)[converged]
        rmse = float(np.sqrt(np.mean(err**2)))
        within = float((err < 0.026 * depth_range).mean())
    else:
        rmse, within = float("nan"), 0.0

    # denoise timing (after its own warmup compile)
    eng.denoised_depthmap(0.5, 200)
    t0 = time.perf_counter()
    eng.denoised_depthmap(0.5, 200)
    denoise_s = time.perf_counter() - t0

    result = {
        "metric": "depthmap_update_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / (1.0 / REF_UPDATE_S), 3),
        "update_ms": round(mean_update * 1000, 2),
        "denoise_200it_ms": round(denoise_s * 1000, 1),
        "denoise_vs_baseline": round(REF_DENOISE_S / denoise_s, 3),
        "converged_percent": round(100 * float(converged.mean()), 2),
        "depth_rmse_m": round(rmse, 4),
        "within_2p6pct_range": round(within, 3),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

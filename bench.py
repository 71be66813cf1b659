"""Benchmark: depthmap update throughput per chip at the reference scenario.

Mirrors the reference's offline benchmark (test/dataset_main.cpp:101-135):
640x480 frames, keyframe at frame 0 with GT depth bounds, per-frame timed
updates, then a 200-iteration TV-L1 denoise. Baseline: 38.2 ms/update
(26.2 fps) on the reference GPU (paper Table II, BASELINE.md); north-star
target is >= 50 frames/s/chip.

The headline ``value`` is the offline replay rate with the recorded
dataset staged in device memory — the better of per-frame dispatch (the
reference's loop shape) and K-frame scanned chunks (robust to dispatch-RPC
storms on this link). That is the apples-to-apples analog of the reference
benchmark, whose frames sit in host RAM and reach the GPU over multi-GB/s
PCIe as part of the timed update (src/depthmap.cpp:103-106) — a negligible
cost there. This
environment's TPU sits behind a tunnel whose H2D tops out around 120 MB/s
nominal and degrades by >10x in bad windows, so a per-frame-fed number
measures the benching link, not the chip; it is still reported as
``streaming_fps``/``update_ms``, with the probed ``h2d_mbps`` alongside so
a bad window is identifiable in the artifact.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_UPDATE_S = 0.0382       # paper Table II, 'over table' mean update time
REF_DENOISE_S = 0.1107      # paper Table II, 200-iteration denoise


def _tunnel_alive(timeout_s=300.0) -> bool:
    """A dead benching link must yield a diagnosable artifact line, not a
    hang (round 5 observed multi-hour stretches where even jax.devices()
    blocked). Runs the first device op on a watchdog thread."""
    import threading

    ok = threading.Event()

    def ping():
        import jax
        import jax.numpy as jnp

        float(jnp.sum(jax.device_put(np.ones((8, 8), np.float32))))
        ok.set()

    t = threading.Thread(target=ping, daemon=True)
    t.start()
    t.join(timeout_s)
    return ok.is_set()


def main():
    if not _tunnel_alive():
        import os

        print(json.dumps({
            "metric": "depthmap_update_fps_per_chip", "value": None,
            "unit": "frames/s/chip", "vs_baseline": None,
            "error": "benching tunnel unresponsive: first device op did "
                     "not complete within 300 s (see CLAUDE.md tunnel "
                     "facts; recorded r5 runs carry the real numbers)",
        }))
        os._exit(1)          # the hung ping thread cannot be joined

    import jax
    import jax.numpy as jnp

    from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
    from rpg_open_remode_tpu.models.depthmap import Depthmap
    from rpg_open_remode_tpu.utils import synthetic

    # --- per-pass spread + tunnel-health recording (VERDICT r3 item 3):
    # every operating point records ALL its passes (ms/frame), their
    # mean/var (the reference prints mean and variance of update times,
    # test/dataset_main.cpp:123-135), and the headline-selection value;
    # the H2D tunnel is probed between paths so each number can be judged
    # against the window it was captured in (windows swing +-30%).
    spread: dict = {}
    probes: list = []
    # per-operating-point compute-efficiency accounting (VERDICT r4 item 3):
    # planes actually swept at the kernel's block granularity, algorithmic
    # sweep FLOPs, and MFU vs the chip's nominal bf16 peak — measured on the
    # steady (post-timing) state with the point's last frame, i.e. the same
    # convergence regime the fps number was captured in
    efficiency: dict = {}

    def account(name, e, img, T, dt_s):
        from rpg_open_remode_tpu.ops import accounting

        try:
            efficiency[name] = accounting.frame_accounting(e, img, T, dt_s)
        except Exception as exc:            # noqa: BLE001
            efficiency[name] = {"error": repr(exc)}

    def rec(name, times_s):
        ms = [1e3 * t for t in times_s]
        spread[name] = {
            "passes_ms_per_frame": [round(v, 3) for v in ms],
            "mean_ms": round(float(np.mean(ms)), 3),
            "var_ms2": round(float(np.var(ms)), 5),
            "best_ms": round(min(ms), 3),
        }

    def probe_h2d(label):
        buf = np.random.default_rng(0).random((480, 640)).astype(np.float32)
        jax.device_put(buf)                      # warm the path
        t0 = time.perf_counter()
        for _ in range(8):
            dp = jax.device_put(buf)
        float(jnp.sum(dp))
        mbps = buf.nbytes * 8 / (time.perf_counter() - t0) / 1e6
        probes.append({"after": label, "h2d_mbps": round(mbps, 1)})
        return mbps

    n_frames = 60
    warmup = 5
    frames = synthetic.generate(n_frames=n_frames, width=640, height=480, seed=1)
    f0 = frames[0]
    d0 = f0.depth[np.isfinite(f0.depth)]

    # feed 8-bit frames, as a camera would (the reference ingests CV_8U and
    # converts to float/255 on device too, depthmap.cpp:103-106); this also
    # quarters the host->device transfer per frame
    def as_u8(img):
        return np.clip(img * 255.0, 0, 255).astype(np.uint8)

    images_u8 = [as_u8(fr.image) for fr in frames]

    cfg = RemodeConfig()
    eng = Depthmap(640, 480, fx=481.2, cx=319.5, fy=-480.0, cy=239.5, cfg=cfg)

    def Tcw(fr):
        T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
        return np.linalg.inv(T)[:3].astype(np.float32)

    eng.set_reference_image(images_u8[0], Tcw(f0), d0.min(), d0.max())

    def force():
        # On this backend only a device->host transfer actually drains the
        # execution queue (block_until_ready returns before the work runs),
        # so force with a scalar fetch.
        return float(jnp.sum(eng.state.mu))

    # warmup: compile + a few steady-state frames
    for i, fr in enumerate(frames[1 : warmup + 1], 1):
        eng.update(images_u8[i], Tcw(fr))
    force()

    # streaming throughput: dispatch every frame back-to-back (as the live
    # mapping loop does), drain once at the end; best of three passes damps
    # tunnel-latency noise
    bench_frames = list(enumerate(frames))[warmup + 1 :]
    # every pass restores the post-warmup state (untimed) so min() picks
    # the least-noisy pass of IDENTICAL work — otherwise later passes
    # replay on an ever-more-converged state that legitimately sweeps
    # fewer seeds, and min() would report that cheaper pass
    probe_h2d("warmup")
    snap = eng.state
    pass_times = []
    for _ in range(3):
        eng.state = snap
        t0 = time.perf_counter()
        for i, fr in bench_frames:
            eng.update(images_u8[i], Tcw(fr))
        force()
        pass_times.append((time.perf_counter() - t0) / len(bench_frames))
    rec("streaming", pass_times)
    mean_update = min(pass_times)
    fps = 1.0 / mean_update

    # single-frame latency (includes the host<->device round trip)
    t0 = time.perf_counter()
    eng.update(images_u8[bench_frames[-1][0]], Tcw(bench_frames[-1][1]))
    force()
    latency_s = time.perf_counter() - t0

    # accuracy vs analytic ground truth
    conv = eng.convergence_map()
    mu = eng.depthmap()
    converged = conv == int(ConvergenceState.CONVERGED)
    depth_range = float(d0.max() - d0.min())
    if converged.any():
        err = np.abs(mu - f0.depth)[converged]
        rmse = float(np.sqrt(np.mean(err**2)))
        median_err = float(np.median(err))
        within = float((err < 0.026 * depth_range).mean())
    else:
        rmse, median_err, within = float("nan"), float("nan"), 0.0

    # denoise timing: marginal per-call cost over a chained batch (only a
    # device->host transfer drains this backend's queue; the fixed round
    # trip is subtracted). Varying lambda defeats any result caching.
    from rpg_open_remode_tpu.utils.profiling import Timer

    eng.denoised_depthmap(0.5, 200)
    denoise_s = max(
        Timer.amortized(
            lambda j: eng._jit_denoise(
                eng.state, lam=0.5 + 1e-4 * j, iterations=200
            ),
            n=24,
            repeats=2,
        ),
        1e-9,
    )

    # full keyframe-lifecycle loop (DepthmapNode): switch policy, metrics,
    # async denoise+export — the path an application actually runs. The
    # lagged policy (models/node.py) keeps it within ~1.3x of the bare
    # engine number above; jits are shared with the engine benched above,
    # so compile cost does not recur.
    from rpg_open_remode_tpu.models.node import DepthmapNode

    probe_h2d("streaming+denoise")
    bounds = (float(d0.min()), float(d0.max()))
    node_times = []
    node_kf = 0
    for _ in range(2):       # fresh node per pass: identical work per pass
        eng2 = Depthmap(640, 480, fx=481.2, cx=319.5, fy=-480.0, cy=239.5,
                        cfg=cfg)
        node = DepthmapNode(eng2, denoise_on_completion=True)
        for i in range(0, warmup + 1):
            node.process_frame(images_u8[i], Tcw(frames[i]), *bounds)
        node.drain()
        float(jnp.sum(eng2.state.mu))
        t0 = time.perf_counter()
        for i in range(warmup + 1, n_frames):
            node.process_frame(images_u8[i], Tcw(frames[i]), *bounds)
        node.drain()
        float(jnp.sum(eng2.state.mu))
        node_times.append((time.perf_counter() - t0) / (n_frames - warmup - 1))
        node_kf = len(node.keyframes)
        node.close()
    rec("node_lifecycle", node_times)
    node_dt = min(node_times)

    # offline chunked replay (the reference's recorded-dataset mode,
    # test/dataset_main.cpp:101-135, with the dataset staged on device):
    # K frames scanned inside one dispatch (Depthmap.update_chunk). This
    # isolates device compute from the tunnel's per-dispatch RPC overhead
    # and ~120 MB/s H2D ceiling, both artifacts of the benching link — on a
    # real TPU host the 0.3 MB/frame H2D is negligible.
    K = 16
    eng3 = Depthmap(640, 480, fx=481.2, cx=319.5, fy=-480.0, cy=239.5, cfg=cfg)
    eng3.set_reference_image(images_u8[0], Tcw(f0), d0.min(), d0.max())
    d_imgs = jax.device_put(np.stack(images_u8))
    d_Ts = jax.device_put(np.stack([Tcw(fr) for fr in frames]))
    float(jnp.sum(d_imgs.astype(jnp.float32)))
    eng3.update_chunk(d_imgs[1 : 1 + K], d_Ts[1 : 1 + K])   # warm compile
    float(jnp.sum(eng3.state.mu))
    chunk_starts = list(range(1 + K, n_frames - K + 1, K))
    # restore the post-warmup state before each pass (see streaming note)
    snap3 = eng3.state
    offline_times = []
    for _ in range(3):
        eng3.state = snap3
        t0 = time.perf_counter()
        for s in chunk_starts:
            eng3.update_chunk(d_imgs[s : s + K], d_Ts[s : s + K])
        float(jnp.sum(eng3.state.mu))
        offline_times.append(
            (time.perf_counter() - t0) / (K * len(chunk_starts))
        )
    rec("offline_chunked", offline_times)
    offline_dt = min(offline_times)

    # offline staged per-frame replay: the same device-resident dataset
    # driven one update per frame (exactly the reference's loop shape,
    # dataset_main.cpp:101-135, with frames already in fast memory). In
    # good windows this beats the K-frame scan (no scan-carry overhead);
    # in RPC-storm windows the scan wins by paying 1/K of the dispatches.
    # The headline takes the better of the two honest offline methods.
    eng4 = Depthmap(640, 480, fx=481.2, cx=319.5, fy=-480.0, cy=239.5, cfg=cfg)
    eng4.set_reference_image(images_u8[0], Tcw(f0), d0.min(), d0.max())
    # pre-slice both stacks: an in-loop d_imgs[i] is a dynamic-slice
    # dispatch of its own through the tunnel, doubling per-frame dispatches
    d_imgs_list = [d_imgs[i] for i in range(n_frames)]
    d_Ts_list = [d_Ts[i] for i in range(n_frames)]
    for i in range(1, warmup + 1):
        eng4.update(d_imgs_list[i], d_Ts_list[i])
    float(jnp.sum(eng4.state.mu))
    snap4 = eng4.state
    staged_times = []
    for _ in range(3):    # best-of-3: tunnel windows swing +-30%
        eng4.state = snap4
        t0 = time.perf_counter()
        for i in range(warmup + 1, n_frames):
            eng4.update(d_imgs_list[i], d_Ts_list[i])
        float(jnp.sum(eng4.state.mu))
        staged_times.append(
            (time.perf_counter() - t0) / (n_frames - warmup - 1)
        )
    rec("offline_staged", staged_times)
    staged_dt = min(staged_times)
    best_offline_dt = min(offline_dt, staged_dt)
    probe_h2d("offline")
    end4 = eng4.state
    account("offline_staged_steady", eng4, d_imgs_list[-1], d_Ts_list[-1],
            staged_dt)
    eng4.state = snap4
    account("offline_staged_young", eng4, d_imgs_list[warmup + 1],
            d_Ts_list[warmup + 1], staged_dt)
    eng4.state = end4

    # the paper's other two Table II operating points, as staged per-frame
    # replays (same method as offline_staged above): fast motion (640x480,
    # 1.61 m/s @ 60 fps = 0.0268 m/frame, padded depth bounds as in eval.py;
    # baseline 49.9 ms) and live-camera resolution (752x480, baseline
    # 30.1 ms). Fast motion reuses the 640x480 jits; 752x480 compiles once.
    def staged_point(name, width, height, cam_kw, step, bound_pad,
                     n=28, wu=4, point_cfg=cfg, n_pass=3):
        seq = synthetic.generate(
            n_frames=n, width=width, height=height, cam=cam_kw, seed=1,
            step=step,
        )
        g0 = seq[0].depth[np.isfinite(seq[0].depth)]
        e = Depthmap(width, height, fx=cam_kw["fx"], cx=cam_kw["cx"],
                     fy=cam_kw["fy"], cy=cam_kw["cy"], cfg=point_cfg)
        e.set_reference_image(
            as_u8(seq[0].image), Tcw(seq[0]),
            bound_pad[0] * float(g0.min()), bound_pad[1] * float(g0.max()),
        )
        imgs = [jax.device_put(as_u8(fr.image)) for fr in seq]
        Ts = [jax.device_put(Tcw(fr)) for fr in seq]
        for i in range(1, wu + 1):
            e.update(imgs[i], Ts[i])
        float(jnp.sum(e.state.mu))
        sn = e.state
        times = []
        for _ in range(n_pass):
            e.state = sn
            t0 = time.perf_counter()
            for i in range(wu + 1, n):
                e.update(imgs[i], Ts[i])
            float(jnp.sum(e.state.mu))
            times.append((time.perf_counter() - t0) / (n - wu - 1))
        rec(name, times)
        probe_h2d(name)
        # account BOTH regimes the passes averaged over: the post-warmup
        # (young, wide-band) state and the end (converged) state — the
        # sweep's cost profile differs ~10x between them
        end_state = e.state
        account(f"{name}_steady", e, imgs[-1], Ts[-1], min(times))
        e.state = sn
        account(f"{name}_young", e, imgs[wu + 1], Ts[wu + 1], min(times))
        e.state = end_state
        return 1.0 / min(times), e

    fast_fps, _ = staged_point(
        "fast_motion", 640, 480, dict(fx=481.2, fy=-480.0, cx=319.5, cy=239.5),
        step=0.0268, bound_pad=(0.5, 2.5),
    )
    live_fps, _ = staged_point(
        "live_752", 752, 480, dict(fx=481.2, fy=-480.0, cx=375.5, cy=239.5),
        step=0.023, bound_pad=(1.0, 1.0),
    )

    # beyond-reference scale: 1280x720 (2.55x the pixels of the reference's
    # largest 752x480 operating point; the denoiser exceeds the
    # all-in-VMEM budget here and runs the banded/chunked Pallas kernel).
    # point_cfg=None: the engine picks the focal-scaled SHIPPED defaults
    # (9x9 patch at the reference's angular footprint + doubled disparity
    # window, RemodeConfig.for_camera) — the config the HD accuracy row in
    # EVAL.json is measured at. The reference has no HD number — no
    # vs_baseline is reported.
    # n=40 frames: the reference's protocol (dataset_main.cpp:101-135) and
    # the 640 point above average a full keyframe life — young wide-band
    # frames AND the cheap converged tail — not just the expensive first
    # dozen. (Before round 5's column-blocked resampler the tail was
    # warp-fallback-bound and the points were truncated to dodge it; the
    # cliff is fixed, so the honest protocol is also the representative one.)
    hd_cam = dict(fx=962.4, fy=-960.0, cx=639.5, cy=359.5)
    hd_fps, eng_hd = staged_point("hd_720p", 1280, 720, hd_cam, step=0.023,
                                  bound_pad=(1.0, 1.0), n=40, wu=3,
                                  point_cfg=None)
    # denoise timing reuses the converged-ish engine the fps point built
    eng_hd.denoised_depthmap(0.5, 200)
    hd_denoise_s = max(
        Timer.amortized(
            lambda j: eng_hd._jit_denoise(
                eng_hd.state, lam=0.5 + 1e-4 * j, iterations=200
            ),
            n=12,
            repeats=2,
        ),
        1e-9,
    )

    # full-HD 1920x1080 (5.8x the reference's largest point; focal-scaled
    # config: 15x15 patch, 383 planes). Guarded: a compile failure or OOM
    # at this scale must not void the rest of the artifact.
    fhd_fps = fhd_denoise_s = None
    try:
        fhd_cam = dict(fx=1443.6, fy=-1440.0, cx=959.5, cy=539.5)
        fhd_fps, eng_fhd = staged_point(
            "fhd_1080p", 1920, 1080, fhd_cam, step=0.023,
            bound_pad=(1.0, 1.0), n=40, wu=2, point_cfg=None, n_pass=2,
        )
        eng_fhd.denoised_depthmap(0.5, 200)
        fhd_denoise_s = max(
            Timer.amortized(
                lambda j: eng_fhd._jit_denoise(
                    eng_fhd.state, lam=0.5 + 1e-4 * j, iterations=200
                ),
                n=8,
                repeats=2,
            ),
            1e-9,
        )
    except Exception as exc:             # noqa: BLE001
        spread["fhd_1080p"] = {"error": repr(exc)}

    h2d_mbps = probe_h2d("final")

    result = {
        "metric": "depthmap_update_fps_per_chip",
        "value": round(1.0 / best_offline_dt, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round((1.0 / best_offline_dt) * REF_UPDATE_S, 3),
        "streaming_fps": round(fps, 2),
        "update_ms": round(mean_update * 1000, 2),
        "update_latency_ms": round(latency_s * 1000, 2),
        "h2d_mbps": round(h2d_mbps, 1),
        "node_fps": round(1.0 / node_dt, 2),
        "offline_chunked_fps": round(1.0 / offline_dt, 2),
        "offline_staged_fps": round(1.0 / staged_dt, 2),
        "node_keyframes": node_kf,
        "fast_motion_fps": round(fast_fps, 2),
        "fast_motion_vs_baseline": round(fast_fps * 0.0499, 3),
        "live_752_fps": round(live_fps, 2),
        "live_752_vs_baseline": round(live_fps * 0.0301, 3),
        "hd_720p_fps": round(hd_fps, 2),
        "hd_720p_denoise_ms": round(hd_denoise_s * 1000, 1),
        "fhd_1080p_fps": round(fhd_fps, 2) if fhd_fps else None,
        "fhd_1080p_denoise_ms": (
            round(fhd_denoise_s * 1000, 1) if fhd_denoise_s else None
        ),
        "denoise_200it_ms": round(denoise_s * 1000, 1),
        "denoise_vs_baseline": round(REF_DENOISE_S / denoise_s, 3),
        "converged_percent": round(100 * float(converged.mean()), 2),
        "depth_rmse_m": round(rmse, 4),
        "depth_median_err_m": round(median_err, 4),
        "within_2p6pct_range": round(within, 3),
        "backend": jax.default_backend(),
        # per-pass spread + between-path tunnel probes (VERDICT r3 item 3):
        # headline values select best-of-passes (documented above), the
        # spread makes that selection auditable per operating point
        "spread": spread,
        "h2d_probes": probes,
        # per-point sweep-work accounting (ops/accounting.py): planes at
        # the kernel's block granularity, skip ratio vs the full cost
        # volume, algorithmic sweep FLOPs, and MFU vs the v5e nominal
        # bf16 peak (197 TFLOP/s) over the measured frame time
        "efficiency": efficiency,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

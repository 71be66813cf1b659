"""Sweep-kernel roofline: measured sweep-only cost vs an instruction-issue
bound, per operating point (VERDICT r4 items 1+3 — the artifact that
distinguishes "done" from "3x left on the table").

Method: at each width, run the engine to a mid-convergence state, then time
the Pallas disparity sweep ALONE with the scanned-amortization trick
(utils/profiling.Timer.amortized over a lax.scan of K perturbed calls —
single-call timings through this tunnel are garbage, CLAUDE.md), alongside
the same per-block plane accounting the kernel's scalar prefetch uses.

The bound: the sweep is VPU-instruction-issue dominated (MXU sits at ~3-4%
of peak; HBM traffic per plane-block is ~0 — inputs live in VMEM across the
whole per-block plane loop). Issue slots per executed plane are enumerated
from the kernel source (ops/sweep_pallas.py group loop): elementwise ops
count ceil(rows*width/1024) vector instructions each (8x128 lanes/vreg),
matmuls count 128x128 MXU tiles x 6 passes (precision=HIGHEST). The clock
is taken as 0.94-1.5 GHz (public v5e peak implies ~1.5 GHz on 4 MXUs; the
conservative end is the v4-era 0.94) — the artifact reports the bound as a
range and the measured time's position in it.

Writes ROOFLINE_r05.json. Run on the real TPU.
"""

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from rpg_open_remode_tpu.config import RemodeConfig           # noqa: E402
from rpg_open_remode_tpu.models.depthmap import Depthmap      # noqa: E402
from rpg_open_remode_tpu.ops import accounting, sweep_pallas  # noqa: E402
from rpg_open_remode_tpu.ops import rect_match                # noqa: E402
from rpg_open_remode_tpu.utils import se3, synthetic          # noqa: E402
from rpg_open_remode_tpu.utils.profiling import Timer         # noqa: E402

POINTS = [
    ("640x480", 640, 480, 481.2, -480.0, 10),
    ("1280x720", 1280, 720, 962.4, -960.0, 8),
    ("1920x1080", 1920, 1080, 1443.6, -1440.0, 6),
]
K = 8            # scanned calls per timing


def vregs(rows, width):
    return -(-rows * width // 1024)


def issue_slots_per_plane_block(rows, tile, hp, mxu_xbox):
    """Enumerated from ops/sweep_pallas._sweep_kernel's per-plane body."""
    v_main = vregs(rows, tile)          # [rows, tile] arrays
    v_halo = vregs(rows, tile + 2 * hp)
    slots = 0.0
    slots += v_halo                      # prod multiply
    if mxu_xbox:
        # [rows, tile+2hp] @ [tile+2hp, tile]: MXU 128x128 tiles x 6 passes
        slots += (-(-(tile + 2 * hp) // 128)) * (-(-tile // 128)) \
            * (-(-rows // 128) or 1) * 6
    else:
        slots += 2 * hp * v_main         # separable adds
    # y-box matmul [rows, rows] @ [rows, 3*tile], 6 passes
    slots += (-(-rows // 128) or 1) * (-(-3 * tile // 128)) * 6
    # ncc arithmetic: num(3) + den_l(3) + rsqrt-chain(3) + x_src(1)
    slots += 10 * v_main
    # masks: 6 compares + 5 logicals + 1 select
    slots += 12 * v_main
    # argmax/parabolic bookkeeping: ~7 selects/compares + prev store
    slots += 8 * v_main
    # group-hoisted xbw_c/xbw_cc amortized over GROUP planes
    slots += (2 * (2 * hp + 1) * vregs(rows, tile + sweep_pallas.GROUP))\
        / sweep_pallas.GROUP
    # window roll amortized
    slots += vregs(rows, 512) / sweep_pallas.GROUP
    return slots


def main():
    out = {"method": __doc__.strip().splitlines()[0],
           "clock_ghz_range": [0.94, 1.5], "points": []}
    for name, w, h, fx, fy, wu in POINTS:
        cam_kw = dict(fx=fx, fy=fy, cx=(w - 1) / 2, cy=(h - 1) / 2)
        cfg = RemodeConfig.for_camera(fx)
        frames = synthetic.generate(n_frames=wu + 4, width=w, height=h,
                                    cam=cam_kw, seed=1, step=0.023)
        f0 = frames[0]
        d = f0.depth[np.isfinite(f0.depth)]
        eng = Depthmap(w, h, fx=fx, cx=cam_kw["cx"], fy=fy, cy=cam_kw["cy"],
                       cfg=cfg)

        def Tcw(fr):
            T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
            return np.linalg.inv(T)[:3].astype(np.float32)

        eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
        for fr in frames[1:wu + 1]:
            eng.update(fr.image, Tcw(fr))
        float(jnp.sum(eng.state.mu))

        # the exact sweep inputs the next update would run
        tgt = frames[wu + 1]
        T_curr_ref = se3.compose(
            jnp.asarray(Tcw(tgt)), eng.state.T_world_ref
        )
        import dataclasses

        from rpg_open_remode_tpu.ops import seed_check

        border = seed_check.border_mask(h, w, cfg)
        conv1 = seed_check.classify_seeds(
            eng.state.mu, eng.state.sigma_sq, eng.state.a, eng.state.b,
            eng.state.scene.epsilon, border, cfg,
        )
        st = dataclasses.replace(eng.state, conv=conv1)
        prep = jax.jit(
            lambda s, img, T: rect_match.prepare_sweep(
                s, img.astype(jnp.float32), T, eng.cam, cfg
            )
        )(st, jnp.asarray(tgt.image), T_curr_ref)
        curr_r = prep["curr_img_r"]
        ref_r, valid_r = prep["ref_img_r"], prep["valid_r"]
        xlim = prep["xlim"]
        dlo, dhi = prep["disp_lo"], prep["disp_hi"]
        float(jnp.sum(curr_r))

        eps = jnp.asarray(
            np.random.default_rng(0).normal(0, 1e-6, K).astype(np.float32)
        )

        def scanned(o):
            def f(acc, e):
                r = sweep_pallas.disparity_sweep(
                    curr_r + (e + o), xlim, ref_r, valid_r, dlo, dhi,
                    cfg.ncc_threshold, cfg.num_planes, cfg.disp_pad,
                    cfg.patch_side, cfg.subplane_refine,
                )
                return acc + r[1].sum(), None
            acc, _ = jax.lax.scan(f, 0.0, eps)
            return acc

        jfn = jax.jit(scanned)
        offs = jnp.asarray(
            np.random.default_rng(1).normal(0, 1e-7, 8).astype(np.float32))
        sweep_s = Timer.amortized(lambda i: jfn(offs[i % 8]), n=6,
                                  repeats=2) / K

        acct = accounting.frame_accounting(
            eng, jnp.asarray(tgt.image), Tcw(tgt), sweep_s
        )
        rect_w = int(prep["ref_img_r"].shape[1])
        tile = 256 if rect_w % 256 == 0 else 128
        rows = sweep_pallas.BAND + 2 * sweep_pallas.HALO
        hp = cfg.patch_side // 2
        pb = acct["planes_exec"] + acct["coarse_planes_exec"]
        slots = issue_slots_per_plane_block(rows, tile, hp, hp >= 4)
        bound_ms = [pb * slots / (c * 1e9) * 1e3 for c in (1.5, 0.94)]
        visits = acct["planes_exec"] * sweep_pallas.BAND * tile
        out["points"].append({
            "point": name, "patch": cfg.patch_side,
            "num_planes": cfg.num_planes, "tile": tile,
            "sweep_ms_measured": round(sweep_s * 1e3, 3),
            "plane_blocks_exec": pb,
            "ns_per_plane_block": round(sweep_s * 1e9 / max(pb, 1), 1),
            "plane_pixel_visits_g_per_s": round(
                visits / sweep_s / 1e9, 2),
            "issue_slots_per_plane_block_model": round(slots, 1),
            "issue_bound_ms_at_1p5_to_0p94_ghz": [
                round(b, 2) for b in bound_ms],
            "measured_over_bound_pct": [
                round(100 * b / (sweep_s * 1e3), 1) for b in bound_ms],
            "sweep_gflops_alg": acct["sweep_gflops_alg"],
            "mxu_exec_pct_of_peak_during_sweep": round(
                acct["sweep_gflops_exec_mxu"] / (sweep_s * 1e3)
                / accounting.PEAK_BF16_TFLOPS * 100, 2),
        })
        print(json.dumps(out["points"][-1]), flush=True)

    with open("ROOFLINE_r05.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

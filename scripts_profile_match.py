"""One-off: sub-phase TPU timing of match_rectified at 640 and 752 wide.

Same scanned-amortization method as scripts_profile_update.py.
"""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.depthmap import update_step, _prep_traced
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.ops import epipolar, rect_match, seed_init, sweep_pallas
from rpg_open_remode_tpu.utils import se3, synthetic, warp as warp_ops
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.utils.profiling import Timer, force

import os
K = int(os.environ.get("PROFILE_K", "16"))
WARMUP = int(os.environ.get("PROFILE_WARMUP", "8"))


def profile(W, H):
    # focal length per the bench convention: 640 and 752 wide use the real
    # camera's fx=481.2 (bench.py/eval.py), 1280 uses the doubled 962.4;
    # other widths scale continuously with W so disparity statistics stay
    # plausible (but only 640/752/1280 correspond to bench operating points)
    fscale = {640: 1.0, 752: 1.0, 1280: 2.0}.get(W, W / 640.0)
    # focal-scaled SHIPPED defaults (reference-exact at fx<=481): the same
    # config the bench/eval operating points run at
    cfg = RemodeConfig.for_camera(481.2 * fscale)
    cam_kw = dict(fx=481.2 * fscale, fy=-480.0 * fscale,
                  cx=(W - 1) / 2, cy=(H - 1) / 2)
    n_frames = K + 8
    # the measured frame must exist and must not have been consumed by warmup
    assert WARMUP < n_frames, f"PROFILE_WARMUP={WARMUP} >= {n_frames} frames"
    frames = synthetic.generate(n_frames=n_frames, width=W, height=H, seed=1,
                                cam=cam_kw)
    cam = PinholeCamera.create(**cam_kw)
    f0 = frames[0]
    d = f0.depth[np.isfinite(f0.depth)]
    scene = SceneParams.create(d.min(), d.max(), cfg)
    state = seed_init.init_seeds(
        empty_state(H, W, cam), jnp.asarray(f0.image),
        jnp.asarray(f0.T_world_curr), scene, cfg)

    def T_cw(fr):
        return np.linalg.inv(np.concatenate(
            [fr.T_world_curr, [[0, 0, 0, 1]]]))[:3].astype(np.float32)

    imgs = jnp.asarray(np.stack([fr.image for fr in frames]))
    Ts = jnp.asarray(np.stack([T_cw(fr) for fr in frames]))
    step = jax.jit(lambda st, img, T: update_step(st, img, T, cam, cfg))
    for i in range(1, WARMUP):
        state, _ = step(state, imgs[i], Ts[i])
    force(state.mu)
    print(f"[{W}x{H}] warmup done", flush=True)

    # measure the first frame the warmup did NOT consume (frames 1..WARMUP-1
    # were warmed through the filter above)
    M = WARMUP
    g = rect_match.rect_geometry(
        se3.compose(Ts[M], state.T_world_ref), cam, H, W)
    rect_h, rect_w = g["rect_h"], g["rect_w"]
    print(f"[{W}x{H}] rect grid {rect_h}x{rect_w}, "
          f"tile={256 if rect_w % 256 == 0 else 128}")
    eps = jnp.asarray(
        np.random.default_rng(0).normal(0, 1e-6, K).astype(np.float32))

    def scanned(body):
        def outer(o):
            def f(acc, xs):
                i, e = xs
                return acc + body(i, e + o), None
            acc, _ = jax.lax.scan(f, 0.0, (jnp.arange(K), eps))
            return acc
        return jax.jit(outer)

    sigma = jnp.sqrt(state.sigma_sq)
    d_lo = jnp.maximum(state.mu - cfg.sigma_band * sigma, cfg.min_search_depth)
    d_hi = state.mu + cfg.sigma_band * sigma
    rz = jnp.maximum(
        jnp.einsum("j,jhw->hw", g["R_rect"][2], state.f_ref), 1e-3)
    active = (state.conv == int(ConvergenceState.UPDATE)).astype(jnp.float32)
    ref_stack = jnp.stack([
        state.ref_img, jnp.maximum(d_lo * rz, 1e-4),
        jnp.maximum(state.mu * rz, 1e-4), jnp.maximum(d_hi * rz, 1e-4),
        jnp.ones_like(state.mu), active])

    ref_r, _, _ = warp_ops.homography_warp(
        ref_stack, g["H_rect_to_ref"], rect_h, rect_w)
    xlim = rect_match._footprint_xlim(
        g["H_curr_to_rect"], H, W, rect_h,
        reach=cfg.patch_side // 2 + 1.5, vrows=cfg.patch_side)
    fxB = jnp.abs(g["s"]) * g["B"]
    z_lo_r, z_mu_r, z_hi_r = ref_r[1], ref_r[2], ref_r[3]
    disp_lo = fxB / z_hi_r
    disp_hi = fxB / z_lo_r
    disp_mu = fxB / z_mu_r
    half = 0.5 * jnp.minimum(disp_hi - disp_lo, cfg.max_epipolar_extent)
    disp_lo = jnp.maximum(disp_lo, disp_mu - half)
    disp_hi = jnp.minimum(disp_hi, disp_mu + half)
    act = ref_r[5] > 1e-3
    disp_lo = jnp.where(act, disp_lo, jnp.inf)
    disp_hi = jnp.where(act, disp_hi, -jnp.inf)
    curr_r, _, _ = warp_ops.homography_warp(
        imgs[M], g["H_rect_to_curr"], rect_h,
        rect_w + 2 * cfg.disp_pad, x0=-float(cfg.disp_pad))
    force(curr_r)

    j_refwarp = scanned(lambda i, e: warp_ops.homography_warp(
        ref_stack + e, g["H_rect_to_ref"], rect_h, rect_w)[0].sum())
    j_currwarp = scanned(lambda i, e: warp_ops.homography_warp(
        imgs[i] + e, g["H_rect_to_curr"], rect_h,
        rect_w + 2 * cfg.disp_pad,
        x0=-float(cfg.disp_pad))[0].sum())
    j_sweep = scanned(lambda i, e: sweep_pallas.disparity_sweep(
        curr_r + e, xlim, ref_r[0], ref_r[4], disp_lo, disp_hi,
        cfg.ncc_threshold, cfg.num_planes, cfg.disp_pad,
        cfg.patch_side, cfg.subplane_refine)[1].sum())
    out_stack = jnp.stack([ref_r[0], ref_r[4], ref_r[5]])
    j_backwarp = scanned(lambda i, e: warp_ops.homography_warp(
        out_stack + e, g["H_ref_to_rect"], H, W)[0].sum())
    j_match = scanned(lambda i, e: epipolar.match(
        dataclasses.replace(state, mu=state.mu + e), _prep_traced(imgs[i]),
        se3.compose(Ts[i], state.T_world_ref), cam, cfg).best_ncc.sum())

    offs = jnp.asarray(
        np.random.default_rng(1).normal(0, 1e-7, 8).astype(np.float32))
    for name, fn in [("ref warp (6ch)", j_refwarp),
                     ("curr warp (wide)", j_currwarp),
                     ("sweep kernel", j_sweep),
                     ("back-warp (3ch)", j_backwarp),
                     ("FULL match", j_match)]:
        ms = Timer.amortized(lambda i: fn(offs[i % 8]), n=6, repeats=2) \
            * 1e3 / K
        print(f"  {name:18s} {ms:7.3f} ms/iter")


for a in (sys.argv[1:] or ["640", "752"]):
    w, _, h = a.partition("x")
    profile(int(w), int(h) if h else 480)

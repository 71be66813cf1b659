"""One-off: parity + timing of the Pallas warp path on a 752-wide source."""
import numpy as np
import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.ops import rect_match
from rpg_open_remode_tpu.utils import se3, synthetic, warp as warp_ops
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.utils.profiling import Timer, force

W, H = 752, 480
cam_kw = dict(fx=481.2, fy=-480.0, cx=(W - 1) / 2, cy=(H - 1) / 2)
frames = synthetic.generate(n_frames=3, width=W, height=H, seed=1, cam=cam_kw)
cam = PinholeCamera.create(**cam_kw)

def T_cw(fr):
    return np.linalg.inv(np.concatenate(
        [fr.T_world_curr, [[0, 0, 0, 1]]]))[:3].astype(np.float32)

T_curr_ref = se3.compose(jnp.asarray(T_cw(frames[2])),
                         jnp.asarray(frames[0].T_world_curr))
g = rect_match.rect_geometry(T_curr_ref, cam, H, W)
rect_h, rect_w = g["rect_h"], g["rect_w"]
print("rect", rect_h, rect_w)
img = jnp.asarray(np.stack([frames[0].image] * 6))  # 6ch like ref_stack

for name, Hm, ow in [
    ("ref->rect  6ch", g["H_rect_to_ref"], rect_w),
    ("curr->rect wide 1ch", g["H_rect_to_curr"],
     rect_w + 2 * rect_match.DISP_PAD),
]:
    src = img if "6ch" in name else img[0]
    a = jax.jit(lambda s: warp_ops.homography_warp(
        s, Hm, rect_h, ow, x0=-128.0 if "wide" in name else 0.0,
        impl="xla")[0])
    b = jax.jit(lambda s: warp_ops.homography_warp(
        s, Hm, rect_h, ow, x0=-128.0 if "wide" in name else 0.0,
        impl="pallas")[0])
    ra, rb = np.asarray(a(src)), np.asarray(b(src))
    err = np.max(np.abs(ra - rb))
    eps = jnp.asarray(np.random.default_rng(0).normal(0, 1e-6, 8)
                      .astype(np.float32))
    ta = Timer.amortized(lambda i: a(src + eps[i]).sum(), n=8, repeats=2)
    tb = Timer.amortized(lambda i: b(src + eps[i]).sum(), n=8, repeats=2)
    print(f"{name}: max|diff|={err:.2e}  xla={ta*1e3:.3f} ms  "
          f"pallas={tb*1e3:.3f} ms")

import numpy as np
import jax
import jax.numpy as jnp
from rpg_open_remode_tpu.ops import rect_match
from rpg_open_remode_tpu.utils import se3, synthetic, warp as warp_ops
from rpg_open_remode_tpu.utils.camera import PinholeCamera

W, H = 752, 480
cam_kw = dict(fx=481.2, fy=-480.0, cx=(W-1)/2, cy=(H-1)/2)
frames = synthetic.generate(n_frames=3, width=W, height=H, seed=1, cam=cam_kw)
cam = PinholeCamera.create(**cam_kw)
def T_cw(fr):
    return np.linalg.inv(np.concatenate([fr.T_world_curr, [[0,0,0,1]]]))[:3].astype(np.float32)
T_curr_ref = se3.compose(jnp.asarray(T_cw(frames[2])), jnp.asarray(frames[0].T_world_curr))
g = rect_match.rect_geometry(T_curr_ref, cam, H, W)
rect_h, rect_w = g["rect_h"], g["rect_w"]
img = jnp.asarray(np.stack([frames[0].image]*6))
for name, Hm, ow, x0 in [("ref6ch", g["H_rect_to_ref"], rect_w, 0.0),
                         ("currwide", g["H_rect_to_curr"], rect_w+256, -128.0)]:
    src = img if name=="ref6ch" else img[0]
    want, u, v = warp_ops.homography_warp(src, Hm, rect_h, ow, x0=x0, impl="xla")
    got, _, _ = warp_ops.homography_warp(src, Hm, rect_h, ow, x0=x0, impl="pallas")
    u, v = np.asarray(u), np.asarray(v)
    inside = (u > 2) & (u < W-3) & (v > 2) & (v < H-3)
    d = np.abs(np.asarray(got) - np.asarray(want))
    d = d[:, inside] if name=="ref6ch" else d[inside]
    print(name, "inside frac", inside.mean().round(3), "max|diff| inside:", d.max())

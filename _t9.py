import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
pass
pass
import numpy as np
from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.utils import synthetic

cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
frames = synthetic.generate(n_frames=6, width=160, height=120, cam=cam, seed=3)
f0 = frames[0]
d = f0.depth[np.isfinite(f0.depth)]
def Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)

for trial in range(2):
    cfg = RemodeConfig(num_planes=64) if trial == 0 else RemodeConfig(num_planes=64, ref_compl_perc=8.0)
    eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"], cam["cy"], cfg=cfg)
    eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
    for i, fr in enumerate(frames[1:]):
        try:
            eng.update(fr.image, Tcw(fr))
            print(f"trial {trial} update {i} ok", flush=True)
        except ValueError as e:
            print(f"trial {trial} update {i} FAIL {str(e)[:70]}", flush=True)
            break
    dnz = None if trial >= 0 else eng.denoised_depthmap(0.5, 25)
    print(f"trial {trial} done", flush=True)

import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_captured_constants_warn_bytes", 1)
jax.config.update("jax_captured_constants_report_frames", 3)
import functools
import jax.numpy as jnp
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

jaxprs = []
for trial in range(2):
    cfg = RemodeConfig(num_planes=64) if trial == 0 else RemodeConfig(num_planes=64, ref_compl_perc=8.0)
    eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"], cam["cy"], cfg=cfg)
    eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
    for i, fr in enumerate(frames[1:3]):
        args = (eng.state, eng.input_image(fr.image), jnp.asarray(Tcw(fr)), eng.cam)
        cj = jax.make_jaxpr(functools.partial(dm.update_step, cfg=cfg))(*args)
        print(f"trial {trial} upd {i}: invars={len(cj.jaxpr.invars)} consts={len(cj.consts)}",
              [getattr(c, 'shape', None) for c in cj.consts], flush=True)
        try:
            eng.state, _ = eng._jit_update(*args)
        except ValueError as e:
            print("  FAIL", str(e)[:60], flush=True)
            break

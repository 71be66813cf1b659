import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.utils import synthetic

cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
frames = synthetic.generate(n_frames=4, width=160, height=120, cam=cam, seed=3)
f0 = frames[0]
d = f0.depth[np.isfinite(f0.depth)]
def Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)

for trial in range(2):
    cfg = RemodeConfig(num_planes=64) if trial == 0 else RemodeConfig(num_planes=64, ref_compl_perc=8.0)
    eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"], cam["cy"], cfg=cfg)
    eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
    args = (eng.state, eng.input_image(frames[1].image), jnp.asarray(Tcw(frames[1])), eng.cam)
    print("trial", trial, "arg leaves:", len(jax.tree.leaves(args)))
    try:
        st, stats = eng._jit_update(*args)
        print("  direct call ok")
    except ValueError as e:
        print("  direct call FAILED:", str(e)[:80])
        lowered = eng._jit_update.lower(*args)
        compiled = lowered.compile()
        print("  manual compile params:", len(compiled.input_shardings[0]) if hasattr(compiled, "input_shardings") else "?")
        st, stats = compiled(*args)
        print("  manual compiled call ok")

import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import functools
import jax.numpy as jnp
import numpy as np
from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.utils import synthetic

cam = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
frames = synthetic.generate(n_frames=3, width=160, height=120, cam=cam, seed=3)
f0 = frames[0]
d = f0.depth[np.isfinite(f0.depth)]
def Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)
cfg = RemodeConfig(num_planes=64)
eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"], cam["cy"], cfg=cfg)
eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
args = (eng.state, eng.input_image(frames[1].image), jnp.asarray(Tcw(frames[1])), eng.cam)
closed = jax.make_jaxpr(functools.partial(dm.update_step, cfg=cfg))(*args)
print("n consts:", len(closed.consts))
for c in closed.consts:
    print("  const:", getattr(c, "shape", None), getattr(c, "dtype", None), type(c).__name__)
# find where consts come from: check values
for c in closed.consts:
    print(np.asarray(c))

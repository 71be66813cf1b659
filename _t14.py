import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_check_tracer_leaks", True)
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
cfg = RemodeConfig(num_planes=64)
eng = dm.Depthmap(160, 120, cam["fx"], cam["cx"], cam["fy"], cam["cy"], cfg=cfg)
eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
args0 = (eng.state, eng.input_image(frames[1].image), jnp.asarray(Tcw(frames[1])), eng.cam)
st1, _ = eng._jit_update(*args0)
args1 = (st1, eng.input_image(frames[2].image), jnp.asarray(Tcw(frames[2])), eng.cam)
cj = jax.make_jaxpr(functools.partial(dm.update_step, cfg=cfg))(*args1)
for c in cj.consts:
    print("const:", repr(c)[:120]); import traceback; dbg = getattr(c, "_debug_info", None) or getattr(c, "debug_info", None); print("   dbg:", dbg)
# which leaves of args1 differ in type from args0?
for (p0, a0), (p1, a1) in zip(
    jax.tree_util.tree_leaves_with_path(args0), jax.tree_util.tree_leaves_with_path(args1)
):
    t0, t1 = type(a0).__name__, type(a1).__name__
    w0 = getattr(a0, "weak_type", None) if hasattr(a0, "weak_type") else None
    w1 = getattr(a1, "weak_type", None)
    if t0 != t1 or w0 != w1:
        print("leaf diff", jax.tree_util.keystr(p0), t0, w0, "->", t1, w1)

"""Worker process for the 2-process distributed test (run via subprocess).

Each process owns ONE keyframe of a kf=2 x ty=1 x tx=2 mesh spanning two
processes (2 local CPU devices each). Both processes deterministically
generate the same synthetic scene, seed only their own keyframe locally,
assemble the global sharded state with make_array_from_process_local_data,
run the full sharded update step for several frames, and finally compare
their local block of the result against an independent single-device run
of the same keyframe.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

proc_id = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = int(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from rpg_open_remode_tpu.parallel import distributed  # noqa: E402

distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=n_proc,
    process_id=proc_id,
)
assert jax.process_count() == n_proc, jax.process_count()
assert jax.device_count() == 2 * n_proc, jax.device_count()

from rpg_open_remode_tpu.config import RemodeConfig  # noqa: E402
from rpg_open_remode_tpu.models import depthmap as dm  # noqa: E402
from rpg_open_remode_tpu.models.state import SceneParams, empty_state  # noqa: E402
from rpg_open_remode_tpu.parallel import sharded  # noqa: E402
from rpg_open_remode_tpu.parallel.distributed import (  # noqa: E402
    local_block,
    local_stats,
    make_distributed_mesh,
    replicate_frame,
    shard_local_keyframes,
)
from rpg_open_remode_tpu.utils import se3, synthetic  # noqa: E402
from rpg_open_remode_tpu.utils.camera import PinholeCamera  # noqa: E402

W, H = 64, 48
CAM = dict(fx=48.1, fy=-48.0, cx=(W - 1) / 2.0, cy=(H - 1) / 2.0)
# zero_baseline_fallback ON: its regime dispatch pmax-reduces over the
# kf axis, which here is a CROSS-PROCESS collective — exactly the kind
# of thing this test exists to pin
cfg = RemodeConfig(num_planes=48, use_pallas=False)
cam = PinholeCamera.create(CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"])

frames = synthetic.generate(n_frames=6, width=W, height=H, cam=CAM, seed=11)


def Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)


import jax.numpy as jnp  # noqa: E402

# --- per-process keyframe construction (kf i references frame i) -----------
my_ref = frames[proc_id]
d = my_ref.depth[np.isfinite(my_ref.depth)]
scene = SceneParams.create(float(d.min()), float(d.max()), cfg)
state0 = dm.set_reference(
    empty_state(H, W, cam),
    jnp.asarray(my_ref.image, jnp.float32),
    jnp.asarray(Tcw(my_ref)),
    scene,
    cfg,
)
state_local = jax.tree.map(lambda x: np.asarray(x)[None], state0)

mesh = make_distributed_mesh(kf=n_proc, ty=1)
assert mesh.shape == {"kf": n_proc, "ty": 1, "tx": 2}, mesh.shape

state_g = shard_local_keyframes(mesh, state_local, n_proc)
step = sharded.build_sharded_update(mesh, cam, cfg, H, W)

# --- independent single-device oracle for this process's keyframe ----------
oracle = state0

stats = None
for fr in frames[2:]:
    img = jnp.asarray(fr.image, jnp.float32)
    T = jnp.asarray(Tcw(fr))
    state_g, stats = step(state_g, replicate_frame(mesh, np.asarray(fr.image, np.float32)), T)
    oracle, _ = dm.update_step(oracle, img, T, cam, cfg)

# --- compare: local block of the distributed result vs the oracle ----------
mu_local = local_block(state_g.mu)          # [1, H, W] (this process's kf)
conv_local = local_block(state_g.conv)
np.testing.assert_allclose(
    mu_local[0], np.asarray(oracle.mu), rtol=2e-4, atol=2e-5
)
agree = (conv_local[0] == np.asarray(oracle.conv)).mean()
assert agree > 0.995, agree

st = local_stats(stats)
assert st["converged"].shape == (1,), st["converged"].shape
exp_conv = int((np.asarray(oracle.conv) == 1).sum())
assert int(st["converged"][0]) == exp_conv, (st["converged"], exp_conv)

print(f"proc {proc_id}: distributed == single-device "
      f"(conv agree {agree:.4f}, converged {exp_conv})", flush=True)

"""Worker process for the 2-process distributed test (run via subprocess).

Each process owns ONE keyframe of a kf=2 x ty=1 x tx=2 mesh spanning two
processes (2 local CPU devices each). Both processes deterministically
generate the same synthetic scene, seed only their own keyframe locally,
assemble the global sharded state with make_array_from_process_local_data,
then drive a MULTI-PHASE lifecycle across processes:

  1. several full sharded update steps, each compared (local block) against
     an independent single-device run of this process's keyframe;
  2. one sharded TV-L1 denoise (cross-process ppermute halos) vs the
     single-device denoiser;
  3. a keyframe SWITCH decided from the stats the step returns — the
     per-process ``local_stats`` view is checked against the REPLICATED
     ``stats['packed']`` policy matrix (they must agree, and packed must be
     identical in every process: that is what keeps switch decisions
     SPMD-consistent), the chosen slot is re-seeded on-device across
     processes (build_sharded_reseed), and one more update runs on the
     mixed old/new batch, again oracle-checked.

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

frames = synthetic.generate(n_frames=8, width=W, height=H, cam=CAM, seed=11)


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

def close_enough(got, want, rtol=2e-4, atol=2e-5, budget=0.002):
    """allclose with a tiny mismatch budget: differently-compiled programs
    flip knife-edge NCC argmax ties on isolated pixels (float
    reassociation), which a strict allclose turns into flakes."""
    got, want = np.asarray(got), np.asarray(want)
    bad = np.abs(got - want) > (atol + rtol * np.abs(want))
    assert bad.mean() <= budget, (bad.mean(), float(np.abs(got - want).max()))


stats = None
for fr in frames[2:6]:
    img = jnp.asarray(fr.image, jnp.float32)
    T = jnp.asarray(Tcw(fr))
    state_g, stats = step(state_g, replicate_frame(mesh, np.asarray(fr.image, np.float32)), T)
    oracle, _ = dm.update_step(oracle, img, T, cam, cfg)

# --- phase 1 check: local block of the sharded result vs the oracle --------
mu_local = local_block(state_g.mu)          # [1, H, W] (this process's kf)
conv_local = local_block(state_g.conv)
close_enough(mu_local[0], oracle.mu)
agree = (conv_local[0] == np.asarray(oracle.conv)).mean()
assert agree > 0.995, agree

st = local_stats(stats)
assert st["converged"].shape == (1,), st["converged"].shape
exp_conv = int((np.asarray(oracle.conv) == 1).sum())
assert int(st["converged"][0]) == exp_conv, (st["converged"], exp_conv)

# --- phase 2: sharded TV-L1 denoise (cross-process 1-px halos) --------------
run_dn = sharded.build_sharded_denoise(mesh, cfg, H, W, iterations=15)
dn = run_dn(state_g, 0.5)
want_dn = dm.denoise_depthmap(oracle, cfg, lam=0.5, iterations=15)
close_enough(local_block(dn)[0], want_dn, rtol=1e-4, atol=1e-5)

# --- phase 3: stats-driven keyframe switch across processes -----------------
# the replicated policy matrix must (a) agree with this process's
# local_stats view of its own keyframe and (b) be what every process
# computes — both processes derive the SAME switch decision from it
packed = np.asarray(stats["packed"])         # [2, 6], fully replicated
assert packed.shape == (n_proc, len(sharded.SHARDED_PACKED_KEYS))
for j, key in enumerate(sharded.SHARDED_PACKED_KEYS):
    assert abs(packed[proc_id, j] - float(st[key][0])) < 1e-3, (key, packed)
slot = int(np.argmax(packed[:, sharded.SHARDED_PACKED_KEYS.index(
    "dist_from_ref")]))                      # deterministic everywhere

new_ref = frames[6]
d_new = new_ref.depth[np.isfinite(new_ref.depth)]
scene_new = SceneParams.create(float(d_new.min()), float(d_new.max()), cfg)
T_world_ref_new = np.asarray(se3.inv(jnp.asarray(Tcw(new_ref))))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

kf_sharding = NamedSharding(mesh, P("kf"))
full = np.zeros((n_proc,), np.float32)
full[slot] = 1.0
idx_map = kf_sharding.addressable_devices_indices_map((n_proc,))
rows = sorted({sl[0].indices(n_proc)[:2] for sl in idx_map.values()})
onehot = jax.make_array_from_process_local_data(
    kf_sharding, np.concatenate([full[a:b] for (a, b) in rows]), (n_proc,)
)
reseed = sharded.build_sharded_reseed(mesh, cam, cfg, H, W)
state_g = reseed(state_g, onehot,
                 replicate_frame(mesh, np.asarray(new_ref.image, np.float32)),
                 jnp.asarray(T_world_ref_new), scene_new)

# one more update on the mixed old/new batch; oracle follows suit
if proc_id == slot:
    oracle = dm.set_reference(
        empty_state(H, W, cam), jnp.asarray(new_ref.image, jnp.float32),
        jnp.asarray(Tcw(new_ref)), scene_new, cfg,
    )
fr = frames[7]
state_g, stats2 = step(
    state_g, replicate_frame(mesh, np.asarray(fr.image, np.float32)),
    jnp.asarray(Tcw(fr)),
)
oracle, _ = dm.update_step(
    oracle, jnp.asarray(fr.image, jnp.float32), jnp.asarray(Tcw(fr)), cam, cfg
)
close_enough(local_block(state_g.mu)[0], oracle.mu)
agree2 = (local_block(state_g.conv)[0] == np.asarray(oracle.conv)).mean()
assert agree2 > 0.995, agree2

# --- phase 4: checkpoint -> crash -> restore (failure recovery) -------------
# each process persists ITS OWN keyframe block (per-host ownership), the
# global state is discarded (the "crash"), re-assembled from the local
# checkpoints, and one more step must continue EXACTLY as the
# uninterrupted run — the deterministic-restart claim (SURVEY.md section
# 5, failure detection/recovery) at the multi-process level.
import dataclasses as _dc  # noqa: E402
import tempfile  # noqa: E402

from rpg_open_remode_tpu.io import checkpoint as ckpt  # noqa: E402

local_batch = jax.tree.map(lambda x: np.asarray(local_block(x)), state_g)
ckpt_path = os.path.join(
    tempfile.gettempdir(), f"dist_ckpt_{port}_{proc_id}.npz"
)
ckpt.save_state(ckpt_path, local_batch)

fr7 = frames[7]
img7 = replicate_frame(mesh, np.asarray(fr7.image, np.float32))
T7 = jnp.asarray(Tcw(fr7))
cont, _ = step(state_g, img7, T7)            # the run that never crashed

loaded = ckpt.load_state(ckpt_path)
os.remove(ckpt_path)
loaded_np = jax.tree.map(np.asarray, loaded)
restored_g = shard_local_keyframes(mesh, loaded_np, n_proc)
rest, _ = step(restored_g, img7, T7)
for f in _dc.fields(type(cont)):
    if f.name == "scene":
        continue
    a = np.asarray(local_block(getattr(cont, f.name)))
    b = np.asarray(local_block(getattr(rest, f.name)))
    assert np.array_equal(a, b), f"restore diverged in {f.name}"

# --- phase 5: PROPAGATED reseed across processes -----------------------------
# cfg.propagate_depth reseed: the selected slot gathers its full old grid
# over the (in-process) spatial axes, propagates, and warm-starts — while
# the kf axis spans processes, so the reseed program (incl. the one-hot
# weighted pick and the spatial all_gathers) must stay SPMD-consistent.
# Owner compares against the single-device propagate+init_seeds oracle;
# the other process asserts its slot untouched.
cfg_prop = _dc.replace(cfg, propagate_depth=True)
# NOTE: state_g was DONATED to the phase-4 step; continue from `cont`
lb5 = jax.tree.map(lambda x: np.asarray(local_block(x)), cont)
# give every keyframe a convergent-looking posterior worth carrying (the
# tiny 64x48 scene needs ~9+ updates before the natural carry mask fires)
lb5 = _dc.replace(
    lb5,
    sigma_sq=np.full_like(np.asarray(lb5.sigma_sq), 1e-4),
    a=np.full_like(np.asarray(lb5.a), 40.0),
    b=np.full_like(np.asarray(lb5.b), 5.0),
)
state_p = shard_local_keyframes(mesh, lb5, n_proc)
slot2 = 1 - slot
full2 = np.zeros((n_proc,), np.float32)
full2[slot2] = 1.0
onehot2 = jax.make_array_from_process_local_data(
    kf_sharding, np.concatenate([full2[a:b] for (a, b) in rows]), (n_proc,)
)
new_ref2 = frames[5]
d2 = new_ref2.depth[np.isfinite(new_ref2.depth)]
scene2 = SceneParams.create(float(d2.min()), float(d2.max()), cfg_prop)
T_world_ref2 = jnp.asarray(np.asarray(se3.inv(jnp.asarray(Tcw(new_ref2)))))
reseed_p = sharded.build_sharded_reseed(mesh, cam, cfg_prop, H, W)
got_p = reseed_p(
    state_p, onehot2,
    replicate_frame(mesh, np.asarray(new_ref2.image, np.float32)),
    T_world_ref2, scene2,
)
if proc_id == slot2:
    from rpg_open_remode_tpu.ops import propagate, seed_init  # noqa: E402

    old_single = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[0]), lb5)
    prior = propagate.propagate_depth(
        old_single, se3.inv(T_world_ref2), scene2, cam, cfg_prop
    )
    assert float(prior[4].mean()) > 0.05, \
        "phase-5 fixture produced no propagated pixels — vacuous"
    want_p = seed_init.init_seeds(
        old_single, jnp.asarray(new_ref2.image, jnp.float32),
        T_world_ref2, scene2, cfg_prop, prior=prior,
    )
    close_enough(local_block(got_p.mu)[0], want_p.mu, rtol=2e-4, atol=2e-4)
    close_enough(local_block(got_p.sigma_sq)[0], want_p.sigma_sq,
                 rtol=2e-4, atol=2e-4)
else:
    assert np.array_equal(
        np.asarray(local_block(got_p.mu)[0]), np.asarray(lb5.mu)[0]
    ), "non-selected slot must be untouched by the propagated reseed"

print(f"proc {proc_id}: distributed lifecycle == single-device "
      f"(conv agree {agree:.4f}/{agree2:.4f}, converged {exp_conv}, "
      f"switched slot {slot}); checkpoint-restore continues bitwise; "
      f"propagated reseed of slot {slot2} matches the single-device oracle",
      flush=True)

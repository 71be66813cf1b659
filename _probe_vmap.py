"""Isolate the vmapped-update overhead: plain vs vmap(1) vs vmap(2),
Pallas sweep vs XLA sweep."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.ops import seed_init
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.utils import synthetic, se3

W, H = 640, 480
CAM = dict(fx=481.2, fy=-480.0, cx=319.5, cy=239.5)
frames = synthetic.generate(n_frames=36, width=W, height=H, cam=CAM, seed=1)

def Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)

cam = PinholeCamera.create(**CAM)
f0 = frames[0]
d = f0.depth[np.isfinite(f0.depth)]
imgs = [jnp.asarray(fr.image.astype(np.float32)) for fr in frames]
poses = [jnp.asarray(Tcw(fr)) for fr in frames]


def bench_variant(name, B, use_pallas):
    import dataclasses
    cfg = RemodeConfig(
        ref_compl_perc=0.0, max_dist_from_ref=0.0,
        zero_baseline_fallback=False, use_pallas=use_pallas,
    )
    scene = SceneParams.create(float(d.min()), float(d.max()), cfg)
    base = empty_state(H, W, cam)
    st1 = seed_init.init_seeds(base, imgs[0], se3.inv(poses[0]), scene, cfg)
    if B == 0:  # plain, no vmap
        step = jax.jit(lambda st, im, T: dm.update_step(st, im, T, cam, cfg))
        state = st1
    else:
        states = jax.tree.map(lambda x: jnp.stack([x] * B), st1)
        step = jax.jit(lambda sts, im, T: jax.vmap(
            lambda s: dm.update_step(s, im, T, cam, cfg))(sts))
        state = states
    for i in range(1, 6):
        state, _ = step(state, imgs[i], poses[i])
    float(jnp.sum(state.mu))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(6, 36):
            state, _ = step(state, imgs[i], poses[i])
        float(jnp.sum(state.mu))
        per = (time.perf_counter() - t0) / 30
        best = per if best is None else min(best, per)
    print(f"{name:28s} {best*1e3:7.2f} ms/frame")


bench_variant("plain pallas", 0, True)
bench_variant("vmap1 pallas", 1, True)
bench_variant("vmap2 pallas", 2, True)
bench_variant("plain xla", 0, False)
bench_variant("vmap2 xla", 2, False)


def bench_scan(name, B, use_pallas):
    cfg = RemodeConfig(
        ref_compl_perc=0.0, max_dist_from_ref=0.0,
        zero_baseline_fallback=False, use_pallas=use_pallas,
    )
    scene = SceneParams.create(float(d.min()), float(d.max()), cfg)
    base = empty_state(H, W, cam)
    st1 = seed_init.init_seeds(base, imgs[0], se3.inv(poses[0]), scene, cfg)
    states = jax.tree.map(lambda x: jnp.stack([x] * B), st1)

    def step_fn(sts, im, T):
        def body(_, st):
            st2, stats = dm.update_step(st, im, T, cam, cfg)
            return None, (st2, stats)
        _, (new, stats) = jax.lax.scan(body, None, sts)
        return new, stats

    step = jax.jit(step_fn)
    state = states
    for i in range(1, 6):
        state, _ = step(state, imgs[i], poses[i])
    float(jnp.sum(state.mu))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(6, 36):
            state, _ = step(state, imgs[i], poses[i])
        float(jnp.sum(state.mu))
        per = (time.perf_counter() - t0) / 30
        best = per if best is None else min(best, per)
    print(f"{name:28s} {best*1e3:7.2f} ms/frame  ({best*1e3/B:.2f}/kf)")


bench_scan("scan1 pallas", 1, True)
bench_scan("scan2 pallas", 2, True)
bench_scan("scan4 pallas", 4, True)

"""One-off: phase-level TPU timing breakdown of update_step (not shipped).

Each phase runs K times inside ONE jitted lax.scan (inputs varied per
iteration via a staged eps vector) so the per-dispatch RPC floor (~1.8 ms
through the tunnel) amortizes to 1/K and device compute dominates. Phases
jitted separately lose cross-phase fusion — use for RANKING only.
"""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.depthmap import update_step, _prep_traced
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.ops import epipolar, reduction, seed_check, seed_init, seed_update
from rpg_open_remode_tpu.utils import se3, synthetic
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.utils.profiling import Timer, force

a = (sys.argv[1:] or ["640x480"])[0]
W, H = (int(v) for v in a.split("x"))
# bench focal convention + focal-scaled shipped config (profile_match)
fscale = {640: 1.0, 752: 1.0, 1280: 2.0}.get(W, W / 640.0)
cfg = RemodeConfig.for_camera(481.2 * fscale)
cam_kw = dict(fx=481.2 * fscale, fy=-480.0 * fscale,
              cx=(W - 1) / 2, cy=(H - 1) / 2)
K = 16
frames = synthetic.generate(n_frames=K + 8, width=W, height=H, seed=1,
                            cam=cam_kw)
cam = PinholeCamera.create(**cam_kw)
f0 = frames[0]
d = f0.depth[np.isfinite(f0.depth)]
scene = SceneParams.create(d.min(), d.max(), cfg)
state = seed_init.init_seeds(
    empty_state(H, W, cam), jnp.asarray(f0.image), jnp.asarray(f0.T_world_curr),
    scene, cfg)

def T_cw(fr):
    return np.linalg.inv(np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]]))[
        :3].astype(np.float32)

imgs = jnp.asarray(np.stack([fr.image for fr in frames]))
Ts = jnp.asarray(np.stack([T_cw(fr) for fr in frames]))

step = jax.jit(lambda st, img, T: update_step(st, img, T, cam, cfg))
for i in range(1, 8):
    state, _ = step(state, imgs[i], Ts[i])
force(state.mu)

T_curr_ref = se3.compose(Ts[8], state.T_world_ref)
border = seed_check.border_mask(H, W, cfg)
conv1 = seed_check.classify_seeds(
    state.mu, state.sigma_sq, state.a, state.b, state.scene.epsilon, border, cfg)
state1 = dataclasses.replace(state, conv=conv1)
res = epipolar.match(state1, _prep_traced(imgs[8]), T_curr_ref, cam, cfg)
active = conv1 == int(ConvergenceState.UPDATE)
conv2 = epipolar.apply_match_to_conv(conv1, active, res.found)
force(res.u)
eps = jnp.asarray(
    np.random.default_rng(0).normal(0, 1e-6, K + 8).astype(np.float32))


def scanned(body):
    """jit(outer) -> scalar; body(i, e) -> scalar, run K times in one scan."""
    def outer(o):
        def f(acc, xs):
            i, e = xs
            return acc + body(i, e + o), None
        acc, _ = jax.lax.scan(f, 0.0, (jnp.arange(K), eps[:K]))
        return acc
    return jax.jit(outer)


j_classify = scanned(lambda i, e: jnp.sum(seed_check.classify_seeds(
    state.mu + e, state.sigma_sq, state.a, state.b, state.scene.epsilon,
    border, cfg)).astype(jnp.float32))
j_match = scanned(lambda i, e: epipolar.match(
    dataclasses.replace(state1, mu=state1.mu + e), _prep_traced(imgs[i]),
    se3.compose(Ts[i], state.T_world_ref), cam, cfg).best_ncc.sum())
j_update = scanned(lambda i, e: jnp.sum(seed_update.update_seeds(
    state1, conv2, res.u + e, res.v, se3.inv(T_curr_ref), cam, cfg).mu))
j_stats = scanned(lambda i, e: reduction.convergence_stats(conv2)[
    "update"].astype(jnp.float32)
    + jnp.sum(jnp.where(res.found, res.best_ncc + e, 0.0)))


def full_chunk(o):
    def f(st, xs):
        img, T = xs
        st2, stats = update_step(
            dataclasses.replace(st, mu=st.mu + o), img, T, cam, cfg)
        return st2, stats["packed"][0]
    _, p = jax.lax.scan(f, state, (imgs[:K], Ts[:K]))
    return p.sum()


j_full = jax.jit(full_chunk)

rows = [
    ("classify", j_classify),
    ("match(rect)", j_match),
    ("seed_update", j_update),
    ("stats", j_stats),
    ("FULL update_step", j_full),
]
offs = jnp.asarray(
    np.random.default_rng(1).normal(0, 1e-7, 8).astype(np.float32))
for name, fn in rows:
    ms = Timer.amortized(lambda i: fn(offs[i % 8]), n=6, repeats=2) * 1e3 / K
    print(f"{name:20s} {ms:7.3f} ms/iter")

"""Scaling report: concurrent-keyframe throughput on one chip.

BASELINE.json asks for scaling efficiency across chips/hosts; this
environment exposes one physical chip, so this script reports the two
measurable axes and the driver's virtual-mesh dry run covers the multi-chip
compile/execute path (`__graft_entry__.dryrun_multichip`):

  - single-keyframe streaming throughput (the headline bench.py number)
  - batched B-keyframe throughput (models/multikeyframe.BatchedDepthmap):
    keyframe-updates/s when every frame feeds B concurrent keyframes in one
    fused device program
  - the full sharded step on a mesh of ONE device, bounding the
    shard_map/collective wrapping overhead independent of communication

Methodology matches bench.py: back-to-back dispatch, one drain per pass,
best of two passes (the first pass absorbs any residual one-off cost; the
tunnel adds ~±8% noise). Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _best_of(passes, fn, n_calls, setup=None):
    """min over passes of per-call time; ``setup`` (untimed) restores the
    engine to the same post-warmup state before every pass, so min() picks
    the least-noisy pass of IDENTICAL work — without it, later passes
    replay on an ever-more-converged state that legitimately sweeps fewer
    seeds, and min() would report that cheaper, non-representative pass."""
    times = []
    for _ in range(passes):
        if setup is not None:
            setup()
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) / n_calls)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from rpg_open_remode_tpu.models.depthmap import Depthmap
    from rpg_open_remode_tpu.models.multikeyframe import BatchedDepthmap
    from rpg_open_remode_tpu.utils import synthetic

    frames = synthetic.generate(n_frames=40, width=640, height=480, seed=1)

    def Tcw(fr):
        T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
        return np.linalg.inv(T)[:3].astype(np.float32)

    # stage all inputs on device once: the scaling signal is batching /
    # sharding efficiency of device compute, and the tunnel's per-frame
    # H2D (~120 MB/s nominal, >10x worse in bad windows) would drown it
    imgs = [
        jax.device_put(np.clip(fr.image * 255.0, 0, 255).astype(np.uint8))
        for fr in frames
    ]
    poses = [jax.device_put(Tcw(fr)) for fr in frames]
    float(jnp.sum(imgs[-1].astype(jnp.float32)) + jnp.sum(poses[-1]))
    out = {"metric": "keyframe_updates_per_s"}

    # single keyframe
    f0 = frames[0]
    d0 = f0.depth[np.isfinite(f0.depth)]
    eng = Depthmap(640, 480, fx=481.2, cx=319.5, fy=-480.0, cy=239.5)
    eng.set_reference_image(imgs[0], poses[0], d0.min(), d0.max())
    for i in range(1, 6):
        eng.update(imgs[i], poses[i])
    float(jnp.sum(eng.state.mu))

    snap_b1 = eng.state

    def reset_b1():
        eng.state = snap_b1

    def run_b1():
        for i in range(6, 36):
            eng.update(imgs[i], poses[i])
        float(jnp.sum(eng.state.mu))

    per = _best_of(2, run_b1, 30, setup=reset_b1)
    out["B1_updates_per_s"] = round(1.0 / per, 1)

    for B in (2, 4):
        beng = BatchedDepthmap(B, 640, 480, fx=481.2, cx=319.5,
                               fy=-480.0, cy=239.5)
        for slot in range(B):
            f = frames[2 * slot]
            d = f.depth[np.isfinite(f.depth)]
            beng.seed_keyframe(slot, imgs[2 * slot], poses[2 * slot],
                               d.min(), d.max())
        for i in range(8, 12):
            beng.update(imgs[i], poses[i])
        float(jnp.sum(beng.states.mu))

        snap_bb = beng.states

        def reset_bb():
            beng.states = snap_bb

        def run_bb():
            for i in range(12, 36):
                beng.update(imgs[i], poses[i])
            float(jnp.sum(beng.states.mu))

        per = _best_of(2, run_bb, 24, setup=reset_bb)
        out[f"B{B}_updates_per_s"] = round(B / per, 1)
        # throughput gain over running the B keyframes serially through the
        # single-keyframe engine (a saturated chip's ideal is ~1.0; >1 means
        # batching amortizes per-frame dispatch/warp overheads). NOT divided
        # by B: one chip at full utilization cannot be B times faster.
        out[f"B{B}_gain_vs_serial"] = round(
            (B / per) / out["B1_updates_per_s"], 3
        )

    # shard_map overhead: the full sharded step on a mesh of ONE device
    # (kf=ty=tx=1) vs the plain engine
    from rpg_open_remode_tpu.config import RemodeConfig
    from rpg_open_remode_tpu.parallel import (
        build_sharded_update, make_mesh, shard_state, stack_states,
    )

    mesh = make_mesh(1, kf=1, ty=1, tx=1)
    cfg = RemodeConfig(zero_baseline_fallback=False)
    eng1 = Depthmap(640, 480, fx=481.2, cx=319.5, fy=-480.0, cy=239.5, cfg=cfg)
    eng1.set_reference_image(imgs[0], poses[0], d0.min(), d0.max())
    state_holder = [shard_state(stack_states([eng1.state]), mesh)]
    step = build_sharded_update(mesh, eng1.cam, cfg, 480, 640)
    for i in range(1, 6):
        state_holder[0], _ = step(state_holder[0], imgs[i], poses[i])
    float(jnp.sum(state_holder[0].mu))

    # the sharded step donates its state arg, so each pass restores from a
    # fresh device copy of the post-warmup snapshot (copied OUTSIDE the timer)
    snap_sh = jax.tree.map(jnp.copy, state_holder[0])

    def reset_sh():
        state_holder[0] = jax.tree.map(jnp.copy, snap_sh)
        float(jnp.sum(state_holder[0].mu))

    def run_sh():
        for i in range(6, 36):
            state_holder[0], _ = step(state_holder[0], imgs[i], poses[i])
        float(jnp.sum(state_holder[0].mu))

    per = _best_of(2, run_sh, 30, setup=reset_sh)
    out["sharded_mesh1_updates_per_s"] = round(1.0 / per, 1)
    out["sharded_mesh1_overhead_vs_B1"] = round(
        out["B1_updates_per_s"] / (1.0 / per), 3
    )
    out["backend"] = jax.default_backend()

    print(json.dumps(out))


if __name__ == "__main__":
    main()

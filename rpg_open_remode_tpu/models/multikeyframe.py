"""Batched multi-keyframe engine: several concurrent keyframes on one chip.

The reference maintains exactly one reference keyframe at a time
(``DepthmapNode``'s single ``Depthmap``); mapping quality improves and
throughput per chip rises if several recent keyframes keep absorbing every
incoming frame.  All per-keyframe state is a pytree of ``[H, W]`` arrays, so
a batch of keyframes is one ``lax.scan`` over a leading ``kf`` axis — a
single fused device program per incoming frame for the whole batch (the
single-chip sibling of the ``kf`` mesh axis in ``parallel/``).

``scan`` rather than ``vmap``: a TPU core is already saturated by one
keyframe's update, so batching cannot parallelize — it can only amortize
the per-frame fixed costs (H2D of the current image, dispatch, stats).
Measured on hardware, ``vmap`` REGRESSES per-keyframe cost 2.2x even at
batch 1 (the batched-matmul rewriting of the scanline warps), while scan
reuses the unbatched single-keyframe program per slot: 3.9 ms/keyframe at
B=4 vs 4.7 ms at B=1 (640x480, see SCALING_r02.json).

Keyframes are replaced in-place (ring-buffer style) via the same switch
policy as the node: a slot whose converged percentage exceeds
``ref_compl_perc`` or whose camera moved ``max_dist_from_ref`` is re-seeded
with the newest frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.models.state import SceneParams, SeedState, empty_state
from rpg_open_remode_tpu.ops import seed_init
from rpg_open_remode_tpu.utils.camera import PinholeCamera


@functools.lru_cache(maxsize=None)
def _batched_jits(cfg: RemodeConfig):
    import dataclasses

    cfg = dataclasses.replace(
        cfg,
        ref_compl_perc=0.0,
        max_dist_from_ref=0.0,
        zero_baseline_fallback=False,
    )

    def step(states, curr_img, T_curr_world, cam):
        def body(_, st):
            st2, stats = dm.update_step(st, curr_img, T_curr_world, cam, cfg)
            return None, (st2, stats)

        _, (new_states, stats) = jax.lax.scan(body, None, states)
        return new_states, stats

    def seed_slot(states, slot, img, T_world_ref, scene_vec):
        """Re-seed one keyframe slot (functional scatter into the batch)."""
        one = seed_init.init_seeds(
            jax.tree.map(lambda x: x[slot], states), dm._prep_traced(img),
            T_world_ref, scene_vec, cfg,
        )
        return jax.tree.map(
            lambda batch, new: batch.at[slot].set(new), states, one
        )

    return jax.jit(step), jax.jit(seed_slot, donate_argnums=(0,))


class BatchedDepthmap:
    """Ring of ``n_keyframes`` concurrently-updating keyframes."""

    def __init__(
        self,
        n_keyframes: int,
        width: int,
        height: int,
        fx: float,
        cx: float,
        fy: float,
        cy: float,
        cfg: RemodeConfig | None = None,
    ):
        self.cfg = cfg or RemodeConfig()
        self.cam = PinholeCamera.create(fx, fy, cx, cy)
        self.n = n_keyframes
        self.height, self.width = height, width
        base = empty_state(height, width, self.cam)
        self.states: SeedState = jax.tree.map(
            lambda x: jnp.stack([x] * n_keyframes), base
        )
        self._active = [False] * n_keyframes
        self._step, self._seed = _batched_jits(self.cfg)

    def seed_keyframe(self, slot: int, img, T_curr_world, min_depth, max_depth):
        from rpg_open_remode_tpu.utils import se3

        scene = SceneParams.create(min_depth, max_depth, self.cfg)
        self.states = self._seed(
            self.states,
            slot,
            jnp.asarray(img),
            se3.inv(jnp.asarray(T_curr_world, jnp.float32)),
            scene,
        )
        self._active[slot] = True

    def update(self, img, T_curr_world) -> dict:
        """Fuse one frame into every active keyframe; returns per-kf stats.
        uint8 frames are converted in-trace (``dm._prep_traced``) — one
        device dispatch per frame for the whole batch."""
        self.states, stats = self._step(
            self.states, jnp.asarray(img),
            jnp.asarray(T_curr_world, jnp.float32), self.cam
        )
        return stats

    def converged_fraction(self) -> np.ndarray:
        conv = np.asarray(self.states.conv)
        return (conv == int(ConvergenceState.CONVERGED)).mean(axis=(1, 2))

    def keyframe_state(self, slot: int) -> SeedState:
        return jax.tree.map(lambda x: x[slot], self.states)

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

    # The ring keeps the full regime dispatch (zero-baseline / forward-
    # motion fallbacks, ops/rect_match.match): the scan body is exactly the
    # single-keyframe program, so the cached-branch lax.switch traces
    # unchanged. (Round-4 had disabled it with a vmap-era justification —
    # under vmap a cond becomes a select paying for both branches — that no
    # longer applies to scan; a stationary camera in `cli run --keyframes N`
    # would otherwise take the rectified path at B~0, a regime the raw rect
    # sweep is proven broken in, tests/test_matching.py.)
    cfg = dataclasses.replace(
        cfg,
        ref_compl_perc=0.0,
        publish_conv_every_n=0,
        max_dist_from_ref=0.0,
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

    def seed_slot_prop(states, slot, img, T_curr_world, scene_vec, cam):
        """Re-seed one slot warm-started from ITS OWN outgoing posterior
        (cfg.propagate_depth; ops/propagate.py) — the ring sibling of
        models.depthmap._set_reference_propagated."""
        from rpg_open_remode_tpu.ops import propagate
        from rpg_open_remode_tpu.utils import se3

        old = jax.tree.map(lambda x: x[slot], states)
        prior = propagate.propagate_depth(
            old, T_curr_world, scene_vec, cam, cfg
        )
        one = seed_init.init_seeds(
            old, dm._prep_traced(img), se3.inv(T_curr_world), scene_vec, cfg,
            prior=prior,
        )
        return jax.tree.map(
            lambda batch, new: batch.at[slot].set(new), states, one
        )

    return (
        jax.jit(step),
        jax.jit(seed_slot, donate_argnums=(0,)),
        jax.jit(seed_slot_prop, donate_argnums=(0,)),
    )


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
        self.cfg = cfg or RemodeConfig.for_camera(fx)
        self.cam = PinholeCamera.create(fx, fy, cx, cy)
        self.n = n_keyframes
        self.height, self.width = height, width
        base = empty_state(height, width, self.cam)
        self.states: SeedState = jax.tree.map(
            lambda x: jnp.stack([x] * n_keyframes), base
        )
        self._active = [False] * n_keyframes
        self._step, self._seed, self._seed_prop = _batched_jits(self.cfg)

    def seed_keyframe(self, slot: int, img, T_curr_world, min_depth, max_depth):
        from rpg_open_remode_tpu.utils import se3

        scene = SceneParams.create(min_depth, max_depth, self.cfg)
        T = jnp.asarray(T_curr_world, jnp.float32)
        if self.cfg.propagate_depth and self._active[slot]:
            # warm-start from the slot's own outgoing posterior (one fused
            # dispatch: propagation + seed init, ops/propagate.py)
            self.states = self._seed_prop(
                self.states, slot, jnp.asarray(img), T, scene, self.cam
            )
        else:
            self.states = self._seed(
                self.states, slot, jnp.asarray(img), se3.inv(T), scene
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


class MultiKeyframeNode:
    """Staggered keyframe-ring mapping loop — the multi-keyframe sibling of
    ``models.node.DepthmapNode``.

    The reference node maintains exactly ONE reference keyframe
    (src/depthmap_node.cpp:96-162); this drives a ``BatchedDepthmap`` ring
    so every incoming frame fuses into all ``n_keyframes`` concurrent
    keyframes in one device program, and each slot runs the reference's
    switch policy independently (converged% > ref_compl_perc OR distance >
    max_dist_from_ref, :148). Slot lifecycles are deliberately staggered at
    startup (slot i force-reseeds at frame i*stagger) so completions spread
    out instead of thundering together.

    Asynchrony mirrors DepthmapNode: per-slot metrics are fetched every
    ``policy_stride`` frames on a fetcher thread and acted on one stride
    later (lagged, deterministic); finalized slots snapshot their immutable
    state pytree and denoise+export on a worker thread while the ring keeps
    ingesting.
    """

    def __init__(
        self,
        engine: "BatchedDepthmap",
        cfg: RemodeConfig | None = None,
        on_keyframe=None,
        denoise_on_completion: bool = True,
        policy_stride: int = 6,
        stagger: int = 10,
    ):
        import collections
        from concurrent.futures import ThreadPoolExecutor

        self.engine = engine
        self.cfg = cfg or engine.cfg
        self.on_keyframe = on_keyframe
        self.denoise_on_completion = denoise_on_completion
        self.policy_stride = max(int(policy_stride), 1)
        self.stagger = max(int(stagger), 1)
        B = engine.n
        self.num_msgs = 0
        self._n_updates = [0] * B
        self._generation = [0] * B
        self._forced_reseed_done = [False] * B
        self._pending_stats = collections.deque()
        self._executor = ThreadPoolExecutor(max_workers=1)
        self._fetcher = ThreadPoolExecutor(max_workers=1)
        self._pending = []
        self.keyframes = []
        # single-keyframe jits (shared cache with Depthmap engines of the
        # same cfg): only the denoiser is used here
        self._jit_denoise = dm._jits_for(self.cfg)[2]

    # -- frame ingestion -----------------------------------------------------

    def process_frame(self, image, T_curr_world, min_depth, max_depth) -> dict:
        """Feed one frame (pose + scene depth bounds, as the reference's
        DenseInput carries). Returns the newest resolved per-slot metrics
        the async pipeline can know without stalling."""
        eng = self.engine
        if self.num_msgs == 0:
            # fill the whole ring from the first frame; startup staggering
            # below diversifies the slots
            for slot in range(eng.n):
                eng.seed_keyframe(slot, image, T_curr_world, min_depth, max_depth)
            self._bounds = (float(min_depth), float(max_depth))
            self.num_msgs = 1
            return {"event": "reference_set"}

        self.num_msgs += 1
        self._bounds = (float(min_depth), float(max_depth))
        self._last_frame = (image, T_curr_world)
        stats = eng.update(image, T_curr_world)
        for s in range(eng.n):
            self._n_updates[s] += 1
        # snapshot BEFORE any reseed below: the dispatched stats were
        # computed by the update above, so they belong to the generations
        # the slots had at dispatch — capturing after a same-frame stagger
        # reseed would let pre-reseed stats (e.g. the old keyframe's
        # dist_from_ref) drive the switch policy against the fresh keyframe
        gens_at_dispatch = tuple(self._generation)
        n_upds_at_dispatch = tuple(self._n_updates)

        # startup staggering: slot i restarts on frame i*stagger
        n = self.num_msgs - 1
        if n % self.stagger == 0:
            slot = n // self.stagger
            if 0 < slot < eng.n and not self._forced_reseed_done[slot]:
                self._reseed(slot, finalize=False)
                self._forced_reseed_done[slot] = True

        out = {"event": "updated"}
        if n % self.policy_stride == 0:
            fetch = self._fetcher.submit(np.asarray, stats["packed"])
            self._pending_stats.append(
                (self.num_msgs, gens_at_dispatch, n_upds_at_dispatch, fetch)
            )
            while len(self._pending_stats) > 1:
                out = self._resolve_oldest()
        return out

    def _resolve_oldest(self) -> dict:
        frame_no, gens, n_upds, fetch = self._pending_stats.popleft()
        packed = fetch.result()               # [B, 7], PACKED_STATS_KEYS order
        eng = self.engine
        npx = eng.width * eng.height
        keys = dm.PACKED_STATS_KEYS
        out = {"event": "updated", "frame": frame_no, "slots": []}
        for slot in range(eng.n):
            vals = {k: float(v) for k, v in zip(keys, packed[slot])}
            conv_pct = vals["converged"] / npx * 100.0
            vals["converged_percentage"] = conv_pct
            out["slots"].append(vals)
            # stale-generation guard: stats dispatched before this slot's
            # reseed must not trigger another switch
            if gens[slot] != self._generation[slot]:
                continue
            if (
                conv_pct > self.cfg.ref_compl_perc
                or vals["dist_from_ref"] > self.cfg.max_dist_from_ref
            ):
                self._reseed(slot, finalize=True, conv_pct=conv_pct,
                             n_updates=n_upds[slot])
                out["event"] = "keyframe_complete"
        return out

    # -- slot lifecycle --------------------------------------------------------

    def _reseed(self, slot, finalize, conv_pct=0.0, n_updates=0):
        eng = self.engine
        if finalize:
            snapshot = eng.keyframe_state(slot)
            # prune completed futures (surfacing worker exceptions now);
            # long runs would otherwise grow the list unboundedly
            self._pending = [
                f for f in self._pending if not (f.done() and f.result() is None)
            ]
            self._pending.append(
                self._executor.submit(
                    self._complete_keyframe, snapshot, conv_pct, n_updates
                )
            )
        img, T = self._last_frame
        eng.seed_keyframe(slot, img, T, *self._bounds)
        self._generation[slot] += 1
        self._n_updates[slot] = 0

    def _complete_keyframe(self, snapshot, conv_pct, n_updates):
        from rpg_open_remode_tpu.models.node import KeyframeResult

        if self.denoise_on_completion:
            denoised = np.asarray(
                self._jit_denoise(
                    snapshot,
                    lam=self.cfg.denoise_lambda,
                    iterations=self.cfg.denoise_iters,
                )
            )
        else:
            denoised = np.asarray(snapshot.mu)
        result = KeyframeResult(
            state=snapshot,
            denoised_depth=denoised,
            converged_percentage=conv_pct,
            n_updates=n_updates,
        )
        self.keyframes.append(result)
        if self.on_keyframe is not None:
            self.on_keyframe(result)

    # -- teardown --------------------------------------------------------------

    def drain(self):
        out = None
        while self._pending_stats:
            out = self._resolve_oldest()
        return out

    def flush(self):
        self.drain()
        for f in self._pending:
            f.result()
        self._pending = []

    def close(self):
        self.flush()
        self._executor.shutdown(wait=True)
        self._fetcher.shutdown(wait=True)

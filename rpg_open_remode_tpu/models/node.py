"""Keyframe-lifecycle mapping node — the reference DepthmapNode, TPU-native.

Reproduces the state machine of ``rmd::DepthmapNode``
(src/depthmap_node.cpp:96-162):

  TAKE_REFERENCE_FRAME: the next frame (with its pose and scene depth
      bounds) becomes the reference keyframe.
  UPDATE: every frame is fused into the seed filter; when the converged
      percentage exceeds ``ref_compl_perc`` (default 10%,
      depthmap_node.cpp:79,148) OR the camera has moved more than
      ``max_dist_from_ref`` from the keyframe (default 0.5 m, :80,148), the
      keyframe is finalized: denoise(lambda=0.5, 200 iters, :167),
      publish asynchronously (:170-172), and take a new reference.

Two asynchrony mechanisms keep the loop at device throughput:

  * **Strided, lagged switch policy.** The reference downloads the
    converged count every frame (seed_matrix.cu:195-198) — affordable at
    26 fps, ruinous here: ANY device->host fetch stalls this backend's
    dispatch pipeline for the full ~30 ms round trip, per-frame fetches
    cost ~3x throughput however they are threaded (measured: 96 fps no
    fetch, 28-34 fps per-frame fetch, 64 fps strided). So only every
    ``policy_stride``-th frame's metrics are fetched (started on a fetcher
    thread at dispatch, read one stride later when the transfer has
    landed). The policy acts on ~2*stride-frame-old values — at >130 fps
    that is a decision latency of ~90 ms, on par with the reference's
    ~76 ms (2 frames at 26 fps) — and stays deterministic by construction
    (which values the policy sees depends only on frame counts, never on
    transfer timing).
  * **Async finalization.** The reference hides publishing latency with
    ``std::async`` guarded by a mutex on the reference image
    (depthmap.cpp:76-80); here the finalized keyframe's immutable
    ``SeedState`` pytree is handed to a worker thread while the engine
    re-seeds — no locks, no races, snapshots by construction (SURVEY.md
    section 5 lists the reference's publisher race this removes).
"""

from __future__ import annotations

import collections
import dataclasses
import enum
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable

import numpy as np

from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.models.depthmap import Depthmap, PACKED_STATS_KEYS
from rpg_open_remode_tpu.models.state import SeedState


class NodeState(enum.Enum):
    TAKE_REFERENCE_FRAME = 0
    UPDATE = 1


@dataclasses.dataclass
class KeyframeResult:
    """Everything produced when a keyframe completes."""

    state: SeedState              # frozen filter state of the keyframe
    denoised_depth: np.ndarray    # TV-L1 regularized depth map
    converged_percentage: float
    n_updates: int


class DepthmapNode:
    """Drives a ``Depthmap`` engine through the keyframe lifecycle.

    ``on_keyframe(result: KeyframeResult)`` is invoked on a worker thread
    (the std::async analog, depthmap_node.cpp:170-172) whenever a keyframe
    is finalized — use it to export point clouds / depth images.

    ``policy_stride`` is how often (in frames) the switch policy samples
    the device metrics (see module docstring); 1 restores the reference's
    check-every-frame behaviour at a ~3x throughput cost on this backend.
    """

    def __init__(
        self,
        engine: Depthmap,
        cfg: RemodeConfig | None = None,
        on_keyframe: Callable[[KeyframeResult], None] | None = None,
        on_convergence: Callable[[np.ndarray], None] | None = None,
        denoise_on_completion: bool = True,
        metrics_path: str | None = None,
        policy_stride: int = 6,
    ):
        from rpg_open_remode_tpu.utils.profiling import MetricsLog

        self.engine = engine
        self.cfg = cfg or engine.cfg
        self.state = NodeState.TAKE_REFERENCE_FRAME
        self.on_keyframe = on_keyframe
        self.on_convergence = on_convergence
        self.denoise_on_completion = denoise_on_completion
        self.policy_stride = max(int(policy_stride), 1)
        self.num_msgs = 0
        self._n_updates = 0
        self._generation = 0          # bumps on every keyframe switch
        # (frame_no, generation, n_updates_at_dispatch, packed device array)
        self._pending_stats: collections.deque = collections.deque()
        self._executor = ThreadPoolExecutor(max_workers=1)
        self._fetcher = ThreadPoolExecutor(max_workers=1)  # D2H stats fetches
        self._pending: list[Future] = []
        self.keyframes: list[KeyframeResult] = []
        self.metrics = MetricsLog(metrics_path)

    # -- frame ingestion (denseInputCallback, depthmap_node.cpp:96-162) ----

    def process_frame(
        self,
        image: np.ndarray,
        T_curr_world: np.ndarray,
        min_depth: float | None = None,
        max_depth: float | None = None,
    ) -> dict:
        """Feed one frame. min/max depth are required for the frame that
        becomes a reference (the DenseInput message carries them,
        depthmap_node.cpp:131-136).

        Returns the resolved metrics of the newest strided frame the async
        pipeline can know without stalling (~2*policy_stride frames old),
        or ``{"event": "updated"}`` between samples / while filling.
        """
        self.num_msgs += 1
        if self.state == NodeState.TAKE_REFERENCE_FRAME:
            if min_depth is None or max_depth is None:
                raise ValueError("reference frame needs min/max depth bounds")
            self.engine.set_reference_image(image, T_curr_world, min_depth, max_depth)
            self._ref_bounds = (float(min_depth), float(max_depth))
            self._n_updates = 0
            self.state = NodeState.UPDATE
            return {"event": "reference_set"}

        stats = self.engine.update(image, T_curr_world)
        self._n_updates += 1
        # mid-keyframe convergence-map publishing, every
        # publish_conv_every_n msgs (depthmap_node.cpp:158-162) — only when
        # a consumer registered: the overlay costs a ~1.2 MB device->host
        # fetch, done on the worker thread off the dispatch path
        n_conv = self.cfg.publish_conv_every_n
        if (
            self.on_convergence is not None
            and n_conv > 0
            and self.num_msgs % n_conv == 0
        ):
            self._prune_pending()
            self._pending.append(
                self._executor.submit(self._publish_convergence,
                                      self.engine.state)
            )
        out = {"event": "updated"}
        if self._n_updates % self.policy_stride == 0:
            # Start the D2H fetch on the fetcher thread (the dispatch loop
            # never blocks on the ~30 ms round trip) ...
            fetch = self._fetcher.submit(np.asarray, stats["packed"])
            self._pending_stats.append(
                (self.num_msgs, self._generation, self._n_updates, fetch)
            )
            # ... and read the PREVIOUS strided sample, dispatched
            # policy_stride frames ago — executed and landed by now
            while len(self._pending_stats) > 1:
                out = self._resolve_oldest()
        return out

    def _resolve_oldest(self) -> dict:
        frame_no, gen, n_upd, fetch = self._pending_stats.popleft()
        vals = fetch.result()
        stats = {k: float(v) for k, v in zip(PACKED_STATS_KEYS, vals)}
        npx = self.engine.width * self.engine.height
        conv_pct = stats["converged"] / npx * 100.0
        stats["converged_percentage"] = conv_pct
        stats["event"] = "updated"

        # keyframe switch policy (depthmap_node.cpp:142-157) — only stats
        # from the current keyframe generation may trigger a switch
        if (
            gen == self._generation
            and self.state == NodeState.UPDATE
            and (
                conv_pct > self.cfg.ref_compl_perc
                or stats["dist_from_ref"] > self.cfg.max_dist_from_ref
            )
        ):
            self._finalize_keyframe(conv_pct)
            self.state = NodeState.TAKE_REFERENCE_FRAME
            self._generation += 1
            stats["event"] = "keyframe_complete"
        self.metrics.log(frame_no, stats)
        return stats

    def _publish_convergence(self, snapshot: SeedState) -> None:
        from rpg_open_remode_tpu.io import convergence_overlay

        self.on_convergence(convergence_overlay(snapshot))

    # -- keyframe completion (denoiseAndPublishResults, :165-182) -----------

    def _prune_pending(self) -> None:
        """Drop completed worker futures (long live runs would otherwise
        grow the list unboundedly), surfacing their exceptions NOW rather
        than at close()."""
        still = []
        for f in self._pending:
            if f.done():
                f.result()   # raises if the worker task failed
            else:
                still.append(f)
        self._pending = still

    def _finalize_keyframe(self, conv_pct: float) -> None:
        # The entire finalization (denoise + device->host download + user
        # export) runs on the worker thread so the mapping loop re-seeds and
        # keeps ingesting frames immediately — the reference's std::async
        # overlap (depthmap_node.cpp:170-172), without its ref-image race:
        # the snapshot is an immutable pytree.
        snapshot = self.engine.state
        n_updates = self._n_updates
        self._prune_pending()
        self._pending.append(
            self._executor.submit(self._complete_keyframe, snapshot, conv_pct,
                                  n_updates)
        )

    def _complete_keyframe(self, snapshot, conv_pct, n_updates) -> None:
        if self.denoise_on_completion:
            denoised = np.asarray(
                self.engine._jit_denoise(
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

    def drain(self) -> dict | None:
        """Resolve every in-flight stats packet (possibly finalizing a
        keyframe); returns the last resolved metrics."""
        out = None
        while self._pending_stats:
            out = self._resolve_oldest()
        return out

    def flush(self) -> None:
        """Wait for all async keyframe exports (surfacing exceptions)."""
        self.drain()
        for f in self._pending:
            f.result()
        self._pending = []

    def close(self) -> None:
        self.flush()
        self._executor.shutdown(wait=True)
        self._fetcher.shutdown(wait=True)
        self.metrics.close()

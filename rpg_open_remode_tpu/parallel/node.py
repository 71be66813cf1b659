"""Mesh-sharded keyframe-lifecycle mapping loop — the application layer of
the multi-device path.

The reference's application layer is a single-GPU node
(src/depthmap_node.cpp:96-182).  This is its scale-out sibling: a ring of
concurrent reference keyframes batched ``[KF, H, W]`` and sharded over a
``('kf', 'ty', 'tx')`` mesh (keyframes across hosts over DCN, depthmap
tiles across chips over ICI — SURVEY.md section 7 stage 5, BASELINE.json
config 5), driven through the reference's full lifecycle: the
converged%/distance switch policy (depthmap_node.cpp:142-157), staggered
slot reseeds, sharded TV-L1 finalization denoise, and asynchronous
per-keyframe export.

SPMD discipline (the part the single-device node never needed): in a
multi-process program every process must issue the same device programs in
the same order, so every control decision must be computed from
process-identical values.  The sharded step therefore returns its per-kf
metrics matrix REPLICATED (an all_gather over 'kf',
parallel/sharded.py), the switch policy runs identically in every
process, and reseed/denoise calls are issued by all processes together.
Only the *export* of a finalized keyframe is per-process: the process
holding the slot's shards (kf-major layout = whole keyframes per process)
assembles the snapshot with :func:`~.distributed.gather_kf_slot` and runs
the user callback; everyone else skips.

Asynchrony mirrors models/node.py: metrics are fetched every
``policy_stride`` frames on a fetcher thread and acted on one stride later
(lagged but deterministic — WHICH values the policy sees depends only on
frame counts, never transfer timing, so all processes stay in lockstep);
finalization fetch+export runs on a worker thread over immutable
pre-reseed snapshots (the reseed program is non-donating precisely so
those buffers stay valid).
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.models.state import SceneParams, SeedState, empty_state
from rpg_open_remode_tpu.parallel.distributed import gather_kf_slot
from rpg_open_remode_tpu.parallel.sharded import (
    SHARDED_PACKED_KEYS,
    build_sharded_denoise,
    build_sharded_reseed,
    build_sharded_update,
    shard_state,
    stack_states,
)
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera


class ShardedDepthmapNode:
    """Keyframe-ring mapping loop over a ``('kf','ty','tx')`` device mesh.

    ``n_keyframes`` defaults to the mesh's kf-axis size (one slot per kf
    row); any multiple works (the step scans device-local slots).
    ``on_keyframe(result: models.node.KeyframeResult)`` fires on a worker
    thread in the process that owns the finalized slot.
    """

    def __init__(
        self,
        mesh,
        width: int,
        height: int,
        fx: float,
        cx: float,
        fy: float,
        cy: float,
        n_keyframes: int | None = None,
        cfg: RemodeConfig | None = None,
        on_keyframe=None,
        denoise_on_completion: bool = True,
        policy_stride: int = 6,
        stagger: int = 10,
    ):
        self.mesh = mesh
        self.cfg = cfg or RemodeConfig.for_camera(fx)
        self.cam = PinholeCamera.create(fx, fy, cx, cy)
        self.width, self.height = width, height
        kf_axis = mesh.shape["kf"]
        self.n = n_keyframes or kf_axis
        assert self.n % kf_axis == 0, (
            f"n_keyframes={self.n} must be a multiple of the kf mesh axis "
            f"({kf_axis})"
        )
        self.on_keyframe = on_keyframe
        self.denoise_on_completion = denoise_on_completion
        self.policy_stride = max(int(policy_stride), 1)
        self.stagger = max(int(stagger), 1)

        self._validate_kf_locality()
        base = empty_state(height, width, self.cam)
        self.states: SeedState = shard_state(stack_states([base] * self.n), mesh)
        self._step = build_sharded_update(mesh, self.cam, self.cfg, height, width)
        self._reseed_jit = build_sharded_reseed(
            mesh, self.cam, self.cfg, height, width
        )
        self._denoise = build_sharded_denoise(
            mesh, self.cfg, height, width, iterations=self.cfg.denoise_iters
        ) if denoise_on_completion else None

        self.num_msgs = 0
        self._n_updates = [0] * self.n
        self._generation = [0] * self.n
        self._forced_reseed_done = [False] * self.n
        self._pending_stats: collections.deque = collections.deque()
        self._executor = ThreadPoolExecutor(max_workers=1)
        self._fetcher = ThreadPoolExecutor(max_workers=1)
        self._pending = []
        self.keyframes = []          # KeyframeResults exported BY THIS PROCESS

    def _validate_kf_locality(self):
        """Fail fast if a keyframe's spatial tiles span processes.

        Export ownership (:meth:`_complete_keyframe`) assumes whole
        keyframes are process-local: :func:`~.distributed.gather_kf_slot`
        returns ``None`` in every process that lacks the slot's full
        spatial extent, on the premise that exactly one other process has
        it. If the mesh puts a kf row's ty/tx tiles on several processes,
        NO process holds the full extent and finalized keyframes would be
        silently dropped — so reject that layout at construction (use
        :func:`~.distributed.make_distributed_mesh`, which is kf-major, or
        keep spatial axes within a process)."""
        if jax.process_count() == 1:
            return
        sharding = NamedSharding(self.mesh, P("kf", "ty", "tx"))
        idx_map = sharding.devices_indices_map(
            (self.n, self.height, self.width)
        )
        owners: dict[int, set] = {}
        for dev, idx in idx_map.items():
            k0, k1, _ = idx[0].indices(self.n)
            for k in range(k0, k1):
                owners.setdefault(k, set()).add(dev.process_index)
        bad = {k: sorted(v) for k, v in owners.items() if len(v) > 1}
        if bad:
            raise ValueError(
                "ShardedDepthmapNode requires each keyframe row's spatial "
                "shards to live on a single process (kf-major layout); "
                f"keyframe slots spanning processes: {bad}. Use "
                "make_distributed_mesh() or reduce the spatial mesh axes "
                "per process."
            )

    # -- sharded one-hot slot selector --------------------------------------

    def _onehot(self, slot: int) -> jax.Array:
        full = np.zeros((self.n,), np.float32)
        full[slot] = 1.0
        sharding = NamedSharding(self.mesh, P("kf"))
        if jax.process_count() == 1:
            return jax.device_put(full, sharding)
        # multi-process: contribute only this process's kf rows
        idx_map = sharding.addressable_devices_indices_map((self.n,))
        rows = sorted({sl[0].indices(self.n)[:2] for sl in idx_map.values()})
        local = np.concatenate([full[a:b] for (a, b) in rows])
        return jax.make_array_from_process_local_data(sharding, local, (self.n,))

    # -- frame ingestion -----------------------------------------------------

    def process_frame(self, image, T_curr_world, min_depth, max_depth) -> dict:
        """Feed one frame (pose + scene depth bounds, the DenseInput fields).
        Returns the newest resolved per-slot metrics the async pipeline can
        know without stalling dispatch."""
        image = np.asarray(image)
        T_curr_world = np.asarray(T_curr_world, np.float32)
        if self.num_msgs == 0:
            # fill the whole ring from the first frame; the stagger below
            # diversifies slot lifecycles
            T_world_ref = np.asarray(se3.inv(T_curr_world))
            scene = SceneParams.create(min_depth, max_depth, self.cfg)
            for slot in range(self.n):
                self.states = self._reseed_jit(
                    self.states, self._onehot(slot), image, T_world_ref, scene
                )
            self._bounds = (float(min_depth), float(max_depth))
            self.num_msgs = 1
            return {"event": "reference_set"}

        self.num_msgs += 1
        self._bounds = (float(min_depth), float(max_depth))
        self._last_frame = (image, T_curr_world)
        self.states, stats = self._step(self.states, image, T_curr_world)
        for s in range(self.n):
            self._n_updates[s] += 1
        # generation snapshot BEFORE any same-frame stagger reseed: the
        # dispatched stats belong to the generations at dispatch time
        gens_at_dispatch = tuple(self._generation)
        n_upds_at_dispatch = tuple(self._n_updates)

        n = self.num_msgs - 1
        if n % self.stagger == 0:
            slot = n // self.stagger
            if 0 < slot < self.n and not self._forced_reseed_done[slot]:
                self._reseed_slot(slot)
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
        packed = fetch.result()            # [KF, 6] replicated -> identical
        npx = self.width * self.height     # in every process
        out = {"event": "updated", "frame": frame_no, "slots": []}
        finalizing = []
        for slot in range(self.n):
            vals = {k: float(v) for k, v in zip(SHARDED_PACKED_KEYS, packed[slot])}
            conv_pct = vals["converged"] / npx * 100.0
            vals["converged_percentage"] = conv_pct
            out["slots"].append(vals)
            if gens[slot] != self._generation[slot]:
                continue   # stats predate this slot's reseed
            if (
                conv_pct > self.cfg.ref_compl_perc
                or vals["dist_from_ref"] > self.cfg.max_dist_from_ref
            ):
                finalizing.append(slot)
                out["event"] = "keyframe_complete"
        if finalizing:
            self._finalize_slots(finalizing, n_upds)
        return out

    # -- slot lifecycle --------------------------------------------------------

    def _finalize_slots(self, slots, n_upds):
        # ONE pre-reseed snapshot + ONE sharded denoise serves every slot
        # finalizing on this stats packet (spatial tiles in parallel, 1-px
        # ppermute halos per iteration; the kf batch denoises together so
        # wall time equals one keyframe's) — the policy can trip several
        # slots at once and a full-batch denoise per slot would be waste
        snapshot = self.states
        den = (
            self._denoise(snapshot, self.cfg.denoise_lambda)
            if self.denoise_on_completion else None
        )
        self._pending = [
            f for f in self._pending if not (f.done() and f.result() is None)
        ]
        for slot in slots:
            self._pending.append(
                self._executor.submit(
                    self._complete_keyframe, snapshot, den, slot,
                    n_upds[slot],
                )
            )
            self._reseed_slot(slot)

    def _reseed_slot(self, slot):
        img, T = self._last_frame
        scene = SceneParams.create(*self._bounds, self.cfg)
        T_world_ref = np.asarray(se3.inv(T))
        # NOT donated: finalize snapshots keep their buffers
        self.states = self._reseed_jit(
            self.states, self._onehot(slot), img, T_world_ref, scene
        )
        self._generation[slot] += 1
        self._n_updates[slot] = 0

    def _complete_keyframe(self, snapshot, den, slot, n_updates):
        from rpg_open_remode_tpu.models.node import KeyframeResult

        vals = [gather_kf_slot(x, slot) for x in jax.tree.leaves(snapshot)]
        if any(v is None for v in vals):
            return None    # another process owns this keyframe; it exports
        leaves = jax.tree.unflatten(jax.tree.structure(snapshot), vals)
        if den is not None:
            denoised = gather_kf_slot(den, slot)
        else:
            denoised = np.asarray(leaves.mu)
        # exact converged% at snapshot time (the policy's conv_pct lags by
        # up to 2*policy_stride frames; the export metadata shouldn't)
        from rpg_open_remode_tpu.config import ConvergenceState

        exact_pct = 100.0 * float(
            (leaves.conv == int(ConvergenceState.CONVERGED)).mean()
        )
        result = KeyframeResult(
            state=leaves,
            denoised_depth=denoised,
            converged_percentage=exact_pct,
            n_updates=n_updates,
        )
        self.keyframes.append(result)
        if self.on_keyframe is not None:
            self.on_keyframe(result)
        return None

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

"""The user-facing dense-mapping engine.

Functional core + thin stateful facade, replacing the reference's
``rmd::Depthmap`` (include/rmd/depthmap.h:34-129, src/depthmap.cpp) and the
engine ``SeedMatrix`` (src/seed_matrix.cu) it wraps. The whole per-frame
pipeline — classify, epipolar match, triangulate, Bayesian fusion, metrics —
is ONE jitted function (``update_step``); XLA fuses what the reference runs
as four kernel launches with host syncs in between.

Pose convention (matches the reference, SURVEY.md section 3.5): callers pass
``T_curr_world``; the engine stores ``T_world_ref = inv(T_curr_world)`` at
keyframe creation and forms ``T_curr_ref = T_curr_world * T_world_ref`` per
frame (src/seed_matrix.cu:108,124).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SceneParams, SeedState, empty_state
from rpg_open_remode_tpu.ops import denoise as denoise_ops
from rpg_open_remode_tpu.ops import epipolar, reduction, seed_check, seed_init, seed_update
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera
from rpg_open_remode_tpu.utils.interp import bilinear
from rpg_open_remode_tpu.utils import warp as warp_ops


# ---------------------------------------------------------------------------
# Functional core
# ---------------------------------------------------------------------------

# order of the per-frame metrics in stats["packed"] (see update_step)
PACKED_STATS_KEYS = (
    "update", "converged", "border", "diverged", "no_match",
    "dist_from_ref", "mean_ncc",
)


def set_reference(
    state: SeedState,
    ref_img: jnp.ndarray,
    T_curr_world: jnp.ndarray,
    scene: SceneParams,
    cfg: RemodeConfig,
) -> SeedState:
    """New keyframe (SeedMatrix::setReferenceImage, seed_matrix.cu:87-118)."""
    return seed_init.init_seeds(
        state, _prep_traced(ref_img), se3.inv(T_curr_world), scene, cfg
    )


def _prep_traced(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 -> float [0,1] (depthmap.cpp:103-106). Traced into the caller's
    program: the dtype is part of the trace signature, so feeding uint8
    camera frames and float test images just specializes two variants —
    and the facade pays ONE dispatch per frame instead of a separate prep
    call (each extra dispatch costs real latency through this backend)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


def update_step(
    state: SeedState,
    curr_img: jnp.ndarray,
    T_curr_world: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
):
    """One measurement frame (SeedMatrix::update, seed_matrix.cu:120-158).

    Returns ``(state', stats)`` where stats is a dict of scalar metrics.
    ``curr_img`` may be uint8 (converted in-trace) or float.
    """
    curr_img = _prep_traced(curr_img)
    height, width = curr_img.shape
    T_curr_ref = se3.compose(T_curr_world, state.T_world_ref)
    dist_from_ref = jnp.linalg.norm(se3.translation(T_curr_ref))

    # 1. classify (seedCheckKernel)
    border = seed_check.border_mask(height, width, cfg)
    conv1 = seed_check.classify_seeds(
        state.mu, state.sigma_sq, state.a, state.b, state.scene.epsilon, border, cfg
    )
    state = dataclasses.replace(state, conv=conv1)

    # 2. epipolar NCC match (seedEpipolarMatchKernel)
    result = epipolar.match(state, curr_img, T_curr_ref, cam, cfg)
    active = conv1 == int(ConvergenceState.UPDATE)
    conv2 = epipolar.apply_match_to_conv(conv1, active, result.found)

    # 3. triangulate + Bayesian fusion (seedUpdateKernel)
    new_state = seed_update.update_seeds(
        state, conv2, result.u, result.v, se3.inv(T_curr_ref), cam, cfg
    )

    stats = reduction.convergence_stats(conv2)
    stats["dist_from_ref"] = dist_from_ref
    stats["mean_ncc"] = jnp.mean(jnp.where(result.found, result.best_ncc, 0.0))
    # one fetchable vector for the async lifecycle path (models/node.py):
    # downloading a single packed array per frame instead of 7 scalars
    # keeps the keyframe switch policy off the per-frame sync path
    stats["packed"] = jnp.stack(
        [stats[k].astype(jnp.float32) for k in PACKED_STATS_KEYS]
    )
    return new_state, stats


def update_chunk(
    state: SeedState,
    imgs: jnp.ndarray,
    Ts_curr_world: jnp.ndarray,
    cam: PinholeCamera,
    cfg: RemodeConfig,
):
    """K measurement frames in ONE dispatch (offline/recorded replay, the
    shape of the reference's ``test/dataset_main.cpp:101-135`` batch loop).

    On this backend every dispatch pays a fixed host->device RPC latency
    (~2-3 ms, CLAUDE.md); scanning over a stacked ``[K, H, W]`` frame chunk
    amortizes that to 1/K per frame while keeping the identical per-frame
    math (the scan body IS ``update_step``). Returns ``(state', packed)``
    with ``packed[k]`` the frame-k metrics vector in ``PACKED_STATS_KEYS``
    order. Frames may be uint8 (converted in-trace).
    """

    def body(st, xs):
        img, T = xs
        st2, stats = update_step(st, img, T, cam, cfg)
        return st2, stats["packed"]

    return jax.lax.scan(body, state, (imgs, Ts_curr_world))


def _update_chunk_undistort(state, imgs, gu, gv, Ts, cam, cfg):
    def body(st, xs):
        img, T = xs
        img = warp_ops.warp_grid(_prep_traced(img), gu, gv)
        st2, stats = update_step(st, img, T, cam, cfg)
        return st2, stats["packed"]

    return jax.lax.scan(body, state, (imgs, Ts))


def denoise_depthmap(state: SeedState, cfg: RemodeConfig, lam=None, iterations=None):
    """downloadDenoisedDepthmap (depthmap.cpp:113-123)."""
    return denoise_ops.denoise(
        state.mu,
        state.a,
        state.b,
        state.sigma_sq,
        state.scene.depth_range,
        cfg,
        lam=lam,
        iterations=iterations,
    )


def undistort_map(
    height: int, width: int, cam: PinholeCamera, k1, k2, p1, p2
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute the rectification grid (replaces cv::initUndistortRectifyMap
    in depthmap.cpp:45-61): for each output pixel, the distorted source
    coordinate under the plumb-bob model."""
    v, u = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    x = (u - cam.cx) / cam.fx
    y = (v - cam.cy) / cam.fy
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return cam.fx * xd + cam.cx, cam.fy * yd + cam.cy


# ---------------------------------------------------------------------------
# Stateful facade
# ---------------------------------------------------------------------------

# One jit object per *trace-relevant* cfg value, cached forever. jax 0.9
# mis-dispatches when two distinct jit objects trace identical computations
# (hidden hoisted-constant parameters of one executable leak into the
# other's call: "Execution supplied N buffers but compiled program expected
# M"), so engines whose configs differ only in host-side policy knobs
# (keyframe switching thresholds) MUST share one jit object — normalize
# those fields out of the cache key.
@jax.jit
def _prep_plain(img):
    """uint8 -> float [0,1] (depthmap.cpp:103-106), in one traced program
    (eager per-frame ops each pay a dispatch round trip on this backend)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


@jax.jit
def _prep_undistort(img, gu, gv):
    return warp_ops.warp_grid(_prep_plain(img), gu, gv)


def _set_reference_undistort(state, img, gu, gv, T_curr_world, scene, cfg):
    img = warp_ops.warp_grid(_prep_traced(img), gu, gv)
    return set_reference(state, img, T_curr_world, scene, cfg)


def _set_reference_propagated(state, img, T_curr_world, scene, cam, cfg):
    """New keyframe warm-started from the old keyframe's posterior
    (cfg.propagate_depth; ops/propagate.py) — one fused dispatch."""
    from rpg_open_remode_tpu.ops import propagate

    prior = propagate.propagate_depth(state, T_curr_world, scene, cam, cfg)
    return seed_init.init_seeds(
        state, _prep_traced(img), se3.inv(T_curr_world), scene, cfg,
        prior=prior,
    )


def _update_step_undistort(state, img, gu, gv, T_curr_world, cam, cfg):
    img = warp_ops.warp_grid(_prep_traced(img), gu, gv)
    return update_step(state, img, T_curr_world, cam, cfg)


@functools.lru_cache(maxsize=None)
def _jits_for(cfg: RemodeConfig):
    cfg = dataclasses.replace(
        cfg, ref_compl_perc=0.0, max_dist_from_ref=0.0, publish_conv_every_n=0
    )
    return (
        jax.jit(functools.partial(set_reference, cfg=cfg)),
        jax.jit(functools.partial(update_step, cfg=cfg)),
        jax.jit(
            functools.partial(denoise_depthmap, cfg=cfg),
            static_argnames=("iterations",),
        ),
        jax.jit(functools.partial(_set_reference_undistort, cfg=cfg)),
        jax.jit(functools.partial(_update_step_undistort, cfg=cfg)),
        jax.jit(functools.partial(update_chunk, cfg=cfg)),
        jax.jit(functools.partial(_update_chunk_undistort, cfg=cfg)),
        jax.jit(functools.partial(_set_reference_propagated, cfg=cfg)),
    )


class Depthmap:
    """Drop-in facade mirroring ``rmd::Depthmap`` (include/rmd/depthmap.h).

    Owns the seed-state pytree and jitted step functions. All heavy work
    stays on device; downloads happen only on explicit ``depthmap()`` /
    ``convergence_map()`` calls.
    """

    def __init__(
        self,
        width: int,
        height: int,
        fx: float,
        cx: float,
        fy: float,
        cy: float,
        cfg: RemodeConfig | None = None,
    ):
        self.width = width
        self.height = height
        # no explicit cfg: scale the reference constants to the camera's
        # focal length (patch angular footprint + disparity window;
        # RemodeConfig.for_camera) — at fx <= 481.2 this IS the reference
        self.cfg = cfg or RemodeConfig.for_camera(fx)
        self.cam = PinholeCamera.create(fx, fy, cx, cy)
        self.state = empty_state(height, width, self.cam)
        self._has_reference = False
        self._undistort_grid = None

        (
            self._jit_set_reference,
            self._jit_update,
            self._jit_denoise,
            self._jit_set_reference_u,
            self._jit_update_u,
            self._jit_update_chunk,
            self._jit_update_chunk_u,
            self._jit_set_reference_prop,
        ) = _jits_for(self.cfg)

    # -- preprocessing (depthmap.cpp:95-106) --------------------------------

    def init_undistortion_map(self, k1, k2, p1, p2) -> None:
        self._undistort_grid = undistort_map(
            self.height, self.width, self.cam, k1, k2, p1, p2
        )

    def input_image(self, img) -> jnp.ndarray:
        """8-bit -> float [0,1] + optional undistortion remap (the remap is
        two-pass scanline resampling: a per-frame 2-D gather costs ~13 ms
        on TPU; lens remaps are smooth and near-identity, where the
        separation error is negligible)."""
        img = jnp.asarray(img)
        if self._undistort_grid is not None:
            gu, gv = self._undistort_grid
            return _prep_undistort(img, gu, gv)
        return _prep_plain(img)

    # -- keyframe lifecycle ---------------------------------------------------

    def restore(self, state: SeedState) -> None:
        """Adopt a (checkpointed) keyframe state — deterministic resume
        (io.checkpoint.load_state; the reference has no persistence at all,
        SURVEY.md section 5)."""
        assert state.shape == (self.height, self.width), state.shape
        self.state = state
        self._has_reference = True

    def set_reference_image(self, img, T_curr_world, min_depth, max_depth) -> bool:
        scene = SceneParams.create(min_depth, max_depth, self.cfg)
        T = jnp.asarray(T_curr_world, jnp.float32)
        if self._undistort_grid is not None:
            gu, gv = self._undistort_grid
            self.state = self._jit_set_reference_u(
                self.state, jnp.asarray(img), gu, gv, T, scene
            )
        elif self.cfg.propagate_depth and self._has_reference:
            # warm-start from the outgoing keyframe's posterior (one fused
            # dispatch: propagation + seed init)
            self.state = self._jit_set_reference_prop(
                self.state, jnp.asarray(img), T, scene, self.cam
            )
        else:
            self.state = self._jit_set_reference(
                self.state, jnp.asarray(img), T, scene
            )
        self._has_reference = True
        return True

    def update(self, img, T_curr_world) -> dict:
        """One measurement frame. Prep (uint8 conversion + optional
        undistortion) is traced into the update program — exactly ONE
        device dispatch per frame."""
        assert self._has_reference, "set_reference_image must be called first"
        T = jnp.asarray(T_curr_world, jnp.float32)
        if self._undistort_grid is not None:
            gu, gv = self._undistort_grid
            self.state, stats = self._jit_update_u(
                self.state, jnp.asarray(img), gu, gv, T, self.cam
            )
        else:
            self.state, stats = self._jit_update(
                self.state, jnp.asarray(img), T, self.cam
            )
        return stats

    def update_chunk(self, imgs, Ts_curr_world) -> np.ndarray:
        """K frames in one dispatch (offline replay; see update_chunk above).

        ``imgs``: ``[K, H, W]`` stacked frames (uint8 or float),
        ``Ts_curr_world``: ``[K, 3, 4]``. Returns the ``[K, 7]`` packed
        per-frame metrics (PACKED_STATS_KEYS order) as a device array —
        convert lazily to avoid a sync.
        """
        assert self._has_reference, "set_reference_image must be called first"
        Ts = jnp.asarray(Ts_curr_world, jnp.float32)
        if self._undistort_grid is not None:
            gu, gv = self._undistort_grid
            self.state, packed = self._jit_update_chunk_u(
                self.state, jnp.asarray(imgs), gu, gv, Ts, self.cam
            )
        else:
            self.state, packed = self._jit_update_chunk(
                self.state, jnp.asarray(imgs), Ts, self.cam
            )
        return packed

    # -- outputs --------------------------------------------------------------

    def depthmap(self) -> np.ndarray:
        return np.asarray(self.state.mu)

    def denoised_depthmap(self, lam: float = 0.5, iterations: int = 200) -> np.ndarray:
        return np.asarray(
            self._jit_denoise(self.state, lam=lam, iterations=iterations)
        )

    def convergence_map(self) -> np.ndarray:
        return np.asarray(self.state.conv)

    def reference_image(self) -> np.ndarray:
        """The keyframe image, float [0, 1] (getReferenceImage,
        depthmap.cpp:141-145 — used there for reference-view display)."""
        return np.asarray(self.state.ref_img)

    def converged_percentage(self) -> float:
        """getConvergedPercentage (depthmap.cpp:150-154)."""
        return float(self.state.converged_fraction()) * 100.0

    @staticmethod
    def scale_mat(depth: np.ndarray) -> np.ndarray:
        """Min-max normalize to [0, 1] for display (depthmap.cpp:158-169)."""
        lo, hi = float(np.min(depth)), float(np.max(depth))
        if hi <= lo:
            return np.zeros_like(depth)
        return (depth - lo) / (hi - lo)

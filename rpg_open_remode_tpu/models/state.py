"""Immutable engine state pytrees.

The reference keeps this state as ten mutable pitched device buffers owned by
``SeedMatrix`` (include/rmd/seed_matrix.cuh:87-108) plus a POD of scalars
(include/rmd/mvs_device_data.cuh:92-102). Here it is one functional pytree:
``step(state, frame, pose) -> state'``. Everything is ``[H, W]``-shaped (or a
scalar), so the whole state shards uniformly over a 2-D device mesh, and a
batch of keyframes is just a leading axis added by ``vmap``/``shard_map``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.utils.camera import PinholeCamera


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneParams:
    """Per-keyframe scene depth statistics (mvs_device_data.cuh:30-37 +
    the derived algorithm scalars of seed_matrix.cu:96-104)."""

    min_depth: jnp.ndarray
    max_depth: jnp.ndarray
    avg_depth: jnp.ndarray
    depth_range: jnp.ndarray
    sigma_sq_max: jnp.ndarray
    epsilon: jnp.ndarray

    @classmethod
    def create(cls, min_depth, max_depth, cfg: RemodeConfig) -> "SceneParams":
        min_d = jnp.asarray(min_depth, jnp.float32)
        max_d = jnp.asarray(max_depth, jnp.float32)
        rng = max_d - min_d
        return cls(
            min_depth=min_d,
            max_depth=max_d,
            avg_depth=(min_d + max_d) / 2.0,
            depth_range=rng,
            sigma_sq_max=rng * rng * cfg.sigma_sq_max_factor,
            # NB the reference compares sigma_sq against range/1000 directly
            # (dimensionally odd but load-bearing): seed_matrix.cu:104
            epsilon=rng * cfg.epsilon_factor,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SeedState:
    """Full per-keyframe filter state.

    All image-shaped leaves are ``[H, W]`` float32 except ``conv`` (int32).
    ``f_ref`` is the precomputed normalized bearing field, channel-first
    ``[3, H, W]`` to keep trailing dims TPU-tileable.
    """

    ref_img: jnp.ndarray            # reference keyframe, [0, 1]
    sum_templ: jnp.ndarray          # 5x5 patch sums of ref_img
    const_templ_denom: jnp.ndarray  # N*sum(t^2) - sum(t)^2 per pixel
    f_ref: jnp.ndarray              # [3, H, W] normalized bearings
    mu: jnp.ndarray                 # depth mean (along-ray)
    sigma_sq: jnp.ndarray           # depth variance
    a: jnp.ndarray                  # Beta inlier evidence
    b: jnp.ndarray                  # Beta outlier evidence
    conv: jnp.ndarray               # ConvergenceState, int32
    match_u: jnp.ndarray            # last epipolar match, x pixel coord
    match_v: jnp.ndarray            # last epipolar match, y pixel coord
    T_world_ref: jnp.ndarray        # (3, 4) keyframe pose
    scene: SceneParams

    @property
    def shape(self) -> tuple[int, int]:
        return self.mu.shape  # type: ignore[return-value]

    def converged_fraction(self) -> jnp.ndarray:
        """Fraction of seeds in CONVERGED state (replaces the reference's
        two-stage device reduction, src/reduction.cu:80-173)."""
        return jnp.mean((self.conv == int(ConvergenceState.CONVERGED)).astype(jnp.float32))


def empty_state(height: int, width: int, cam: PinholeCamera) -> SeedState:
    """Allocate a zeroed state (before any reference frame is set)."""
    z = jnp.zeros((height, width), jnp.float32)
    return SeedState(
        ref_img=z,
        sum_templ=z,
        const_templ_denom=z,
        f_ref=cam.bearing_grid(height, width),
        mu=z,
        sigma_sq=z,
        a=z,
        b=z,
        conv=jnp.zeros((height, width), jnp.int32),
        match_u=z,
        match_v=z,
        T_world_ref=jnp.concatenate(
            [jnp.eye(3, dtype=jnp.float32), jnp.zeros((3, 1), jnp.float32)], axis=1
        ),
        scene=SceneParams.create(0.0, 1.0, RemodeConfig()),
    )

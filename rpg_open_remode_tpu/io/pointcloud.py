"""Point-cloud assembly and export — the reference Publisher, TPU-native.

The reference back-projects every CONVERGED pixel on the CPU, one pixel at a
time, into a PCL ``PointXYZI`` cloud and publishes it over ROS
(src/publisher.cpp:54-104): ``p = T_world_ref * (f_hat * depth)`` with the
reference image intensity.  Here the back-projection is a single vectorized
device expression; export goes to binary PLY (via the native C++ writer) or
NPZ instead of ROS topics.  The convergence-map visualization (reference
tints CONVERGED blue / DIVERGED red over the gray image,
src/publisher.cpp:119-136) is reproduced as an RGB array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rpg_open_remode_tpu import native
from rpg_open_remode_tpu.config import ConvergenceState
from rpg_open_remode_tpu.models.state import SeedState


@jax.jit
def _backproject(f_ref, depth, T_world_ref):
    """World-frame points of all pixels: T_world_ref @ (f_hat * depth)
    (publisher.cpp:73-76)."""
    pts_ref = f_ref * depth[None, :, :]                      # [3, H, W]
    R = T_world_ref[:, :3]
    t = T_world_ref[:, 3]
    return jnp.einsum("ij,jhw->ihw", R, pts_ref) + t[:, None, None]


def backproject_converged(
    state: SeedState, depth: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(xyz [N, 3], intensity [N]) of all CONVERGED seeds in world frame.

    ``depth`` defaults to the raw posterior mean; pass the denoised map for
    smoothed clouds (the reference publishes the denoised map,
    depthmap_node.cpp:167-170).
    """
    d = state.mu if depth is None else jnp.asarray(depth)
    pts = _backproject(state.f_ref, d, state.T_world_ref)
    conv = np.asarray(state.conv)
    mask = conv == int(ConvergenceState.CONVERGED)
    xyz = np.asarray(pts).transpose(1, 2, 0)[mask]
    intensity = np.asarray(state.ref_img)[mask]
    return xyz.astype(np.float32), intensity.astype(np.float32)


def save_pointcloud_ply(
    path: str, state: SeedState, depth: np.ndarray | None = None
) -> int:
    """Export the converged-seed cloud as binary PLY. Returns point count."""
    xyz, intensity = backproject_converged(state, depth)
    native.write_ply(path, xyz, intensity)
    return xyz.shape[0]


def save_pointcloud_npz(
    path: str, state: SeedState, depth: np.ndarray | None = None
) -> int:
    xyz, intensity = backproject_converged(state, depth)
    np.savez_compressed(path, xyz=xyz, intensity=intensity)
    return xyz.shape[0]


def voxel_downsample(
    xyz: np.ndarray,
    intensity: np.ndarray,
    voxel: float,
    weights: np.ndarray | None = None,
):
    """Mean position/intensity per occupied voxel of edge length ``voxel``
    (meters). Deterministic: order-independent sums over voxel bins.

    Without ``weights``, returns ``(xyz, intensity)`` of plain per-voxel
    means. With ``weights`` (per input point), returns
    ``(xyz, intensity, weight)`` of weighted means plus each voxel's summed
    weight — the representation that lets incremental fusion (GlobalMap)
    keep exact running means when prior voxels re-enter with new points."""
    if xyz.shape[0] == 0:
        if weights is None:
            return xyz, intensity
        return xyz, intensity, np.zeros((0,), np.float64)
    w = np.ones(xyz.shape[0], np.float64) if weights is None else weights
    keys = np.floor(xyz / voxel).astype(np.int64)
    keys -= keys.min(axis=0)
    dims = keys.max(axis=0) + 1
    flat = (keys[:, 0] * dims[1] + keys[:, 1]) * dims[2] + keys[:, 2]
    uniq, inv = np.unique(flat, return_inverse=True)
    wsum = np.bincount(inv, weights=w)
    out = np.empty((uniq.shape[0], 3), np.float32)
    for i in range(3):
        out[:, i] = np.bincount(inv, weights=w * xyz[:, i]) / wsum
    inten = (np.bincount(inv, weights=w * intensity) / wsum).astype(np.float32)
    if weights is None:
        return out, inten
    return out, inten, wsum


class GlobalMap:
    """World-frame map fused across keyframes.

    The reference publishes one cloud per keyframe and leaves accumulation
    to rviz (src/publisher.cpp:54-104, open_remode.rviz); this makes the
    accumulated product explicit: every finalized keyframe's converged
    seeds are back-projected (with the denoised depth) and fused into a
    voxel grid, so overlapping keyframes merge instead of duplicating.
    Thread-safe — ``add_keyframe`` is designed as a ``DepthmapNode``
    ``on_keyframe`` consumer (worker-thread callback).
    """

    def __init__(self, voxel: float = 0.01):
        import threading

        self.voxel = float(voxel)
        self._lock = threading.Lock()
        self._xyz = np.zeros((0, 3), np.float32)
        self._intensity = np.zeros((0,), np.float32)
        self._weight = np.zeros((0,), np.float64)   # points fused per voxel
        self.n_keyframes = 0

    def add_keyframe(self, result) -> None:
        """Fuse a finalized keyframe (``models.node.KeyframeResult`` or any
        object with ``.state`` and ``.denoised_depth``)."""
        xyz, inten = backproject_converged(result.state, result.denoised_depth)
        with self._lock:
            # incremental re-fusion keeps memory bounded by occupied voxels;
            # carrying each voxel's summed weight keeps the running means
            # exact (a prior voxel mean re-enters weighted by its point
            # count, not as one point)
            self._xyz, self._intensity, self._weight = voxel_downsample(
                np.concatenate([self._xyz, xyz]),
                np.concatenate([self._intensity, inten]),
                self.voxel,
                weights=np.concatenate(
                    [self._weight, np.ones(xyz.shape[0], np.float64)]
                ),
            )
            self.n_keyframes += 1

    def cloud(self) -> tuple[np.ndarray, np.ndarray]:
        with self._lock:
            return self._xyz.copy(), self._intensity.copy()

    def save_ply(self, path: str) -> int:
        xyz, inten = self.cloud()
        native.write_ply(path, xyz, inten)
        return xyz.shape[0]

    def save_npz(self, path: str) -> int:
        xyz, inten = self.cloud()
        np.savez_compressed(path, xyz=xyz, intensity=inten)
        return xyz.shape[0]


def convergence_overlay(state: SeedState) -> np.ndarray:
    """RGB uint8 [H, W, 3]: reference image tinted blue where CONVERGED and
    red where DIVERGED (publisher.cpp:119-136)."""
    gray = np.clip(np.asarray(state.ref_img) * 255.0, 0, 255).astype(np.uint8)
    rgb = np.stack([gray, gray, gray], axis=-1)
    conv = np.asarray(state.conv)
    rgb[conv == int(ConvergenceState.CONVERGED)] = [0, 0, 255]
    rgb[conv == int(ConvergenceState.DIVERGED)] = [255, 0, 0]
    return rgb

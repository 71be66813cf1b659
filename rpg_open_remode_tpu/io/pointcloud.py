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
    xyz: np.ndarray, intensity: np.ndarray, voxel: float
) -> tuple[np.ndarray, np.ndarray]:
    """Mean position/intensity per occupied voxel of edge length ``voxel``
    (meters). Deterministic: order-independent sums over voxel bins."""
    if xyz.shape[0] == 0:
        return xyz, intensity
    keys = np.floor(xyz / voxel).astype(np.int64)
    keys -= keys.min(axis=0)
    dims = keys.max(axis=0) + 1
    flat = (keys[:, 0] * dims[1] + keys[:, 1]) * dims[2] + keys[:, 2]
    uniq, inv = np.unique(flat, return_inverse=True)
    cnt = np.bincount(inv).astype(np.float64)
    out = np.empty((uniq.shape[0], 3), np.float32)
    for i in range(3):
        out[:, i] = np.bincount(inv, weights=xyz[:, i]) / cnt
    inten = (np.bincount(inv, weights=intensity) / cnt).astype(np.float32)
    return out, inten


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
        self.n_keyframes = 0

    def add_keyframe(self, result) -> None:
        """Fuse a finalized keyframe (``models.node.KeyframeResult`` or any
        object with ``.state`` and ``.denoised_depth``)."""
        xyz, inten = backproject_converged(result.state, result.denoised_depth)
        with self._lock:
            self._xyz = np.concatenate([self._xyz, xyz])
            self._intensity = np.concatenate([self._intensity, inten])
            # re-fuse incrementally so memory stays bounded by occupied
            # voxels, not by keyframe count
            self._xyz, self._intensity = voxel_downsample(
                self._xyz, self._intensity, self.voxel
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

from rpg_open_remode_tpu.io.dataset import Dataset, DatasetEntry, FramePrefetcher
from rpg_open_remode_tpu.io.checkpoint import save_state, load_state
from rpg_open_remode_tpu.io.pointcloud import (
    GlobalMap,
    backproject_converged,
    save_pointcloud_ply,
    save_pointcloud_npz,
    convergence_overlay,
    voxel_downsample,
)

__all__ = [
    "Dataset",
    "GlobalMap",
    "voxel_downsample",
    "DatasetEntry",
    "save_state",
    "load_state",
    "backproject_converged",
    "save_pointcloud_ply",
    "save_pointcloud_npz",
    "convergence_overlay",
]

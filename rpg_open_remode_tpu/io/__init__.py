from rpg_open_remode_tpu.io.dataset import Dataset, DatasetEntry, FramePrefetcher
from rpg_open_remode_tpu.io.checkpoint import save_state, load_state
from rpg_open_remode_tpu.io.pointcloud import (
    backproject_converged,
    save_pointcloud_ply,
    save_pointcloud_npz,
    convergence_overlay,
)

__all__ = [
    "Dataset",
    "DatasetEntry",
    "save_state",
    "load_state",
    "backproject_converged",
    "save_pointcloud_ply",
    "save_pointcloud_npz",
    "convergence_overlay",
]

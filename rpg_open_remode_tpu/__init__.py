"""TPU-native probabilistic monocular dense reconstruction (REMODE-class).

A brand-new JAX/XLA/Pallas framework with the capabilities of
uzh-rpg/rpg_open_remode: per-pixel recursive Bayesian depth-seed filtering over
a reference keyframe driven by NCC stereo matching along epipolar geometry,
followed by weighted TV-L1 primal-dual depthmap regularization, producing
depth maps, convergence maps and world-frame point clouds.

The compute path is functional and jittable end to end; all state lives in
immutable pytrees of ``[H, W]`` device arrays, and every step is shardable over
a ``jax.sharding.Mesh`` (keyframes x spatial tiles).
"""

import jax as _jax

# Geometry precision: TPU matmuls default to bf16 operands, which quantizes
# homographies, pose compositions and interpolated depth/disparity fields far
# beyond this framework's accuracy budget (sub-pixel epipolar matching). All
# matmuls here are tiny or bandwidth-bound, so full f32 costs nothing.
_jax.config.update("jax_default_matmul_precision", "highest")

from rpg_open_remode_tpu.config import RemodeConfig, ConvergenceState
from rpg_open_remode_tpu.models.state import SeedState, SceneParams
from rpg_open_remode_tpu.models.depthmap import Depthmap

__version__ = "0.1.0"

__all__ = [
    "RemodeConfig",
    "ConvergenceState",
    "SeedState",
    "SceneParams",
    "Depthmap",
    "__version__",
]

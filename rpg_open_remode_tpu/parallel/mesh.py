"""Device-mesh construction for the dense-mapping engine.

Axes (SURVEY.md section 7, stage 5):
  - ``kf``: concurrent reference keyframes (data parallelism; rides DCN
    across hosts — keyframes are embarrassingly parallel)
  - ``ty``, ``tx``: spatial tiling of the [H, W] seed-state tensors
    (rides ICI within a slice; halo exchange for stencils)

The reference has no analog — it is single-GPU (check_cuda_device.cu).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def _factor3(n: int) -> tuple[int, int, int]:
    """Default (kf, ty, tx) factorization of n devices: prefer spatial."""
    kf = 1
    # largest power-of-two-ish split of the remainder into ty*tx
    ty = 1
    tx = n
    t = int(np.sqrt(n))
    while t > 1:
        if n % t == 0:
            ty, tx = t, n // t
            break
        t -= 1
    return kf, ty, tx


def make_mesh(
    n_devices: int | None = None,
    kf: int | None = None,
    ty: int | None = None,
    tx: int | None = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if kf is None or ty is None or tx is None:
        dkf, dty, dtx = _factor3(n)
        kf = kf or dkf
        ty = ty or dty
        tx = tx or (n // (kf * ty))
    from rpg_open_remode_tpu.utils.devices import validate_mesh_shape

    validate_mesh_shape(n, kf, ty, tx)
    arr = np.asarray(devices).reshape(kf, ty, tx)
    return Mesh(arr, axis_names=("kf", "ty", "tx"))

"""Device discovery and validation — checkCudaDevice, TPU-native.

The reference enumerates CUDA devices, honors ``--device=N``, validates
compute capability and selects the device (src/check_cuda_device.cu:23-117).
Here the equivalents are jax backend/device enumeration, a friendly report,
and mesh-shape validation for the parallel paths.
"""

from __future__ import annotations


def check_devices(min_devices: int = 1, verbose: bool = True) -> list:
    """Validate the jax backend and return the device list
    (checkCudaDevice analog; raises if fewer than ``min_devices``)."""
    import jax

    devices = jax.devices()
    if verbose:
        backend = jax.default_backend()
        print(f"[remode] backend={backend}, {len(devices)} device(s):")
        for d in devices:
            kind = getattr(d, "device_kind", "?")
            print(f"  - id={d.id} {kind}")
    if len(devices) < min_devices:
        raise RuntimeError(
            f"need >= {min_devices} devices, found {len(devices)}"
        )
    return devices


def validate_mesh_shape(n_devices: int, kf: int, ty: int, tx: int) -> None:
    if kf * ty * tx != n_devices:
        raise ValueError(
            f"mesh kf={kf} x ty={ty} x tx={tx} != {n_devices} devices"
        )

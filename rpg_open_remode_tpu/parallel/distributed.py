"""Multi-host (multi-process) execution layer.

The reference is strictly single-GPU — ``checkCudaDevice`` selects one
device (src/check_cuda_device.cu:23-117) and nothing in it communicates
across processes. This module supplies the north-star scale-out path
(SURVEY.md section 7, stage 5; BASELINE.json config 5): concurrent
keyframes sharded across *hosts* over DCN, depthmap tiles across each
host's chips over ICI.

Pieces:
  * :func:`initialize` — ``jax.distributed.initialize`` wrapper that also
    selects the CPU collectives backend (gloo) when testing multi-process
    logic on CPU hosts (the "multi-node without a cluster" strategy,
    SURVEY.md section 4).
  * :func:`make_distributed_mesh` — a ``('kf', 'ty', 'tx')`` mesh over the
    *global* device list, laid out so the ``kf`` axis strides across
    processes (keyframes ride DCN; spatial tiles stay process-local and
    ride ICI).
  * :func:`replicate_frame` / :func:`shard_local_keyframes` — per-host
    data feeding: every process loads frames from its own storage and
    assembles global arrays with ``jax.make_array_from_process_local_data``
    (the multi-host replacement for a plain ``device_put``).
  * :func:`local_stats` — pull a ``P('kf')``-sharded stats pytree back as
    the per-process slice (only addressable shards can be fetched in a
    multi-process program).

The sharded step itself is process-count-agnostic:
``parallel.sharded.build_sharded_update`` works unchanged on a
distributed mesh because ``shard_map`` + collectives compile to the same
program per process.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_count: int | None = None,
) -> None:
    """Join (or bootstrap) the distributed runtime.

    On TPU pods the arguments are discovered from the environment and may
    all be None. On CPU (tests / local development) pass them explicitly;
    the gloo collectives backend is selected automatically so cross-process
    psum/all_gather/ppermute work without real interconnect.
    """
    # NOTE: must not call jax.default_backend() here — that initializes the
    # backend before the distributed runtime, which breaks TPU-pod setup.
    try:
        plat = jax.config.read("jax_platforms")
    except Exception:
        plat = None
    if plat and "cpu" in str(plat):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # pragma: no cover - older jax without gloo
            pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_count is not None:
        kwargs["local_device_count"] = local_device_count
    jax.distributed.initialize(**kwargs)


def make_distributed_mesh(
    kf: int | None = None, ty: int | None = None, tx: int | None = None
) -> Mesh:
    """('kf', 'ty', 'tx') mesh over all global devices, kf-major across
    processes.

    ``jax.devices()`` orders devices by process index, so reshaping
    (kf, ty, tx) with kf outermost puts whole keyframes on single
    processes whenever kf is a multiple of the process count — keyframe
    traffic (nothing but the replicated frame broadcast and the stats
    psum) crosses DCN, spatial halo/all_gather traffic stays on ICI.
    """
    devices = jax.devices()
    n = len(devices)
    n_proc = jax.process_count()
    if kf is None:
        kf = n_proc
    rest = n // kf
    assert kf * rest == n, f"kf={kf} does not divide {n} devices"
    if ty is None and tx is None:
        t = int(np.sqrt(rest))
        while t > 1 and rest % t:
            t -= 1
        ty, tx = max(t, 1), rest // max(t, 1)
    elif ty is None:
        ty = rest // tx
    elif tx is None:
        tx = rest // ty
    assert kf * ty * tx == n, f"mesh {kf}x{ty}x{tx} != {n} devices"
    arr = np.asarray(devices).reshape(kf, ty, tx)
    return Mesh(arr, axis_names=("kf", "ty", "tx"))


def replicate_frame(mesh: Mesh, frame: np.ndarray) -> jax.Array:
    """Every process feeds the (identical) current frame it loaded from its
    own input pipeline; returns the globally-replicated device array."""
    sharding = NamedSharding(mesh, P(None, None))
    return jax.make_array_from_process_local_data(sharding, np.asarray(frame))


def shard_local_keyframes(mesh: Mesh, state_local, n_kf_global: int):
    """Assemble the global ``[KF, H, W]``-batched seed state from each
    process's locally-constructed keyframes.

    ``state_local`` is a SeedState pytree whose leading axis holds ONLY
    this process's keyframes (``n_kf_global / process_count`` of them,
    in kf-axis order). Returns the globally-sharded batched state.
    """
    from rpg_open_remode_tpu.parallel.sharded import state_specs

    specs = state_specs()

    def assemble(x_local, spec):
        sharding = NamedSharding(mesh, spec)
        shape = list(x_local.shape)
        if spec and len(spec) and spec[0] == "kf":
            shape[0] = n_kf_global
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x_local), tuple(shape)
        )

    return jax.tree.map(assemble, state_local, specs)


def local_block(x: jax.Array) -> np.ndarray:
    """Assemble this process's addressable portion of a sharded array into
    one contiguous ndarray (the process-local block of the global array)."""
    shards = sorted(
        x.addressable_shards,
        key=lambda s: tuple(sl.indices(n)[0] for sl, n in zip(s.index, x.shape)),
    )
    starts = [
        min(s.index[d].indices(x.shape[d])[0] for s in shards)
        for d in range(x.ndim)
    ]
    stops = [
        max(s.index[d].indices(x.shape[d])[1] for s in shards)
        for d in range(x.ndim)
    ]
    out = np.empty(
        [b - a for a, b in zip(starts, stops)], dtype=np.dtype(x.dtype)
    )
    for s in shards:
        sel = tuple(
            slice(sl.indices(n)[0] - a, sl.indices(n)[1] - a)
            for sl, n, a in zip(s.index, x.shape, starts)
        )
        out[sel] = np.asarray(s.data)
    return out


def gather_kf_slot(x: jax.Array, slot: int) -> np.ndarray | None:
    """Assemble row ``slot`` of a kf-batched sharded array (``[KF, ...]``)
    from this process's addressable shards.

    Returns the ``x.shape[1:]``-shaped ndarray, or ``None`` when this
    process does not hold the slot's full spatial extent (another process
    owns the keyframe — with the kf-major mesh layout of
    :func:`make_distributed_mesh`, whole keyframes live on single processes
    whenever kf is a multiple of the process count). Works identically in
    single-process programs, where every shard is addressable.
    """
    if not hasattr(x, "addressable_shards"):
        return np.asarray(x)[slot]
    if getattr(x, "is_fully_replicated", False):
        return np.asarray(x)[slot]
    shape = x.shape
    out = np.empty(shape[1:], dtype=np.dtype(x.dtype))
    filled = 0
    seen = set()
    for s in x.addressable_shards:
        k0, k1, _ = s.index[0].indices(shape[0])
        if not (k0 <= slot < k1):
            continue
        key = tuple(sl.indices(n)[:2] for sl, n in zip(s.index, shape))
        if key in seen:          # replicated-axis duplicates
            continue
        seen.add(key)
        block = np.asarray(s.data)[slot - k0]
        sel = tuple(
            slice(*sl.indices(n)[:2])
            for sl, n in zip(s.index[1:], shape[1:])
        )
        out[sel] = block
        filled += block.size
    expected = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    if filled != expected:
        return None
    return out


def local_stats(stats) -> dict:
    """Per-process view of a ``P('kf')``-sharded stats pytree: concatenate
    the addressable shards along the kf axis (global fetches of sharded
    arrays are disallowed in multi-process programs)."""

    def pull(x):
        if not hasattr(x, "addressable_shards"):
            return np.asarray(x)
        # dedup: axes the spec replicates (e.g. the spatial tx axis for a
        # per-kf stat) produce several addressable shards with the same
        # global index — keep one of each
        seen = {}
        for s in x.addressable_shards:
            key = tuple(
                sl.indices(n) for sl, n in zip(s.index, x.shape)
            )
            seen.setdefault(key, s)
        shards = [seen[k] for k in sorted(seen)]
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree.map(pull, stats)

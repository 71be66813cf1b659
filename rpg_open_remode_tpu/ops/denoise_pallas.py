"""Pallas TPU kernel for the weighted TV-L1 primal-dual denoiser.

The XLA lowering of ``ops/denoise.py`` streams ~10 full images through HBM
per iteration x 200 iterations (~2.4 GB of traffic for a 640x480 depthmap).
This kernel keeps the entire primal/dual state (u, u_head, p_x, p_y, the
weight map g and the noisy input) resident in VMEM and runs *all* iterations
inside one kernel launch — HBM is touched exactly twice (load inputs, store
the result).

Semantics are identical to the functional reference implementation
(``denoise.tvl1_iteration``), which itself mirrors
``updateTVL1PrimalDualKernel`` (src/depthmap_denoiser.cu:61-118) with the
reference's cross-block race removed (SURVEY.md section 5): the dual and
primal half-steps here are full-array updates, deterministic by
construction.

VMEM budget: 7 arrays x H x W x 4 B must fit in ~16 MB; 640x480 uses ~8.6 MB.
Larger frames fall back to the XLA implementation automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpg_open_remode_tpu.config import RemodeConfig

# 7 resident [H, W] f32 arrays + temporaries headroom
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel(
    noisy_ref,
    g_ref,
    lam_ref,
    out_ref,
    u_ref,
    uh_ref,
    px_ref,
    py_ref,
    *,
    iterations: int,
    sigma_d: float,
    tau: float,
    theta: float,
    height: int,
    width: int,
):
    noisy = noisy_ref[:]
    g = g_ref[:]
    lam = lam_ref[0]
    thr = tau * lam

    u_ref[:] = noisy
    uh_ref[:] = noisy
    px_ref[:] = jnp.zeros_like(noisy)
    py_ref[:] = jnp.zeros_like(noisy)

    col = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    east_edge = col >= width - 1
    south_edge = row >= height - 1
    west_edge = col == 0
    north_edge = row == 0

    # circular rolls + edge-select: Mosaic lowers pltpu.roll to cheap
    # lane/sublane rotates, while concatenation forces full relayouts
    def shift_left(x):          # x[:, min(j+1, W-1)]
        return jnp.where(east_edge, x, pltpu.roll(x, width - 1, axis=1))

    def shift_up(x):            # x[min(i+1, H-1), :]
        return jnp.where(south_edge, x, pltpu.roll(x, height - 1, axis=0))

    def shift_right_zero(x):    # x[:, j-1], 0 at j==0
        return jnp.where(west_edge, 0.0, pltpu.roll(x, 1, axis=1))

    def shift_down_zero(x):     # x[i-1, :], 0 at i==0
        return jnp.where(north_edge, 0.0, pltpu.roll(x, 1, axis=0))

    def body(_, carry):
        u = u_ref[:]
        u_head = uh_ref[:]

        # dual ascent (depthmap_denoiser.cu:76-91)
        grad_x = shift_left(u_head) - u
        grad_y = shift_up(u_head) - u
        tp_x = g * grad_x * sigma_d + px_ref[:]
        tp_y = g * grad_y * sigma_d + py_ref[:]
        mag = jnp.sqrt(tp_x * tp_x + tp_y * tp_y)
        scale = 1.0 / jnp.maximum(1.0, mag)
        p_x = tp_x * scale
        p_y = tp_y * scale
        px_ref[:] = p_x
        py_ref[:] = p_y

        # primal descent (depthmap_denoiser.cu:93-112), zero-flux boundary
        cur_px = jnp.where(east_edge, 0.0, p_x)
        cur_py = jnp.where(south_edge, 0.0, p_y)
        div = cur_px - shift_right_zero(p_x) + cur_py - shift_down_zero(p_y)

        temp_u = u + tau * g * div
        diff = temp_u - noisy
        u_new = jnp.where(
            diff > thr, temp_u - thr, jnp.where(diff < -thr, temp_u + thr, noisy)
        )
        u_ref[:] = u_new
        uh_ref[:] = u_new + theta * (u_new - u)
        return carry

    jax.lax.fori_loop(0, iterations, body, 0)
    out_ref[:] = u_ref[:]


@functools.partial(jax.jit, static_argnames=("iterations", "cfg"))
def tvl1_pallas(
    noisy: jnp.ndarray,
    g: jnp.ndarray,
    lam: jnp.ndarray,
    iterations: int,
    cfg: RemodeConfig,
) -> jnp.ndarray:
    """All-iterations-in-VMEM TV-L1 solve. ``noisy``/``g``: [H, W] f32."""
    height, width = noisy.shape
    kernel = functools.partial(
        _kernel,
        iterations=iterations,
        sigma_d=cfg.tv_sigma,
        tau=cfg.tv_tau,
        theta=cfg.tv_theta,
        height=height,
        width=width,
    )
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((height, width), jnp.float32),
            pltpu.VMEM((height, width), jnp.float32),
            pltpu.VMEM((height, width), jnp.float32),
            pltpu.VMEM((height, width), jnp.float32),
        ],
        interpret=interpret,
    )(noisy, g, jnp.reshape(lam.astype(jnp.float32), (1,)))


def fits_vmem(height: int, width: int) -> bool:
    return 7 * height * width * 4 <= _VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# Tiled variant for frames beyond the VMEM cap (e.g. 1280x720)
# ---------------------------------------------------------------------------
#
# The TV iteration is a 1-px stencil in each half-step, so information
# propagates at most 2 rows per iteration.  Chunk the 200 iterations into
# groups of C: each row band loads a 2C-row halo of the carried state
# (u, u_head, p_x, p_y) plus noisy/g, runs C iterations entirely in VMEM,
# and stores only its interior rows — which are then exact, because every
# interior row is >= 2C rows away from any stale halo edge (overlapping
# Schwarz decomposition).  HBM is touched once per chunk instead of once
# per iteration: ~12-15x less traffic than the XLA loop at 720p.

TILE_BAND = 64


def _tiled_kernel(
    u_hbm, uh_hbm, px_hbm, py_hbm, noisy_hbm, g_hbm,   # ANY [Hp+2*halo, W]
    lam_ref,                                            # SMEM [1]
    u_out, uh_out, px_out, py_out,                      # VMEM [band, W]
    u_s, uh_s, px_s, py_s, noisy_s, g_s,                # scratch [rows, W]
    sems,
    *,
    chunk_iters: int,
    halo: int,
    band: int,
    height: int,   # true image height (south edge), <= padded Hp
    width: int,
    sigma_d: float,
    tau: float,
    theta: float,
):
    i = pl.program_id(0)
    rows = band + 2 * halo
    row0 = i * band   # in the halo-padded buffer == true row i*band - halo

    copies = [
        pltpu.make_async_copy(src.at[pl.ds(row0, rows)], dst, sems.at[j])
        for j, (src, dst) in enumerate(
            [
                (u_hbm, u_s), (uh_hbm, uh_s), (px_hbm, px_s),
                (py_hbm, py_s), (noisy_hbm, noisy_s), (g_hbm, g_s),
            ]
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    noisy = noisy_s[:]
    g = g_s[:]
    lam = lam_ref[0]
    thr = tau * lam

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    # global row index: masks must fire at the TRUE image edges, not at
    # band/buffer edges (pad rows compute garbage that never reaches a
    # real row — the edge clamps stop propagation exactly at the image
    # boundary)
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, width), 0) + row0 - halo
    )
    east_edge = col >= width - 1
    south_edge = row_g >= height - 1
    west_edge = col == 0
    north_edge = row_g == 0

    def shift_left(x):
        return jnp.where(east_edge, x, pltpu.roll(x, width - 1, axis=1))

    def shift_up(x):
        return jnp.where(south_edge, x, pltpu.roll(x, rows - 1, axis=0))

    def shift_right_zero(x):
        return jnp.where(west_edge, 0.0, pltpu.roll(x, 1, axis=1))

    def shift_down_zero(x):
        return jnp.where(north_edge, 0.0, pltpu.roll(x, 1, axis=0))

    def body(_, carry):
        u = u_s[:]
        u_head = uh_s[:]
        grad_x = shift_left(u_head) - u
        grad_y = shift_up(u_head) - u
        tp_x = g * grad_x * sigma_d + px_s[:]
        tp_y = g * grad_y * sigma_d + py_s[:]
        mag = jnp.sqrt(tp_x * tp_x + tp_y * tp_y)
        scale = 1.0 / jnp.maximum(1.0, mag)
        p_x = tp_x * scale
        p_y = tp_y * scale
        px_s[:] = p_x
        py_s[:] = p_y

        cur_px = jnp.where(east_edge, 0.0, p_x)
        cur_py = jnp.where(south_edge, 0.0, p_y)
        div = cur_px - shift_right_zero(p_x) + cur_py - shift_down_zero(p_y)
        temp_u = u + tau * g * div
        diff = temp_u - noisy
        u_new = jnp.where(
            diff > thr, temp_u - thr, jnp.where(diff < -thr, temp_u + thr, noisy)
        )
        u_s[:] = u_new
        uh_s[:] = u_new + theta * (u_new - u)
        return carry

    jax.lax.fori_loop(0, chunk_iters, body, 0)

    u_out[:] = u_s[halo : halo + band, :]
    uh_out[:] = uh_s[halo : halo + band, :]
    px_out[:] = px_s[halo : halo + band, :]
    py_out[:] = py_s[halo : halo + band, :]


def _tiled_chunk(arrs, lam, chunk_iters, halo, band, height, width, cfg,
                 interpret):
    """One chunk: zpad the carried state by `halo` rows, run `chunk_iters`
    iterations banded, return unpadded state."""
    hp = arrs[0].shape[0]
    n_bands = hp // band
    rows = band + 2 * halo

    def zpad(x):
        z = jnp.zeros((halo, x.shape[1]), x.dtype)
        return jnp.concatenate([z, x, z], axis=0)

    kernel = functools.partial(
        _tiled_kernel,
        chunk_iters=chunk_iters,
        halo=halo,
        band=band,
        height=height,
        width=width,
        sigma_d=cfg.tv_sigma,
        tau=cfg.tv_tau,
        theta=cfg.tv_theta,
    )
    out_sds = jax.ShapeDtypeStruct((hp, width), jnp.float32)
    out_spec = pl.BlockSpec((band, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[out_spec] * 4,
        out_shape=[out_sds] * 4,
        scratch_shapes=[pltpu.VMEM((rows, width), jnp.float32)] * 6
        + [pltpu.SemaphoreType.DMA((6,))],
        interpret=interpret,
    )(*[zpad(x) for x in arrs[:4]], zpad(arrs[4]), zpad(arrs[5]), lam)


@functools.partial(
    jax.jit, static_argnames=("iterations", "cfg", "chunk_iters", "band")
)
def tvl1_pallas_tiled(
    noisy: jnp.ndarray,
    g: jnp.ndarray,
    lam: jnp.ndarray,
    iterations: int,
    cfg: RemodeConfig,
    chunk_iters: int = 25,
    band: int = TILE_BAND,
) -> jnp.ndarray:
    """Banded TV-L1 solve for frames that exceed the all-in-VMEM budget."""
    height, width = noisy.shape
    hp = -(-height // band) * band
    halo = -(-(2 * chunk_iters) // 8) * 8   # sublane-aligned, >= 2C
    pad_n = hp - height
    if pad_n:
        noisy_p = jnp.pad(noisy, ((0, pad_n), (0, 0)))
        g_p = jnp.pad(g, ((0, pad_n), (0, 0)))
    else:
        noisy_p, g_p = noisy, g
    lam_v = jnp.reshape(lam.astype(jnp.float32), (1,))
    interpret = jax.default_backend() == "cpu"

    state = (noisy_p, noisy_p, jnp.zeros_like(noisy_p), jnp.zeros_like(noisy_p))
    done = 0
    while done < iterations:
        c = min(chunk_iters, iterations - done)
        state = _tiled_chunk(
            (*state, noisy_p, g_p), lam_v, c, halo, band, height, width,
            cfg, interpret,
        )
        done += c
    return state[0][:height, :]

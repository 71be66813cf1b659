"""Multi-device execution: the full engine step under ``shard_map``.

Sharding layout (SURVEY.md section 7, stage 5 / BASELINE.json config 5):
  - seed-state tensors ``[KF, H, W]`` partitioned ``P('kf', 'ty', 'tx')``:
    concurrent keyframes across the ``kf`` axis (DCN across hosts), depthmap
    tiles across ``ty x tx`` (ICI within a slice)
  - the current frame ``[H, W]`` fully replicated (one ~1.2 MB image; every
    tile's epipolar search may read anywhere in it)
  - convergence statistics reduced with ``lax.psum`` over the spatial axes
    (replacing the reference's two-stage device reduction, reduction.cu)
  - halo exchange (``lax.ppermute`` rings) only where stencils cross tile
    borders: patch-radius halos for the NCC box sums, 1-px halos per TV-L1
    denoiser iteration

A key property of the plane-sweep matcher makes this layout cheap: the warp
of the current frame depends only on pixel *bearings* and the global plane
depth — not on per-pixel seed state — so tiles never need neighbor seed
state, only a static ref-image halo per frame.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SeedState
from rpg_open_remode_tpu.ops import epipolar, reduction, seed_check, seed_update
from rpg_open_remode_tpu.ops import denoise as denoise_ops
from rpg_open_remode_tpu.parallel.halo import exchange_halo_2d
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera


# order of the per-keyframe metrics in the sharded step's stats["packed"]
# (the kf-batched sibling of models.depthmap.PACKED_STATS_KEYS; the sharded
# step has no mean_ncc — the matcher's found/ncc fields stay tile-local)
SHARDED_PACKED_KEYS = (
    "update", "converged", "border", "diverged", "no_match", "dist_from_ref",
)


def state_specs(state_batched: SeedState = None):
    """PartitionSpecs for a keyframe-batched state pytree (field-wise)."""
    from rpg_open_remode_tpu.models.state import SceneParams

    img = P("kf", "ty", "tx")       # [KF, H, W]
    kf = P("kf")                    # [KF] or [KF, 3, 4]
    return SeedState(
        ref_img=img, sum_templ=img, const_templ_denom=img,
        f_ref=P("kf", None, "ty", "tx"),   # [KF, 3, H, W]
        mu=img, sigma_sq=img, a=img, b=img, conv=img,
        match_u=img, match_v=img,
        T_world_ref=kf,
        scene=SceneParams(kf, kf, kf, kf, kf, kf),
    )


def stack_states(states: list[SeedState]) -> SeedState:
    """Batch independent keyframe states along a leading ``kf`` axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def shard_state(state_batched: SeedState, mesh) -> SeedState:
    specs = state_specs(state_batched)
    return jax.device_put(
        state_batched,
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs),
    )


@functools.lru_cache(maxsize=None)
def _dispatch_branches(cfg: RemodeConfig, p: int, height: int, width: int):
    """Matcher cond branches as STABLE cached objects with operands passed
    explicitly (same rule as ops/rect_match._branches): jax caches
    cond-branch traces by function identity, and a freshly-created closure
    whose id gets reused after GC can resurrect a stale trace with another
    call's captured constants — the "Execution supplied N buffers but
    compiled program expected M" failure."""
    from rpg_open_remode_tpu.parallel import rect_sharded

    def sweep_fn(st, curr_img, T_curr_ref, f_ext, y0x0, cam):
        ref_ext = exchange_halo_2d(st.ref_img, p)
        return epipolar.match_planesweep_tile(
            ref_ext, f_ext, st.mu, st.sigma_sq, st.sum_templ,
            st.const_templ_denom, st.scene, curr_img, T_curr_ref, cam, cfg,
        )

    def rect_fn(st, curr_img, T_curr_ref, f_ext, y0x0, cam):
        return rect_sharded.match_rectified_sharded(
            st, curr_img, T_curr_ref, cam, cfg, height, width, y0x0,
        )

    return sweep_fn, rect_fn


def build_sharded_update(mesh, cam: PinholeCamera, cfg: RemodeConfig, height: int, width: int):
    """Jitted ``(batched_state, curr_img, T_curr_world) -> (state', stats)``
    running one full engine step sharded over the mesh.

    All keyframes ingest the same current frame (the keyframe-parallel
    mapping loop); stats come back per-keyframe, psum-reduced over tiles.
    """
    n_ty, n_tx = mesh.shape["ty"], mesh.shape["tx"]
    assert height % n_ty == 0 and width % n_tx == 0, "image must tile evenly"
    tile_h, tile_w = height // n_ty, width // n_tx
    p = cfg.patch_side // 2

    def tile_step(state: SeedState, curr_img, T_curr_world):
        y0 = lax.axis_index("ty") * tile_h
        x0 = lax.axis_index("tx") * tile_w
        ys_g = y0 + jnp.arange(tile_h)
        xs_g = x0 + jnp.arange(tile_w)

        m = cfg.patch_side
        inside = (
            (xs_g[None, :] >= m)
            & (xs_g[None, :] <= width - m - 1)
            & (ys_g[:, None] >= m)
            & (ys_g[:, None] <= height - m - 1)
        )
        border = ~inside
        ys_ext = jnp.clip(jnp.arange(-p, tile_h + p) + y0, 0, height - 1)
        xs_ext = jnp.clip(jnp.arange(-p, tile_w + p) + x0, 0, width - 1)
        f_ext = epipolar.bearings_for_grid(cam, ys_ext, xs_ext)

        def per_kf(st: SeedState):
            T_curr_ref = se3.compose(T_curr_world, st.T_world_ref)
            conv1 = seed_check.classify_seeds(
                st.mu, st.sigma_sq, st.a, st.b, st.scene.epsilon, border, cfg
            )
            st = dataclasses.replace(st, conv=conv1)

            sweep_fn, rect_fn = _dispatch_branches(cfg, p, height, width)
            y0x0 = (y0.astype(jnp.float32), x0.astype(jnp.float32))
            if cfg.match_mode == "rect" and cfg.zero_baseline_fallback:
                # regime dispatch mirroring ops/rect_match.match: the tile
                # planesweep covers BOTH regimes rectification cannot serve
                # — dominantly axial motion (epipole in a footprint)
                # directly, and near-zero baseline because there every
                # hypothesis reprojects to the same rotation-predicted
                # pixel, which is exactly what the single-device
                # pure-rotation matcher evaluates.
                R = se3.rotation(T_curr_ref)
                t = se3.translation(T_curr_ref)
                C = -R.T @ t
                Bn = jnp.linalg.norm(C)
                threshold = 1e-5 * st.scene.avg_depth + 1e-9
                degenerate = Bn <= threshold
                if cfg.forward_motion_fallback:
                    m_x, m_y = 0.75 * width, 0.75 * height

                    def _inside(e):
                        return (
                            (jnp.abs(cam.fx * e[0]) < m_x * jnp.abs(e[2]))
                            & (jnp.abs(cam.fy * e[1]) < m_y * jnp.abs(e[2]))
                        )

                    degenerate |= _inside(C) | _inside(t)
                # both branches run collectives, so every device must take
                # the SAME branch: the predicate is already uniform over the
                # spatial axes (pose and T_world_ref are tile-replicated),
                # and pmax over 'kf' makes it global — otherwise diverging
                # keyframe rows deadlock the runtime's collective
                # rendezvous. One degenerate keyframe sends all keyframes
                # through the plane sweep for that frame, which is valid
                # for any motion.
                degenerate = lax.pmax(degenerate.astype(jnp.int32), "kf") > 0
                res = lax.cond(
                    degenerate, sweep_fn, rect_fn,
                    st, curr_img, T_curr_ref, f_ext, y0x0, cam,
                )
            elif cfg.match_mode == "rect":
                res = rect_fn(st, curr_img, T_curr_ref, f_ext, y0x0, cam)
            else:
                res = sweep_fn(st, curr_img, T_curr_ref, f_ext, y0x0, cam)
            active = conv1 == int(ConvergenceState.UPDATE)
            conv2 = epipolar.apply_match_to_conv(conv1, active, res.found)
            new_st = seed_update.update_seeds(
                st, conv2, res.u, res.v, se3.inv(T_curr_ref), cam, cfg
            )
            stats = reduction.convergence_stats(conv2)
            stats["dist_from_ref"] = jnp.linalg.norm(se3.translation(T_curr_ref))
            return new_st, stats

        # scan, not vmap, over the device-local keyframes: vmapping the
        # Pallas sweep batches its grid poorly (same finding as the
        # single-chip engine, models/multikeyframe.py), while the scan body
        # is exactly the single-keyframe program
        def body(carry, st):
            new_st, st_stats = per_kf(st)
            return carry, (new_st, st_stats)

        _, (new_state, stats) = lax.scan(body, 0, state)
        # Tile-local counts -> global per-keyframe counts over ICI
        stats = {
            k: (lax.psum(v, ("ty", "tx")) if k != "dist_from_ref" else v)
            for k, v in stats.items()
        }
        # One REPLICATED [KF, 6] metrics matrix for the lifecycle loop
        # (parallel/node.py): every device — and therefore every process of
        # a multi-host mesh — gets the identical values, so the keyframe
        # switch policy stays SPMD-consistent (every process must issue the
        # same reseed/denoise programs). Scatter-into-zeros + psum rather
        # than all_gather: psum is the collective whose output the vma
        # checker tracks as unvarying over the reduced axis.
        packed = jnp.stack(
            [stats[k].astype(jnp.float32) for k in SHARDED_PACKED_KEYS],
            axis=-1,
        )                                         # [KF_local, 6]
        kf_local = packed.shape[0]
        n_kf_global = kf_local * mesh.shape["kf"]
        full = jnp.zeros((n_kf_global, packed.shape[1]), jnp.float32)
        full = lax.dynamic_update_slice(
            full, packed, (lax.axis_index("kf") * kf_local, 0)
        )
        stats["packed"] = lax.psum(full, "kf")
        return new_state, stats

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state_batched, curr_img, T_curr_world):
        # uint8 camera frames convert in-trace (dtype specializes the jit),
        # so feeding raw frames costs one dispatch, not two — each extra
        # dispatch pays real latency through this backend
        from rpg_open_remode_tpu.models.depthmap import _prep_traced

        curr_img = _prep_traced(curr_img)
        in_specs = (state_specs(state_batched), P(None, None), P(None, None))
        out_specs = (
            state_specs(state_batched),
            {
                "update": P("kf"), "converged": P("kf"), "border": P("kf"),
                "diverged": P("kf"), "no_match": P("kf"), "dist_from_ref": P("kf"),
                "packed": P(None, None),
            },
        )
        # check_vma only off for the CPU/interpret parity path: the Pallas
        # interpreter mixes vma-carrying refs with unvarying indices inside
        # its internal dynamic_slices, which strict vma checking rejects.
        # On real TPU the checking stays on so sharding bugs in
        # classify/update/stats aren't masked.
        interpret = (
            jax.default_backend() == "cpu"
            and cfg.use_pallas
            and cfg.pallas_interpret
        )
        f = jax.shard_map(
            tile_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=not interpret,
        )
        return f(state_batched, curr_img, T_curr_world)

    return step


def build_sharded_denoise(
    mesh, cfg: RemodeConfig, height: int, width: int, iterations: int = 200
):
    """Jitted batched+sharded TV-L1 denoise: 1-px halo exchange per iteration
    (the ring-attention-shaped collective of this framework)."""
    n_ty, n_tx = mesh.shape["ty"], mesh.shape["tx"]
    tile_h, tile_w = height // n_ty, width // n_tx
    sigma_d = cfg.tv_sigma
    tau = cfg.tv_tau
    theta = cfg.tv_theta

    def tile_denoise(state: SeedState, lam):
        y0 = lax.axis_index("ty") * tile_h
        x0 = lax.axis_index("tx") * tile_w
        col_g = x0 + jnp.arange(tile_w)[None, :]
        row_g = y0 + jnp.arange(tile_h)[:, None]

        def per_kf(st: SeedState):
            large = st.scene.depth_range**2 * cfg.large_sigma_sq_factor
            g = denoise_ops.compute_weights(st.a, st.b, st.sigma_sq, large)
            noisy = st.mu

            def body(_, carry):
                u, u_head, p_x, p_y = carry
                uh = exchange_halo_2d(u_head, 1)
                grad_x = uh[1:-1, 2:] - u
                grad_y = uh[2:, 1:-1] - u
                tp_x = g * grad_x * sigma_d + p_x
                tp_y = g * grad_y * sigma_d + p_y
                mag = jnp.sqrt(tp_x * tp_x + tp_y * tp_y)
                scale = 1.0 / jnp.maximum(1.0, mag)
                p_x = tp_x * scale
                p_y = tp_y * scale

                pxe = exchange_halo_2d(p_x, 1)
                pye = exchange_halo_2d(p_y, 1)
                cur_px = jnp.where(col_g >= width - 1, 0.0, p_x)
                cur_py = jnp.where(row_g >= height - 1, 0.0, p_y)
                w_px = jnp.where(col_g == 0, 0.0, pxe[1:-1, :-2])
                n_py = jnp.where(row_g == 0, 0.0, pye[:-2, 1:-1])
                div = cur_px - w_px + cur_py - n_py

                temp_u = u + tau * g * div
                diff = temp_u - noisy
                thr = tau * lam
                u_new = jnp.where(
                    diff > thr, temp_u - thr,
                    jnp.where(diff < -thr, temp_u + thr, noisy),
                )
                u_head = u_new + theta * (u_new - u)
                return u_new, u_head, p_x, p_y

            u, _, _, _ = lax.fori_loop(
                0, iterations, body, (noisy, noisy, jnp.zeros_like(noisy), jnp.zeros_like(noisy))
            )
            return u

        return jax.vmap(per_kf)(state)

    @jax.jit
    def run(state_batched, lam):
        f = jax.shard_map(
            tile_denoise,
            mesh=mesh,
            in_specs=(state_specs(state_batched), P()),
            out_specs=P("kf", "ty", "tx"),
        )
        return f(state_batched, jnp.asarray(lam, jnp.float32))

    return run


def _propagated_priors(state, sel, on, scene, T_world_ref, cam, cfg,
                       flat, tile, spatial_axes=("ty", "tx")):
    """Per-local-slot seed priors ``[KF_local, th, tw]`` for a propagating
    reseed (cfg.propagate_depth). The selected slot's old state is picked
    with a one-hot weighted sum over the local kf axis (no lax.cond: cond
    branches holding collectives/Pallas warps are a vma hazard under
    shard_map, and at most one local slot is selected anyway), gathered to
    the full grid over the spatial axes, propagated once per device
    (ops/propagate.py), and tiled back. Devices whose kf row is not
    selected propagate a zero state — every intermediate NaN/degeneracy
    lands in the propagation's validity mask, and the caller's ``on``
    select discards the result entirely."""
    import types

    from rpg_open_remode_tpu.ops import propagate
    from rpg_open_remode_tpu.parallel.rect_sharded import _gather_full

    mu0, sig0, a0, b0 = flat

    def pick_img(x):                        # [KF_local, th, tw] -> [th, tw]
        return jnp.einsum("k,khw->hw", sel, x)

    old = types.SimpleNamespace(
        mu=_gather_full(pick_img(state.mu), spatial_axes),
        sigma_sq=_gather_full(pick_img(state.sigma_sq), spatial_axes),
        a=_gather_full(pick_img(state.a), spatial_axes),
        b=_gather_full(pick_img(state.b), spatial_axes),
        conv=_gather_full(
            pick_img(state.conv.astype(jnp.float32)), spatial_axes
        ).astype(jnp.int32),
        T_world_ref=jnp.einsum("k,kij->ij", sel, state.T_world_ref),
        scene=jax.tree.map(lambda x: jnp.dot(sel, x), state.scene),
    )
    mu_p, sig_p, a_p, b_p, valid = propagate.propagate_depth(
        old, se3.inv(T_world_ref), scene, cam, cfg
    )
    vt = tile(valid.astype(jnp.float32)) > 0.5
    prior = (
        jnp.where(vt, tile(mu_p), mu0),
        jnp.where(vt, tile(sig_p), sig0),
        jnp.where(vt, tile(a_p), a0),
        jnp.where(vt, tile(b_p), b0),
    )
    kf_local = state.mu.shape[0]
    # the same prior tile applies to whichever local slot is selected
    # (at most one; `on` masks the rest back to the old state upstream)
    return tuple(
        jnp.broadcast_to(p[None], (kf_local,) + p.shape) for p in prior
    )


def build_sharded_reseed(mesh, cam: PinholeCamera, cfg: RemodeConfig,
                         height: int, width: int):
    """Jitted ``(batched_state, slot_onehot, img, T_world_ref, scene) ->
    batched_state'``: re-seed ONE keyframe slot of the sharded batch with a
    new reference frame, entirely on-device (the sharded sibling of
    ``BatchedDepthmap.seed_keyframe`` / seedInitKernel, seed_init.cu:27-61).

    ``slot_onehot`` is a ``[KF]`` 0/1 float vector sharded ``P('kf')``
    selecting the slot; ``img`` is the replicated new reference frame;
    ``scene`` a replicated :class:`SceneParams`. The 5x5 template box sums
    are computed on the replicated full image per device and the tile
    sliced out — reseeds are rare (every ~15-50 frames), redundancy is
    cheaper than a halo exchange here.

    NOT donated: the previous batch stays valid, so a finalizing keyframe's
    snapshot (its addressable shards) can be fetched asynchronously after
    the reseed is dispatched (parallel/node.py relies on this).

    With ``cfg.propagate_depth`` the selected slot warm-starts from its own
    outgoing posterior (ops/propagate.py): each local slot gathers its full
    old grid over the spatial axes (the propagation's homography warps are
    global, like the matcher's), runs the propagation replicated per
    spatial shard, and slices its own tile of the prior. Guarded by a
    per-slot ``lax.cond`` so non-selected slots pay nothing; reseeds happen
    once per keyframe switch, so the replicated compute is cheap.
    """
    from rpg_open_remode_tpu.models.state import SceneParams
    from rpg_open_remode_tpu.ops import seed_init

    n_ty, n_tx = mesh.shape["ty"], mesh.shape["tx"]
    assert height % n_ty == 0 and width % n_tx == 0, "image must tile evenly"
    tile_h, tile_w = height // n_ty, width // n_tx

    def tile_reseed(state: SeedState, sel, img, T_world_ref, scene):
        y0 = lax.axis_index("ty") * tile_h
        x0 = lax.axis_index("tx") * tile_w
        sum_t_full, denom_full = seed_init.template_stats(img, cfg)

        def tile(x):
            return lax.dynamic_slice(x, (y0, x0), (tile_h, tile_w))

        ref_t = tile(img)
        sum_t = tile(sum_t_full)
        den_t = tile(denom_full)
        shape = (tile_h, tile_w)
        mu0 = jnp.broadcast_to(scene.avg_depth, shape)
        sig0 = jnp.broadcast_to(scene.sigma_sq_max, shape)
        a0 = jnp.full(shape, cfg.a_init, jnp.float32)
        b0 = jnp.full(shape, cfg.b_init, jnp.float32)
        conv0 = jnp.full(shape, int(ConvergenceState.UPDATE), jnp.int32)
        zero = jnp.zeros(shape, jnp.float32)

        on = sel > 0.5                       # [KF_local] bool

        if cfg.propagate_depth:
            mu0, sig0, a0, b0 = _propagated_priors(
                state, sel, on, scene, T_world_ref, cam, cfg,
                (mu0, sig0, a0, b0), tile,
            )

            def sel_img4(old, new_b):
                return jnp.where(on[:, None, None], new_b, old)
        else:
            sel_img4 = None

        def sel_img(old, new):
            return jnp.where(on[:, None, None], new[None], old)

        def sel_vec(old, new):
            return jnp.where(on, new, old)

        if cfg.propagate_depth:
            mu_new = sel_img4(state.mu, mu0)
            sig_new = sel_img4(state.sigma_sq, sig0)
            a_new = sel_img4(state.a, a0)
            b_new = sel_img4(state.b, b0)
        else:
            mu_new = sel_img(state.mu, mu0)
            sig_new = sel_img(state.sigma_sq, sig0)
            a_new = sel_img(state.a, a0)
            b_new = sel_img(state.b, b0)
        return SeedState(
            ref_img=sel_img(state.ref_img, ref_t),
            sum_templ=sel_img(state.sum_templ, sum_t),
            const_templ_denom=sel_img(state.const_templ_denom, den_t),
            f_ref=state.f_ref,   # bearings depend only on the camera
            mu=mu_new,
            sigma_sq=sig_new,
            a=a_new,
            b=b_new,
            conv=sel_img(state.conv, conv0),
            match_u=sel_img(state.match_u, zero),
            match_v=sel_img(state.match_v, zero),
            T_world_ref=jnp.where(
                on[:, None, None], T_world_ref[None], state.T_world_ref
            ),
            scene=SceneParams(
                min_depth=sel_vec(state.scene.min_depth, scene.min_depth),
                max_depth=sel_vec(state.scene.max_depth, scene.max_depth),
                avg_depth=sel_vec(state.scene.avg_depth, scene.avg_depth),
                depth_range=sel_vec(state.scene.depth_range, scene.depth_range),
                sigma_sq_max=sel_vec(state.scene.sigma_sq_max, scene.sigma_sq_max),
                epsilon=sel_vec(state.scene.epsilon, scene.epsilon),
            ),
        )

    @jax.jit
    def reseed(state_batched, slot_onehot, img, T_world_ref, scene):
        from rpg_open_remode_tpu.models.depthmap import _prep_traced

        img = _prep_traced(img)
        scene_specs = SceneParams(P(), P(), P(), P(), P(), P())
        f = jax.shard_map(
            tile_reseed, mesh=mesh,
            in_specs=(state_specs(state_batched), P("kf"), P(None, None),
                      P(None, None), scene_specs),
            out_specs=state_specs(state_batched),
        )
        return f(state_batched, slot_onehot, img, T_world_ref, scene)

    return reseed

"""Multi-device tests on the 8-virtual-CPU-device mesh: halo exchange,
sharded update step and sharded denoiser must match single-device results.

This is the piece the reference cannot teach (SURVEY.md section 4): the
single-device functional core is the oracle for the distributed path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
import pytest

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.ops import seed_init
from rpg_open_remode_tpu.parallel import (
    build_sharded_denoise,
    build_sharded_update,
    exchange_halo_2d,
    make_mesh,
    shard_state,
    stack_states,
)
from rpg_open_remode_tpu.utils.camera import PinholeCamera

CAM = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
H, W = 120, 160


def require_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def make_states_and_frames():
    from rpg_open_remode_tpu.utils import synthetic

    frames = synthetic.generate(n_frames=8, width=W, height=H, cam=CAM, seed=5)
    # The spatially-tiled shard_map path runs the homography plane sweep
    # (match_planesweep_tile); pin the single-device oracle to the same
    # matcher so they are comparable.
    cfg = RemodeConfig(num_planes=48, match_mode="sweep")
    cam = PinholeCamera.create(**CAM)
    states = []
    for ref_idx in (0, 2):  # two concurrent keyframes
        f = frames[ref_idx]
        d = f.depth[np.isfinite(f.depth)]
        scene = SceneParams.create(d.min(), d.max(), cfg)
        st = seed_init.init_seeds(
            empty_state(H, W, cam), jnp.asarray(f.image),
            jnp.asarray(f.T_world_curr), scene, cfg,
        )
        states.append(st)
    return states, frames, cfg, cam


class TestHalo:
    def test_box_filter_with_halo_matches_global(self):
        require_devices(4)
        mesh = make_mesh(4, kf=1, ty=2, tx=2)
        rng = np.random.default_rng(0)
        x = rng.random((16, 24)).astype(np.float32)

        def tile_fn(xt):
            ext = exchange_halo_2d(xt, 2)
            s = lax.reduce_window(ext, 0.0, lax.add, (1, 5), (1, 1), "valid")
            return lax.reduce_window(s, 0.0, lax.add, (5, 1), (1, 1), "valid")

        got = jax.jit(
            jax.shard_map(
                tile_fn, mesh=mesh, in_specs=P("ty", "tx"), out_specs=P("ty", "tx")
            )
        )(jnp.asarray(x))
        from rpg_open_remode_tpu.utils.interp import box_sum

        want = box_sum(jnp.asarray(x), 5, -2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


class TestShardedUpdate:
    def test_matches_single_device(self):
        require_devices(8)
        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        states, frames, cfg, cam = make_states_and_frames()

        # single-device oracle: run each keyframe separately
        curr = frames[5]
        T_curr_world = np.asarray(
            np.linalg.inv(np.concatenate([curr.T_world_curr, [[0, 0, 0, 1]]]))[:3],
            np.float32,
        )
        want = []
        for st in states:
            st1, stats1 = dm.update_step(
                st, jnp.asarray(curr.image), jnp.asarray(T_curr_world), cam, cfg
            )
            want.append((st1, stats1))

        batched = shard_state(stack_states(states), mesh)
        step = build_sharded_update(mesh, cam, cfg, H, W)
        got_state, got_stats = step(
            batched, jnp.asarray(curr.image), jnp.asarray(T_curr_world)
        )

        for k in range(2):
            np.testing.assert_allclose(
                np.asarray(got_state.mu[k]), np.asarray(want[k][0].mu),
                rtol=1e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(got_state.sigma_sq[k]), np.asarray(want[k][0].sigma_sq),
                rtol=1e-3, atol=1e-6,
            )
            conv_match = (
                np.asarray(got_state.conv[k]) == np.asarray(want[k][0].conv)
            ).mean()
            assert conv_match > 0.999, f"conv mismatch {1-conv_match:.2%}"
            assert int(got_stats["converged"][k]) == int(want[k][1]["converged"])
            # counts within a hair (knife-edge float disagreements allowed)
            for key in ["update", "no_match", "border"]:
                assert abs(int(got_stats[key][k]) - int(want[k][1][key])) <= 5


class TestShardedDenoise:
    def test_matches_single_device(self):
        require_devices(8)
        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        states, frames, cfg, cam = make_states_and_frames()
        # give the states non-trivial mu via one update
        curr = frames[4]
        T_curr_world = np.asarray(
            np.linalg.inv(np.concatenate([curr.T_world_curr, [[0, 0, 0, 1]]]))[:3],
            np.float32,
        )
        states = [
            dm.update_step(st, jnp.asarray(curr.image), jnp.asarray(T_curr_world), cam, cfg)[0]
            for st in states
        ]

        want = [
            np.asarray(dm.denoise_depthmap(st, cfg, lam=0.5, iterations=25))
            for st in states
        ]
        batched = shard_state(stack_states(states), mesh)
        run = build_sharded_denoise(mesh, cfg, H, W, iterations=25)
        got = np.asarray(run(batched, 0.5))
        for k in range(2):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5)


class TestShardedRectMatcher:
    def test_rect_matches_single_device(self):
        """The gather-compute-gather sharded rectified matcher must agree
        with the single-device rect path (same math, banded execution)."""
        require_devices(8)
        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        from rpg_open_remode_tpu.utils import synthetic
        from rpg_open_remode_tpu.ops import seed_init
        from rpg_open_remode_tpu.models.state import SceneParams

        frames = synthetic.generate(n_frames=8, width=W, height=H, cam=CAM, seed=5)
        cfg = RemodeConfig(num_planes=64, match_mode="rect")
        cam = PinholeCamera.create(**CAM)
        states = []
        for ref_idx in (0, 2):
            f = frames[ref_idx]
            d = f.depth[np.isfinite(f.depth)]
            scene = SceneParams.create(d.min(), d.max(), cfg)
            states.append(
                seed_init.init_seeds(
                    empty_state(H, W, cam), jnp.asarray(f.image),
                    jnp.asarray(f.T_world_curr), scene, cfg,
                )
            )

        curr = frames[5]
        T_curr_world = np.asarray(
            np.linalg.inv(np.concatenate([curr.T_world_curr, [[0, 0, 0, 1]]]))[:3],
            np.float32,
        )
        want = [
            dm.update_step(st, jnp.asarray(curr.image),
                           jnp.asarray(T_curr_world), cam, cfg)
            for st in states
        ]

        batched = shard_state(stack_states(states), mesh)
        step = build_sharded_update(mesh, cam, cfg, H, W)
        got_state, got_stats = step(
            batched, jnp.asarray(curr.image), jnp.asarray(T_curr_world)
        )
        for k in range(2):
            conv_match = (
                np.asarray(got_state.conv[k]) == np.asarray(want[k][0].conv)
            ).mean()
            assert conv_match > 0.995, f"conv mismatch {1-conv_match:.2%}"
            # depth posteriors agree wherever both paths updated the seed
            upd = (np.asarray(got_state.conv[k]) == 0) & (np.asarray(want[k][0].conv) == 0)
            if upd.any():
                np.testing.assert_allclose(
                    np.asarray(got_state.mu[k])[upd],
                    np.asarray(want[k][0].mu)[upd],
                    rtol=5e-3, atol=1e-3,
                )


class TestShardedDegenerateMotion:
    """The sharded rect path's regime dispatch (parallel/sharded.py): motion
    regimes rectification cannot serve must fall back to the tile plane
    sweep instead of producing NaNs — mirroring ops/rect_match.match."""

    def _setup(self):
        require_devices(8)
        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        from rpg_open_remode_tpu.utils import synthetic

        frames = synthetic.generate(n_frames=8, width=W, height=H, cam=CAM,
                                    seed=5)
        cfg = RemodeConfig(num_planes=48, match_mode="rect")
        cam = PinholeCamera.create(**CAM)
        states = []
        for ref_idx in (0, 2):
            f = frames[ref_idx]
            d = f.depth[np.isfinite(f.depth)]
            scene = SceneParams.create(d.min(), d.max(), cfg)
            states.append(
                seed_init.init_seeds(
                    empty_state(H, W, cam), jnp.asarray(f.image),
                    jnp.asarray(f.T_world_curr), scene, cfg,
                )
            )
        return mesh, frames, cfg, cam, states

    def test_zero_baseline_is_finite(self):
        mesh, frames, cfg, cam, states = self._setup()
        # re-observe keyframe 0's own frame: identity motion, zero baseline
        f = frames[0]
        T_curr_world = np.asarray(
            np.linalg.inv(np.concatenate([f.T_world_curr, [[0, 0, 0, 1]]]))[:3],
            np.float32,
        )
        batched = shard_state(stack_states(states), mesh)
        step = build_sharded_update(mesh, cam, cfg, H, W)
        got_state, got_stats = step(
            batched, jnp.asarray(f.image), jnp.asarray(T_curr_world)
        )
        assert np.isfinite(np.asarray(got_state.mu)).all()
        assert np.isfinite(np.asarray(got_state.sigma_sq)).all()
        legal = set(int(s) for s in ConvergenceState)
        assert set(np.unique(np.asarray(got_state.conv))) <= legal

    def test_forward_motion_matches_single_device(self):
        """Dominantly axial motion routes both the single-device and the
        sharded path to the plane sweep; results must agree."""
        mesh, frames, cfg, cam, states = self._setup()
        # dolly forward from keyframe 0's pose: epipole at the image center
        T_wc = np.concatenate([frames[0].T_world_curr, [[0, 0, 0, 1]]])
        step_fwd = np.eye(4, dtype=np.float32)
        step_fwd[2, 3] = 0.08      # +z in the camera frame
        T_curr_world = np.asarray(
            np.linalg.inv(T_wc @ step_fwd)[:3], np.float32
        )
        want = [
            dm.update_step(st, jnp.asarray(frames[1].image),
                           jnp.asarray(T_curr_world), cam, cfg)
            for st in states
        ]
        batched = shard_state(stack_states(states), mesh)
        step = build_sharded_update(mesh, cam, cfg, H, W)
        got_state, _ = step(
            batched, jnp.asarray(frames[1].image), jnp.asarray(T_curr_world)
        )
        for k in range(2):
            assert np.isfinite(np.asarray(got_state.mu[k])).all()
            conv_match = (
                np.asarray(got_state.conv[k]) == np.asarray(want[k][0].conv)
            ).mean()
            assert conv_match > 0.99, f"conv mismatch {1-conv_match:.2%}"
            upd = (np.asarray(got_state.conv[k]) == 0) & (
                np.asarray(want[k][0].conv) == 0
            )
            if upd.any():
                np.testing.assert_allclose(
                    np.asarray(got_state.mu[k])[upd],
                    np.asarray(want[k][0].mu)[upd],
                    rtol=5e-3, atol=1e-3,
                )


class TestShardedPallasSweep:
    @pytest.mark.parametrize("patch_side", [5, 9])
    def test_sharded_pallas_sweep_matches_xla(self, patch_side):
        """The Pallas disparity sweep running per-device under shard_map
        (interpret mode on the virtual mesh) must agree with the sharded
        XLA sweep. Mesh kf=2 x 1x1 spatial so the per-device rect band is
        64-row divisible (the Pallas eligibility condition; at 640x480 with
        2x2 spatial tiles the real bands are 128+64 rows and qualify).
        patch_side=9 pins the generalized box sums (the focal-scaled HD
        default) through the sharded gate as well."""
        require_devices(2)
        mesh = make_mesh(2, kf=2, ty=1, tx=1)
        from rpg_open_remode_tpu.utils import synthetic
        from rpg_open_remode_tpu.ops import seed_init
        from rpg_open_remode_tpu.models.state import SceneParams

        frames = synthetic.generate(n_frames=8, width=W, height=H, cam=CAM, seed=5)
        cam = PinholeCamera.create(**CAM)
        states = []
        base_cfg = RemodeConfig(num_planes=64, match_mode="rect",
                                patch_side=patch_side)
        for ref_idx in (0, 2):
            f = frames[ref_idx]
            d = f.depth[np.isfinite(f.depth)]
            scene = SceneParams.create(d.min(), d.max(), base_cfg)
            states.append(
                seed_init.init_seeds(
                    empty_state(H, W, cam), jnp.asarray(f.image),
                    jnp.asarray(f.T_world_curr), scene, base_cfg,
                )
            )
        curr = frames[5]
        T_curr_world = np.asarray(
            np.linalg.inv(np.concatenate([curr.T_world_curr, [[0, 0, 0, 1]]]))[:3],
            np.float32,
        )
        outs = {}
        for use in (True, False):
            cfg = dataclasses.replace(base_cfg, use_pallas=use,
                                      pallas_interpret=use)
            batched = shard_state(stack_states(states), mesh)
            step = build_sharded_update(mesh, cam, cfg, H, W)
            st, _ = step(batched, jnp.asarray(curr.image),
                         jnp.asarray(T_curr_world))
            outs[use] = st
        a, b = outs[True], outs[False]
        for k in range(2):
            match = (np.asarray(a.conv[k]) == np.asarray(b.conv[k])).mean()
            assert match > 0.995, match
            upd = (np.asarray(a.conv[k]) == 0) & (np.asarray(b.conv[k]) == 0)
            if upd.any():
                np.testing.assert_allclose(
                    np.asarray(a.mu[k])[upd], np.asarray(b.mu[k])[upd],
                    rtol=5e-3, atol=1e-3,
                )

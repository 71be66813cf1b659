"""Sharded keyframe-lifecycle tests (parallel/node.py + the on-device
reseed, parallel/sharded.build_sharded_reseed) on the 8-virtual-CPU mesh.

The single-chip engines are the oracles (SURVEY.md section 4): the
sharded reseed must match ``seed_init.init_seeds`` exactly, and the full
sharded lifecycle must reproduce the single-chip ``MultiKeyframeNode``
ring's keyframe schedule and results.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.ops import seed_init
from rpg_open_remode_tpu.parallel import (
    SHARDED_PACKED_KEYS,
    ShardedDepthmapNode,
    build_sharded_reseed,
    build_sharded_update,
    gather_kf_slot,
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


def _Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)


def _two_keyframes(cfg, cam, frames):
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
    return states


class TestShardedReseed:
    def test_matches_init_seeds_oracle(self):
        """Reseeding slot 1 on-device must equal a fresh init_seeds for
        slot 1 and leave slot 0 bit-identical."""
        require_devices(8)
        from rpg_open_remode_tpu.utils import synthetic

        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        cfg = RemodeConfig(num_planes=48)
        cam = PinholeCamera.create(**CAM)
        frames = synthetic.generate(n_frames=6, width=W, height=H, cam=CAM,
                                    seed=5)
        states = _two_keyframes(cfg, cam, frames)
        batched = shard_state(stack_states(states), mesh)

        new_img = frames[4]
        d = new_img.depth[np.isfinite(new_img.depth)]
        scene = SceneParams.create(float(d.min()), float(d.max()), cfg)
        T_world_ref = jnp.asarray(new_img.T_world_curr)

        reseed = build_sharded_reseed(mesh, cam, cfg, H, W)
        onehot = jax.device_put(
            np.array([0.0, 1.0], np.float32),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("kf")),
        )
        got = reseed(batched, onehot, jnp.asarray(new_img.image),
                     T_world_ref, scene)

        want1 = seed_init.init_seeds(
            empty_state(H, W, cam), jnp.asarray(new_img.image),
            T_world_ref, scene, cfg,
        )
        for name in ("ref_img", "sum_templ", "const_templ_denom", "mu",
                     "sigma_sq", "a", "b", "conv", "match_u", "match_v",
                     "T_world_ref"):
            # box sums compile differently under shard_map (reassociation);
            # allow float-epsilon-level drift
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)[1]),
                np.asarray(getattr(want1, name)),
                rtol=1e-4, atol=1e-4, err_msg=f"slot1 {name}",
            )
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name)[0]),
                np.asarray(getattr(states[0], name)),
                err_msg=f"slot0 {name} must be untouched",
            )
        np.testing.assert_allclose(
            np.asarray(got.scene.avg_depth[1]), np.asarray(scene.avg_depth)
        )
        np.testing.assert_array_equal(
            np.asarray(got.scene.avg_depth[0]),
            np.asarray(states[0].scene.avg_depth),
        )


class TestShardedPropagatedReseed:
    def test_matches_single_device_propagated_oracle(self):
        """cfg.propagate_depth reseed on the mesh must equal the
        single-device propagated init (propagate_depth + init_seeds on the
        gathered full grid), and leave the other slot untouched."""
        require_devices(8)
        import dataclasses

        from rpg_open_remode_tpu.ops import propagate
        from rpg_open_remode_tpu.utils import se3, synthetic

        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        cfg = RemodeConfig(num_planes=48, propagate_depth=True)
        cam = PinholeCamera.create(**CAM)
        frames = synthetic.generate(n_frames=8, width=W, height=H, cam=CAM,
                                    seed=5)
        states = _two_keyframes(cfg, cam, frames)
        # give slot 1 a convergent-looking posterior worth propagating
        rng = np.random.default_rng(7)
        mu1 = np.clip(
            1.5 + 0.3 * np.sin(np.linspace(0, 4, H))[:, None]
            + 0.02 * rng.standard_normal((H, W)), 1.1, 2.4
        ).astype(np.float32)
        states[1] = dataclasses.replace(
            states[1],
            mu=jnp.asarray(mu1),
            sigma_sq=jnp.full((H, W), 1e-4, jnp.float32),
            a=jnp.full((H, W), 40.0, jnp.float32),
            b=jnp.full((H, W), 5.0, jnp.float32),
        )
        batched = shard_state(stack_states(states), mesh)

        new_img = frames[4]
        d = new_img.depth[np.isfinite(new_img.depth)]
        scene = SceneParams.create(float(d.min()), float(d.max()), cfg)
        T_world_ref = jnp.asarray(new_img.T_world_curr)

        reseed = build_sharded_reseed(mesh, cam, cfg, H, W)
        onehot = jax.device_put(
            np.array([0.0, 1.0], np.float32),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("kf")),
        )
        got = reseed(batched, onehot, jnp.asarray(new_img.image),
                     T_world_ref, scene)

        prior = propagate.propagate_depth(
            states[1], se3.inv(T_world_ref), scene, cam, cfg
        )
        assert float(prior[4].mean()) > 0.1, \
            "fixture produced no propagated pixels — test is vacuous"
        want1 = seed_init.init_seeds(
            states[1], jnp.asarray(new_img.image), T_world_ref, scene, cfg,
            prior=prior,
        )
        for name in ("mu", "sigma_sq", "a", "b", "ref_img"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)[1]),
                np.asarray(getattr(want1, name)),
                rtol=2e-4, atol=2e-4, err_msg=f"slot1 {name}",
            )
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name)[0]),
                np.asarray(getattr(states[0], name)),
                err_msg=f"slot0 {name} must be untouched",
            )


class TestGatherKfSlot:
    def test_assembles_sharded_rows(self):
        require_devices(8)
        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = np.arange(2 * H * W, dtype=np.float32).reshape(2, H, W)
        xs = jax.device_put(x, NamedSharding(mesh, P("kf", "ty", "tx")))
        for k in range(2):
            np.testing.assert_array_equal(gather_kf_slot(xs, k), x[k])
        # per-kf vector (replicated over the spatial axes)
        v = np.array([3.5, 7.25], np.float32)
        vs = jax.device_put(v, NamedSharding(mesh, P("kf")))
        assert float(gather_kf_slot(vs, 1)) == 7.25


class TestPackedStats:
    def test_packed_is_replicated_and_consistent(self):
        """stats['packed'][k] must equal the per-key P('kf') stats and be
        fully replicated (the SPMD-consistent policy input)."""
        require_devices(8)
        from rpg_open_remode_tpu.utils import synthetic

        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        cfg = RemodeConfig(num_planes=48, match_mode="sweep")
        cam = PinholeCamera.create(**CAM)
        frames = synthetic.generate(n_frames=6, width=W, height=H, cam=CAM,
                                    seed=5)
        states = _two_keyframes(cfg, cam, frames)
        batched = shard_state(stack_states(states), mesh)
        step = build_sharded_update(mesh, cam, cfg, H, W)
        _, stats = step(batched, jnp.asarray(frames[5].image),
                        jnp.asarray(_Tcw(frames[5])))
        packed = np.asarray(stats["packed"])
        assert packed.shape == (2, len(SHARDED_PACKED_KEYS))
        assert stats["packed"].sharding.is_fully_replicated
        for j, key in enumerate(SHARDED_PACKED_KEYS):
            np.testing.assert_allclose(
                packed[:, j], np.asarray(stats[key], np.float32), rtol=1e-6
            )


class TestShardedLifecycle:
    @pytest.mark.parametrize("n_kf", [None, 4])
    def test_matches_single_chip_ring(self, n_kf):
        """The full sharded lifecycle (policy + stagger + reseed +
        finalize) must reproduce the single-chip MultiKeyframeNode ring:
        same keyframe schedule, matching convergence and denoised depth.
        n_kf=4 on the kf=2 mesh pins the MULTIPLE-local-slot path (the
        sharded step scans device-local keyframes; gather/reseed/export
        must address slots beyond the mesh axis)."""
        require_devices(8)
        from rpg_open_remode_tpu.models.multikeyframe import (
            BatchedDepthmap, MultiKeyframeNode,
        )
        from rpg_open_remode_tpu.utils import synthetic

        mesh = make_mesh(8, kf=2, ty=2, tx=2)
        # pin both paths to the homography plane sweep (the matcher the
        # spatial tiling runs) and a short denoise for test time
        cfg = RemodeConfig(num_planes=48, match_mode="sweep",
                           zero_baseline_fallback=False, denoise_iters=25)
        frames = synthetic.generate(n_frames=40, width=W, height=H, cam=CAM,
                                    seed=5)

        def drive(node):
            for fr in frames:
                d = fr.depth[np.isfinite(fr.depth)]
                node.process_frame(fr.image, _Tcw(fr), float(d.min()),
                                   float(d.max()))
            node.close()
            return node.keyframes

        ring = n_kf or 2
        sharded = drive(ShardedDepthmapNode(
            mesh, W, H, CAM["fx"], CAM["cx"], CAM["fy"], CAM["cy"],
            n_keyframes=n_kf, cfg=cfg, policy_stride=3, stagger=8,
        ))
        single = drive(MultiKeyframeNode(
            BatchedDepthmap(ring, W, H, CAM["fx"], CAM["cx"], CAM["fy"],
                            CAM["cy"], cfg=cfg),
            policy_stride=3, stagger=8,
        ))

        assert len(sharded) == len(single) >= 1
        for s, m in zip(sharded, single):
            # identical switch schedule
            assert s.n_updates == m.n_updates
            # same keyframe content: poses identical, depth maps close
            np.testing.assert_allclose(
                np.asarray(s.state.T_world_ref),
                np.asarray(m.state.T_world_ref), rtol=1e-6, atol=1e-6,
            )
            conv_s = np.asarray(s.state.conv)
            conv_m = np.asarray(m.state.conv)
            assert (conv_s == conv_m).mean() > 0.99
            both = (conv_s == int(ConvergenceState.CONVERGED)) & (
                conv_m == int(ConvergenceState.CONVERGED))
            if both.any():
                np.testing.assert_allclose(
                    np.asarray(s.state.mu)[both],
                    np.asarray(m.state.mu)[both], rtol=5e-3, atol=1e-3,
                )
                np.testing.assert_allclose(
                    s.denoised_depth[both],
                    np.asarray(m.denoised_depth)[both],
                    rtol=5e-3, atol=2e-3,
                )

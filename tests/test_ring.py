"""Round-5 ring (BatchedDepthmap) additions: keyframe depth propagation in
the slot reseed, and the degenerate-motion regime dispatch (re-enabled —
the scan body is the single-keyframe program, so the cached-branch
lax.switch of ops/rect_match.match traces unchanged).
"""

import numpy as np
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models import depthmap as dm
from rpg_open_remode_tpu.models.multikeyframe import BatchedDepthmap
from rpg_open_remode_tpu.utils import synthetic

CAM = dict(fx=120.3, fy=-120.0, cx=79.5, cy=59.5)
W, H = 160, 120


def _Tcw(fr):
    T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
    return np.linalg.inv(T)[:3].astype(np.float32)


def test_ring_propagated_reseed_matches_single_engine():
    """seed_keyframe on an active slot with cfg.propagate_depth must equal
    the single-engine propagated set_reference_image (the ring reuses the
    same propagate_depth + init_seeds composition)."""
    cfg = RemodeConfig(num_planes=48, propagate_depth=True)
    frames = synthetic.generate(n_frames=14, width=W, height=H, cam=CAM,
                                seed=5)
    f0 = frames[0]
    d0 = f0.depth[np.isfinite(f0.depth)]
    bounds = (float(d0.min()), float(d0.max()))

    ring = BatchedDepthmap(2, W, H, CAM["fx"], CAM["cx"], CAM["fy"],
                           CAM["cy"], cfg=cfg)
    single = dm.Depthmap(W, H, CAM["fx"], CAM["cx"], CAM["fy"], CAM["cy"],
                         cfg=cfg)
    ring.seed_keyframe(0, f0.image, _Tcw(f0), *bounds)
    ring.seed_keyframe(1, f0.image, _Tcw(f0), *bounds)
    single.set_reference_image(f0.image, _Tcw(f0), *bounds)
    # ~10 updates: the carry mask (narrowed sigma + inlier ratio,
    # ops/propagate.py) needs the posterior to actually tighten first
    for fr in frames[1:12]:
        ring.update(fr.image, _Tcw(fr))
        single.update(fr.image, _Tcw(fr))

    # reseed slot 0 from frame 12 — the active slot warm-starts from its
    # own posterior; the single engine does the same
    f8 = frames[12]
    ring.seed_keyframe(0, f8.image, _Tcw(f8), *bounds)
    single.set_reference_image(f8.image, _Tcw(f8), *bounds)

    got = ring.keyframe_state(0)
    for name in ("mu", "sigma_sq", "a", "b", "ref_img"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)),
            np.asarray(getattr(single.state, name)),
            rtol=1e-4, atol=1e-5, err_msg=name,
        )
    # the warm start actually carried depth: some seeds must differ from
    # the flat avg_depth init
    flat = float(got.scene.avg_depth)
    assert (np.abs(np.asarray(got.mu) - flat) > 1e-3).any(), \
        "propagated reseed produced only the flat prior"
    # slot 1 untouched by the reseed
    ref1 = ring.keyframe_state(1)
    assert float(jnp.max(jnp.abs(ref1.ref_img - jnp.asarray(
        np.asarray(f0.image, np.float32))))) < 1e-5


def test_ring_stationary_frames_degenerate_dispatch():
    """Verdict r4 item 5: a hovering camera feeding the ring. The regime
    dispatch must route the B~0 frames through the pure-rotation matcher
    (self-match, the reference's zero-baseline invariant,
    test/epipolar_test.cpp:206-220) — the raw rectified sweep is proven
    broken in this regime (tests/test_matching.py). No seed may falsely
    converge (depth is unobservable without baseline)."""
    cfg = RemodeConfig(num_planes=48)
    frames = synthetic.generate(n_frames=2, width=W, height=H, cam=CAM,
                                seed=5)
    f0 = frames[0]
    d0 = f0.depth[np.isfinite(f0.depth)]
    ring = BatchedDepthmap(2, W, H, CAM["fx"], CAM["cx"], CAM["fy"],
                           CAM["cy"], cfg=cfg)
    T = _Tcw(f0)
    for slot in range(2):
        ring.seed_keyframe(slot, f0.image, T, float(d0.min()),
                           float(d0.max()))
    mu_init = np.asarray(ring.states.mu).copy()
    for _ in range(6):
        ring.update(f0.image, T)   # identical frame, identical pose

    conv = np.asarray(ring.states.conv)
    assert not (conv == int(ConvergenceState.CONVERGED)).any(), \
        "stationary camera produced false convergence"
    # depth untouched: the zero-baseline guard leaves seeds as-is
    np.testing.assert_array_equal(np.asarray(ring.states.mu), mu_init)
    # the dispatch took the self-matching pure-rotation branch: interior
    # UPDATE pixels with texture found matches on their own coordinates
    h, w = H, W
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    for slot in range(2):
        st = ring.keyframe_state(slot)
        upd = np.asarray(st.conv) == int(ConvergenceState.UPDATE)
        interior = np.zeros((h, w), bool)
        interior[8:-8, 8:-8] = True
        textured = np.asarray(st.const_templ_denom) > 1e-4
        cand = upd & interior & textured
        assert cand.mean() > 0.5, (
            "raw rectified path suspected: self-matches not found "
            f"(UPDATE+textured interior fraction {cand.mean():.2f})"
        )
        err = np.hypot(np.asarray(st.match_u) - xx,
                       np.asarray(st.match_v) - yy)[cand]
        assert np.percentile(err, 90) < 0.1

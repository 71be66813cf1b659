"""Straggler band slicing (ops/rect_match.straggler_slice_bands) and the
sweep-work accounting (ops/accounting.py) — round-5 additions.

The reference has no analog (its walk pays min(3 sigma, 100 px) per active
seed per frame, epipolar_match.cu:63-96); these tests pin the slicing's
contract instead: fresh seeds untouched, slices have the fixed width, the
rotation covers the full band, exploitation centers on mu, and the
accounting's counts are internally consistent.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rpg_open_remode_tpu.config import RemodeConfig
from rpg_open_remode_tpu.ops import rect_match

CFG = RemodeConfig()
S_PLANES = 2.0 * CFG.coarse_refine_radius + 2.0


def _bands(mu, sigma, cfg=CFG):
    d_lo = np.maximum(mu - cfg.sigma_band * sigma, cfg.min_search_depth)
    d_hi = mu + cfg.sigma_band * sigma
    return jnp.asarray(d_lo, jnp.float32), jnp.asarray(d_hi, jnp.float32)


def test_fresh_seeds_not_sliced():
    a = jnp.full((8, 8), CFG.a_init)
    b = jnp.full((8, 8), CFG.b_init)
    strag, fruitless = rect_match.straggler_flag(a, b, CFG)
    assert float(jnp.max(strag)) == 0.0
    assert float(jnp.max(fruitless)) == 0.0
    mu = np.full((8, 8), 1.5, np.float32)
    d_lo, d_hi = _bands(mu, np.full((8, 8), 0.3, np.float32))
    lo2, hi2, ctr = rect_match.straggler_slice_bands(
        d_lo, d_hi, jnp.asarray(mu), strag, jnp.max(fruitless), 240.0, CFG
    )
    np.testing.assert_array_equal(np.asarray(lo2), np.asarray(d_lo))
    np.testing.assert_array_equal(np.asarray(hi2), np.asarray(d_hi))
    np.testing.assert_array_equal(np.asarray(ctr), mu)


def test_straggler_flag_fires_on_fruitless_history():
    # 12 consecutive NO_MATCH frames: b grew by 12 (seed_update.cu:113-117,
    # past the shipped straggler_after=10); one frame short must NOT fire
    a = jnp.full((4, 4), CFG.a_init)
    b = jnp.full((4, 4), CFG.b_init + 12.0)
    strag, fruitless = rect_match.straggler_flag(a, b, CFG)
    assert float(jnp.min(strag)) == 1.0
    assert float(jnp.min(fruitless)) == 12.0
    strag_early, _ = rect_match.straggler_flag(
        a, jnp.full((4, 4), CFG.b_init + CFG.straggler_after - 1.0), CFG
    )
    assert float(jnp.max(strag_early)) == 0.0
    # a converging seed (many matched frames) is NOT a straggler even with
    # some outlier evidence
    strag2, _ = rect_match.straggler_flag(
        jnp.full((4, 4), 30.0), jnp.full((4, 4), CFG.b_init + 12.0), CFG
    )
    assert float(jnp.max(strag2)) == 0.0


def test_slice_width_and_coverage():
    fxB = 240.0
    mu = np.full((2, 2), 1.5, np.float32)
    sigma = np.full((2, 2), 0.5, np.float32)   # wide band
    d_lo, d_hi = _bands(mu, sigma)
    strag = jnp.ones((2, 2), jnp.float32)
    # the slicing explores the EXTENT-CAPPED band (mu-centered
    # min(6 sigma, 100)-plane window — what the unsliced sweep searches)
    i_lo_full = 1.0 / float(d_hi[0, 0])
    i_hi_full = 1.0 / float(d_lo[0, 0])
    i_mu = 1.0 / mu[0, 0]
    half = 0.5 * min((i_hi_full - i_lo_full) * fxB,
                     CFG.max_epipolar_extent) / fxB
    i_lo_full = max(i_lo_full, i_mu - half)
    i_hi_full = min(i_hi_full, i_mu + half)
    covered = []
    for n in range(60):
        lo2, hi2, ctr = rect_match.straggler_slice_bands(
            d_lo, d_hi, jnp.asarray(mu), strag, jnp.float32(n), fxB, CFG
        )
        lo2 = float(lo2[0, 0])
        hi2 = float(hi2[0, 0])
        # slice width in planes = fxB * (1/lo - 1/hi) == S
        width_planes = fxB * (1.0 / lo2 - 1.0 / hi2)
        assert width_planes == pytest.approx(S_PLANES, rel=1e-3)
        # slice inside the full band
        assert 1.0 / hi2 >= i_lo_full - 1e-6
        assert 1.0 / lo2 <= i_hi_full + 1e-6
        # center channel is the slice midpoint in inverse depth
        assert 1.0 / float(ctr[0, 0]) == pytest.approx(
            0.5 * (1.0 / lo2 + 1.0 / hi2), rel=1e-5
        )
        if n % 3 == 0:
            # exploitation frame: mu inside the slice
            assert lo2 <= mu[0, 0] <= hi2
        covered.append((1.0 / hi2, 1.0 / lo2))
    # the exploration rotation covers the capped band: every interior
    # point (quarter-slice-width edge slack — the golden sequence reaches
    # the exact edges only asymptotically) lies inside some visited slice
    Si = (i_hi_full - i_lo_full) * S_PLANES / 100.0
    for p in np.linspace(i_lo_full + 0.25 * Si, i_hi_full - 0.25 * Si, 200):
        assert any(a0 - 1e-9 <= p <= b0 + 1e-9 for (a0, b0) in covered), p


def test_narrow_bands_never_sliced():
    # a band already narrower than the slice is left alone even for flagged
    # stragglers (Wi <= Si gate)
    fxB = 240.0
    mu = np.full((2, 2), 1.5, np.float32)
    sigma = np.full((2, 2), 0.01, np.float32)
    d_lo, d_hi = _bands(mu, sigma)
    strag = jnp.ones((2, 2), jnp.float32)
    lo2, hi2, _ = rect_match.straggler_slice_bands(
        d_lo, d_hi, jnp.asarray(mu), strag, jnp.float32(7.0), fxB, CFG
    )
    np.testing.assert_array_equal(np.asarray(lo2), np.asarray(d_lo))
    np.testing.assert_array_equal(np.asarray(hi2), np.asarray(d_hi))


def test_accounting_counts_consistent():
    """frame_accounting on a mid-life engine: executed planes are a
    GROUP-rounded superset of the hull, the skip ratio is sane, and the
    per-pixel ideal lower-bounds the executed visits."""
    from rpg_open_remode_tpu.models.depthmap import Depthmap
    from rpg_open_remode_tpu.ops import accounting
    from rpg_open_remode_tpu.utils import synthetic

    w, h = 320, 192
    cam_kw = dict(fx=240.6, fy=-240.0, cx=(w - 1) / 2, cy=(h - 1) / 2)
    frames = synthetic.generate(n_frames=8, width=w, height=h, cam=cam_kw,
                                seed=3)
    f0 = frames[0]
    d = f0.depth[np.isfinite(f0.depth)]

    def Tcw(fr):
        T = np.concatenate([fr.T_world_curr, [[0, 0, 0, 1]]])
        return np.linalg.inv(T)[:3].astype(np.float32)

    eng = Depthmap(w, h, cfg=RemodeConfig(pallas_interpret=True), **cam_kw)
    eng.set_reference_image(f0.image, Tcw(f0), d.min(), d.max())
    for fr in frames[1:6]:
        eng.update(fr.image, Tcw(fr))
    rec = accounting.frame_accounting(
        eng, jnp.asarray(frames[6].image), Tcw(frames[6]), 0.01
    )
    assert rec["planes_exec"] >= rec["planes_swept"] > 0
    assert 0.0 < rec["skip_ratio"] <= 1.0
    assert rec["planes_exec"] <= rec["planes_full"]
    assert rec["est_tflops"] > 0
    assert rec["hull_over_ideal"] >= 1.0
    assert 0 <= rec["mfu_pct"] < 100

    # a YOUNG keyframe with a real baseline (fx*B must put the +-3 sigma
    # bands past the coarse wide threshold of 2*r+2 planes) must account
    # the coarse half-resolution pass as fired, with nonzero coarse planes
    fast = synthetic.generate(n_frames=4, width=w, height=h, cam=cam_kw,
                              seed=3, step=0.12)
    g0 = fast[0]
    dg = g0.depth[np.isfinite(g0.depth)]
    eng2 = Depthmap(w, h, cfg=RemodeConfig(pallas_interpret=True), **cam_kw)
    eng2.set_reference_image(g0.image, Tcw(g0), dg.min(), dg.max())
    eng2.update(fast[1].image, Tcw(fast[1]))
    rec2 = accounting.frame_accounting(
        eng2, jnp.asarray(fast[2].image), Tcw(fast[2]), 0.01
    )
    assert rec2["coarse_fired"] and rec2["coarse_planes_exec"] > 0, rec2

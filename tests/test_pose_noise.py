"""Pose-noise measurement model (cfg.pose_noise_rot_deg / _trans_m).

The reference's tau models only the one-pixel matching angle
(src/triangulation.cu:52-68); VO pose error is unmodeled and registers as
outlier evidence. The extension (ops/seed_update.py) widens tau by the
configured per-frame pose noise. These tests pin its contract: defaults
are reference-exact (bitwise), noise widens tau monotonically, and a
measurement displaced by a pose-sized error keeps more inlier credit
under the model than without it.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from rpg_open_remode_tpu.config import ConvergenceState, RemodeConfig
from rpg_open_remode_tpu.models.state import SceneParams, empty_state
from rpg_open_remode_tpu.ops import seed_update
from rpg_open_remode_tpu.utils import se3
from rpg_open_remode_tpu.utils.camera import PinholeCamera


def _setup(h=16, w=24, mu0=1.5, sig0=0.02, baseline=0.10, fx=200.0):
    cfg = RemodeConfig()
    cam = PinholeCamera.create(fx, fx, (w - 1) / 2, (h - 1) / 2)
    scene = SceneParams.create(1.0, 2.5, cfg)
    st = empty_state(h, w, cam)
    st = dataclasses.replace(
        st,
        mu=jnp.full((h, w), mu0, jnp.float32),
        sigma_sq=jnp.full((h, w), sig0, jnp.float32),
        a=jnp.full((h, w), 10.0, jnp.float32),
        b=jnp.full((h, w), 10.0, jnp.float32),
        scene=scene,
    )
    # current camera translated along +x in the ref frame: T_ref_curr has
    # t = [baseline, 0, 0]
    T_ref_curr = jnp.concatenate(
        [jnp.eye(3, dtype=jnp.float32),
         jnp.asarray([[baseline], [0.0], [0.0]], jnp.float32)], axis=1
    )
    conv = jnp.full((h, w), int(ConvergenceState.UPDATE), jnp.int32)
    return cfg, cam, st, T_ref_curr, conv


def _match_for_depth(st, cam, T_ref_curr, depth):
    """Current-image pixel where a point at `depth` along each ref bearing
    projects — a geometrically consistent match at that depth."""
    f = jnp.moveaxis(st.f_ref, 0, -1)
    p_ref = f * depth
    T_curr_ref = se3.inv(T_ref_curr)
    p_curr = (
        jnp.einsum("ij,hwj->hwi", se3.rotation(T_curr_ref), p_ref)
        + se3.translation(T_curr_ref)
    )
    u = cam.fx * p_curr[..., 0] / p_curr[..., 2] + cam.cx
    v = cam.fy * p_curr[..., 1] / p_curr[..., 2] + cam.cy
    return u, v


def test_defaults_bitwise_reference_exact():
    cfg, cam, st, T, conv = _setup()
    u, v = _match_for_depth(st, cam, T, 1.45)
    out_ref = seed_update.update_seeds(st, conv, u, v, T, cam, cfg)
    out_zero = seed_update.update_seeds(
        st, conv, u, v, T, cam,
        dataclasses.replace(cfg, pose_noise_rot_deg=0.0,
                            pose_noise_trans_m=0.0),
    )
    np.testing.assert_array_equal(np.asarray(out_ref.mu), np.asarray(out_zero.mu))
    np.testing.assert_array_equal(np.asarray(out_ref.a), np.asarray(out_zero.a))


def test_noise_widens_posterior():
    """Wider tau -> the same measurement narrows sigma_sq less."""
    cfg, cam, st, T, conv = _setup()
    u, v = _match_for_depth(st, cam, T, 1.5)
    base = seed_update.update_seeds(st, conv, u, v, T, cam, cfg)
    noisy = seed_update.update_seeds(
        st, conv, u, v, T, cam,
        dataclasses.replace(cfg, pose_noise_rot_deg=0.2,
                            pose_noise_trans_m=0.005),
    )
    i = (8, 12)
    assert float(noisy.sigma_sq[i]) > float(base.sigma_sq[i])
    # dose-response: more rot noise, wider still
    noisier = seed_update.update_seeds(
        st, conv, u, v, T, cam,
        dataclasses.replace(cfg, pose_noise_rot_deg=0.5),
    )
    mid = seed_update.update_seeds(
        st, conv, u, v, T, cam,
        dataclasses.replace(cfg, pose_noise_rot_deg=0.2),
    )
    assert float(noisier.sigma_sq[i]) > float(mid.sigma_sq[i])


def test_displaced_measurement_keeps_inlier_credit():
    """A measurement off by a pose-sized depth error: without the model it
    reads as a near-outlier (the one-pixel tau is much smaller than the
    pose-induced displacement at a realistic focal length); with the model
    it earns substantially more inlier credit. fx=1000: one-pixel tau
    ~ z^2*theta/B ~ 22 mm, so a 90 mm pose-induced depth error sits ~3
    combined-sigma out (near-outlier) without the model but ~1.2 sigma in
    with 0.1 deg / 2 mm modeled."""
    cfg, cam, st, T, conv = _setup(sig0=0.0004, fx=1000.0)  # confident prior
    u, v = _match_for_depth(st, cam, T, 1.59)     # 90 mm off a 1.5 m prior
    base = seed_update.update_seeds(st, conv, u, v, T, cam, cfg)
    modeled = seed_update.update_seeds(
        st, conv, u, v, T, cam,
        dataclasses.replace(cfg, pose_noise_rot_deg=0.1,
                            pose_noise_trans_m=0.002),
    )
    i = (8, 12)
    da_base = float(base.a[i]) - 10.0
    da_model = float(modeled.a[i]) - 10.0
    assert da_model > da_base + 0.05, (da_base, da_model)

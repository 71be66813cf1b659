"""Keyframe-state checkpoint / resume.

The reference has no persistence at all — every ``SeedMatrix`` buffer dies
with the process (SURVEY.md section 5).  The natural checkpoint unit of this
framework is the per-keyframe ``SeedState`` pytree (the exact fields of
``SeedMatrix``, include/rmd/seed_matrix.cuh:87-108, plus the scene scalars of
``mvs::DeviceData``, include/rmd/mvs_device_data.cuh:92-102): serialize it
and a mapping run is resumable mid-keyframe with bitwise-identical
continuation (everything downstream is a pure function of this state).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from rpg_open_remode_tpu.models.state import SceneParams, SeedState

_FORMAT_VERSION = 1


def save_state(path: str, state: SeedState) -> None:
    """Serialize a SeedState (single keyframe or kf-batched) to .npz."""
    arrays = {
        f"state.{f.name}": np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
        if f.name != "scene"
    }
    arrays.update(
        {
            f"scene.{f.name}": np.asarray(getattr(state.scene, f.name))
            for f in dataclasses.fields(state.scene)
        }
    )
    arrays["format_version"] = np.asarray(_FORMAT_VERSION)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> SeedState:
    with np.load(path) as data:
        version = int(data["format_version"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        scene = SceneParams(
            **{
                f.name: jnp.asarray(data[f"scene.{f.name}"])
                for f in dataclasses.fields(SceneParams)
            }
        )
        kwargs = {
            f.name: jnp.asarray(data[f"state.{f.name}"])
            for f in dataclasses.fields(SeedState)
            if f.name != "scene"
        }
    return SeedState(scene=scene, **kwargs)

"""TPU-gated parity tests: unlike tests/ (which forces the CPU backend),
this directory runs on whatever backend the environment provides and skips
everything unless it is a real TPU. Run with:

    python -m pytest tests_tpu/ -q       (on the TPU host)

Pins real-hardware Mosaic-lowered numerics of the Pallas kernels against
their XLA formulations (VERDICT round 1, item 10): interpret-mode parity in
tests/ covers semantics, this covers the actual lowering (bf16 paths, lane
rotations, DMA) the bench and eval otherwise exercise only end-to-end."""

import jax
import numpy as np
import pytest

collect_ignore: list[str] = []

if jax.default_backend() not in ("tpu", "axon"):
    collect_ignore = ["test_tpu_parity.py"]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)

"""Test configuration: force a virtual 8-device CPU mesh before jax loads.

Multi-chip sharding logic is tested on a single host via
XLA's host-platform device-count override (see SURVEY.md §4).
"""

import os

# RABBITSALIGN_TPU_TEST_TPU=1 keeps the real accelerator visible so the
# device-parity tests (skipped on CPU) actually run: use
#   RABBITSALIGN_TPU_TEST_TPU=1 python -m pytest tests/ -k device_parity
_use_tpu = os.environ.get("RABBITSALIGN_TPU_TEST_TPU", "") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon baked in, so the env var alone is too late; the
# config update below works post-import.
import jax

if not _use_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    random.seed(1234)
    np.random.seed(1234)
    return random


def random_dna(n: int, alphabet: str = "ACGT", seed=None) -> str:
    r = random.Random(seed) if seed is not None else random
    return "".join(r.choice(alphabet) for _ in range(n))

"""Test harness config: force JAX onto 8 virtual CPU devices.

Multi-chip sharding is validated without TPU hardware
(SURVEY.md §4 item 4): every test sees an 8-device CPU platform, so
distributed tests can build a real ``jax.sharding.Mesh``.  Must run before
jax initializes its backends, hence env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: tests never touch the TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Keep TF off the GPU/TPU and quiet; TF is used for golden-value tests only.
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

# The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (real
# TPU); the env override above is too late for that latched config, so force
# the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

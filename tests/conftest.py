"""Test configuration: force an 8-device CPU mesh so sharding tests run anywhere.

The image's axon sitecustomize registers a remote-TPU backend and overrides
``JAX_PLATFORMS``, so we must force the CPU platform through ``jax.config``
(env vars alone are ignored). The 8 virtual CPU devices exercise pjit/shard_map
paths without a pod — the multi-host test strategy SURVEY.md §4 recommends.
Real-TPU tests are opt-in via ``-m tpu`` (see pyproject markers).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("MACVO_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# f64 enabled suite-wide on CPU: the backend solver runs reference-grade
# float64 there. On real-TPU runs (MACVO_TEST_PLATFORM=tpu) x64 stays off —
# the chip computes f32 + local re-anchoring, which is exactly what the tpu
# marker exercises.
if os.environ.get("MACVO_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

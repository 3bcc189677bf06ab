"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (the cheap stand-in for a
TPU mesh — SURVEY.md §4 "TPU translation") and with x64 enabled so float64
oracle comparisons are meaningful.  This mirrors the reference's tiering:
ReferenceExecutor == XLA:CPU here; backend-vs-reference comparisons become
strategy-vs-oracle comparisons on the same arrays.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

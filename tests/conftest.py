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


def nonsym_tridiag(n, lo=-1.3, dg=3.0, hi=-0.7):
    """Diagonally dominant nonsymmetric tridiagonal (convection-
    diffusion-like) — shared by the fused-solver parity tests."""
    import numpy as np

    from ginkgo_tpu.base.matrix_data import MatrixData

    rows = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    cols = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    vals = np.concatenate(
        [np.full(n, dg), np.full(n - 1, lo), np.full(n - 1, hi)]
    ).astype(np.float32)
    return MatrixData.from_coo((n, n), rows, cols, vals)

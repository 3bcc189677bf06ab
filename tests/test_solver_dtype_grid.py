"""Typed solver grid — the reference's tier-2/3 value-type sweep
(core/test/utils.hpp:64-188 typed suites; test/solver/cg_kernels.cpp:55-120
stopped-column seeding) applied across the Krylov family in the
load-bearing reduced dtypes (f32, bf16)."""

import numpy as np
import pytest
import jax.numpy as jnp

import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.utils import generators


@pytest.fixture
def rng():
    return np.random.default_rng(77)


SPD_SOLVERS = [gko.Cg, gko.Fcg]
GENERAL_SOLVERS = [gko.Bicgstab, gko.Cgs, gko.Bicg, gko.Gmres, gko.Idr]

# dtype -> (criterion tolerance, accepted true relative residual).
# bf16 bound: eps(bf16) = 2^-8, kappa(poisson 12x12) ~ 60 -> the noise
# floor of PURE bf16 arithmetic is ~0.25; bf16 STORAGE with f32 compute
# (accessor / fused kernels) is the precision-preserving pattern.
DTYPES = {
    np.float32: (1e-6, 1e-4),
    "bfloat16": (5e-3, 0.3),
}


def _spd_system(dtype):
    data = generators.poisson_2d(12, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    if dtype == "bfloat16":
        A = A.astype(jnp.bfloat16)
    else:
        A = A.astype(dtype)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    return A, b


@pytest.mark.parametrize("cls", SPD_SOLVERS + GENERAL_SOLVERS)
@pytest.mark.parametrize("dtype", list(DTYPES))
def test_solver_dtype_grid(cls, dtype, rng):
    if dtype == "bfloat16" and cls is gko.Cgs:
        pytest.xfail(
            "CGS squares the residual polynomial: bf16 noise is amplified "
            "past recovery (characteristic, not a defect)"
        )
    tol, accept = DTYPES[dtype]
    A, b = _spd_system(dtype)
    solver = cls.build(
        criteria=[stop.Iteration(600), stop.ResidualNorm(tol)]
    ).generate(A)
    x, info = solver.solve(b)
    assert x.dtype == A.dtype  # storage dtype preserved end-to-end
    r = np.asarray(
        (b - A.apply(x)).astype(jnp.float32), np.float64
    )
    rel = np.linalg.norm(r) / np.linalg.norm(
        np.asarray(b.astype(jnp.float32), np.float64)
    )
    assert rel < accept, (cls.__name__, dtype, rel, int(info.iterations))


@pytest.mark.parametrize("cls", [gko.Gmres, gko.Idr, gko.Cgs])
def test_stopped_column_seeding(cls, rng):
    """cg_kernels.cpp:55-120 pattern: one RHS column is seeded
    already-converged (zero); the solver must freeze it while the live
    columns keep iterating to the solution."""
    data = generators.make_spd(
        generators.generate_random_matrix(40, 40, 2, 6, rng)
    )
    A = gko.Csr.from_matrix_data(data)
    dense = np.asarray(data.to_dense())
    x_true = rng.standard_normal((40, 3))
    b = dense @ x_true
    b[:, 1] = 0.0  # this column converges at iteration 0
    solver = cls.build(
        criteria=[stop.Iteration(800), stop.ResidualNorm(1e-10)]
    ).generate(A)
    x, info = solver.solve(jnp.asarray(b))
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x)[:, 1], 0.0, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(x)[:, 0], x_true[:, 0], rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(x)[:, 2], x_true[:, 2], rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("cls", [gko.Bicgstab, gko.Gmres])
def test_zero_rhs_all_columns(cls, rng):
    """all-zero b: solvers must return x = 0 and report convergence
    without dividing by zero (reference zero-value edge case)."""
    data = generators.poisson_1d(30, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.zeros((30, 2))
    solver = cls.build(
        criteria=[stop.Iteration(50), stop.ResidualNorm(1e-12)]
    ).generate(A)
    x, info = solver.solve(b)
    assert np.all(np.isfinite(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-12)

"""BiCGSTAB / CGS / BiCG / GMRES / CB-GMRES / IDR tests vs oracles
(reference model: reference/test/solver/*)."""

import numpy as np
import pytest
import jax.numpy as jnp

import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.utils import generators


def nonsym_system(rng, n=40, k=2, dtype=np.float64):
    """Diagonally dominant nonsymmetric system."""
    data = generators.generate_random_matrix(n, n, 2, 6, rng, dtype=dtype)
    dense = data.sum_duplicates().to_dense()
    dense = dense + np.diag(np.abs(dense).sum(axis=1) + 1.0)
    data = gko.MatrixData.from_dense(dense)
    A = gko.Csr.from_matrix_data(data)
    x_true = rng.standard_normal((n, k)).astype(dtype)
    b = dense @ x_true
    return A, dense, x_true, b


CRIT = lambda tol=1e-12, iters=500: [
    stop.Iteration(max_iters=iters),
    stop.ResidualNorm(tolerance=tol),
]


@pytest.mark.parametrize("cls", [gko.Bicgstab, gko.Cgs, gko.Bicg])
def test_nonsymmetric_solvers_converge(rng, cls):
    A, dense, x_true, b = nonsym_system(rng)
    solver = cls.build(criteria=CRIT()).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged))), f"{cls.__name__} not converged"
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("cls", [gko.Bicgstab, gko.Cgs])
def test_nonsym_with_jacobi(rng, cls):
    A, dense, x_true, b = nonsym_system(rng, n=50)
    solver = cls.build(
        criteria=CRIT(), preconditioner=gko.Jacobi.build(max_block_size=1)
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-8)


def test_bicgstab_multirhs_masking(rng):
    A, dense, x_true, b = nonsym_system(rng, k=3)
    b = b.copy()
    b[:, 2] = 0.0
    solver = gko.Bicgstab.build(criteria=CRIT()).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x)[:, 2], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x)[:, :2], x_true[:, :2], rtol=1e-7, atol=1e-8)


def test_gmres_converges_nonsymmetric(rng):
    A, dense, x_true, b = nonsym_system(rng, n=60, k=2)
    solver = gko.Gmres.build(criteria=CRIT(1e-10), krylov_dim=20).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)


def test_gmres_restart_needed(rng):
    # krylov_dim smaller than iterations to convergence forces restarts
    A, dense, x_true, b = nonsym_system(rng, n=80, k=1)
    solver = gko.Gmres.build(criteria=CRIT(1e-10, iters=300), krylov_dim=8).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)
    assert int(info.iterations) > 8  # restarted at least once


def test_gmres_with_jacobi_precond(rng):
    A, dense, x_true, b = nonsym_system(rng, n=50, k=1)
    solver = gko.Gmres.build(
        criteria=CRIT(1e-10),
        preconditioner=gko.Jacobi.build(max_block_size=1),
        krylov_dim=25,
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)


# attainable accuracy is bounded by the basis storage precision (that is the
# CB-GMRES trade, cb_gmres.hpp): f32 ~1e-7, int16 ~3e-5, int8 ~1e-2
@pytest.mark.parametrize(
    "mode,floor", [("keep", 1e-7), ("reduce1", 1e-6), ("integer", 5e-4), ("ireduce2", 3e-2)]
)
def test_cb_gmres_storage_modes(rng, mode, floor):
    A, dense, x_true, b = nonsym_system(rng, n=40, k=1)
    solver = gko.CbGmres.build(
        criteria=CRIT(1e-8, iters=400), krylov_dim=20, storage_precision=mode
    ).generate(A)
    x, info = solver.solve(b)
    res = np.linalg.norm(b - dense @ np.asarray(x)) / np.linalg.norm(b)
    assert res < floor, (mode, res)


@pytest.mark.parametrize("s", [2, 4])
def test_idr_converges(rng, s):
    A, dense, x_true, b = nonsym_system(rng, n=40, k=2)
    solver = gko.Idr.build(criteria=CRIT(1e-10), subspace_dim=s).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    res = np.linalg.norm(b - dense @ np.asarray(x)) / np.linalg.norm(b)
    assert res < 1e-8


def test_idr_deterministic(rng):
    A, dense, x_true, b = nonsym_system(rng, n=30, k=1)
    s1 = gko.Idr.build(criteria=CRIT(1e-10), subspace_dim=2).generate(A)
    s2 = gko.Idr.build(criteria=CRIT(1e-10), subspace_dim=2).generate(A)
    x1, _ = s1.solve(b)
    x2, _ = s2.solve(b)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_gmres_spd_matches_cg_solution(rng):
    data = generators.make_spd(generators.generate_random_matrix(30, 30, 2, 5, rng))
    A = gko.Csr.from_matrix_data(data)
    b = rng.standard_normal((30, 1))
    xg, _ = gko.Gmres.build(criteria=CRIT(1e-12), krylov_dim=30).generate(A).solve(b)
    xc, _ = gko.Cg.build(criteria=CRIT(1e-12)).generate(A).solve(b)
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xc), rtol=1e-7, atol=1e-9)


def test_cg_complex_hermitian(rng):
    # Hermitian positive definite complex system (reference instantiates all
    # solvers for complex<double>, types.hpp:451-461)
    n = 24
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = (B @ B.conj().T + n * np.eye(n)).astype(np.complex128)
    A = gko.Csr.from_matrix_data(gko.MatrixData.from_dense(H))
    x_true = (rng.standard_normal((n, 1)) + 1j * rng.standard_normal((n, 1)))
    b = jnp.asarray(H @ x_true)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)
    x, info = solver.solve(b)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-8, atol=1e-8)


def test_gmres_and_bicgstab_complex_general(rng):
    n = 20
    M = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))) * 0.3
    Ad = (M + n * np.eye(n)).astype(np.complex128)  # diagonally dominant
    A = gko.Csr.from_matrix_data(gko.MatrixData.from_dense(Ad))
    x_true = rng.standard_normal((n, 1)) + 1j * rng.standard_normal((n, 1))
    b = jnp.asarray(Ad @ x_true)
    for cls in (gko.Gmres, gko.Bicgstab):
        solver = cls.build(
            criteria=[stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-12)]
        ).generate(A)
        x, info = solver.solve(b)
        np.testing.assert_allclose(
            np.asarray(x), x_true, rtol=1e-7, atol=1e-7,
            err_msg=cls.__name__,
        )


def test_idr_f32_reports_honest_convergence(rng):
    """Regression: the IDR(s) recurrence drifts in f32; with residual
    replacement the solver must not CLAIM 1e-6 convergence while the true
    residual sits orders of magnitude higher."""
    data = generators.poisson_2d(24, dtype=np.float32)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((data.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]
    x, info = gko.Idr.build(criteria=crit, subspace_dim=4).generate(A).solve(b)
    rel = float(jnp.linalg.norm(b - A.apply(x)) / jnp.linalg.norm(b))
    if bool(np.all(np.asarray(info.converged))):
        assert rel < 5e-5  # claimed convergence must be (roughly) true
    else:
        assert rel < 5e-4  # and even unconverged runs should make progress


def test_cb_gmres_auto_storage_resolution(rng):
    """'auto' storage picks keep below the measured VMEM crossover and
    reduce1 above it (benchmark/results/cb_gmres_crossover_r4.jsonl)."""
    A, dense, x_true, b = nonsym_system(rng, n=40, k=1)
    s = gko.CbGmres.build(criteria=CRIT(1e-8, iters=200)).generate(A)
    assert s.storage_precision == "auto"
    assert s._resolved_mode() == "keep"  # 40 rows << 2**19
    big = s.replace(A=_FakeShape((1 << 20, 1 << 20)))
    assert big._resolved_mode() == "reduce1"
    # the solve itself behaves as 'keep' at this size
    x, info = s.solve(b)
    res = np.linalg.norm(b - dense @ np.asarray(x)) / np.linalg.norm(b)
    assert res < 1e-6


class _FakeShape:
    def __init__(self, shape):
        self.shape = shape
        self.dtype = np.float32

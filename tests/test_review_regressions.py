"""Regression tests for review-confirmed defects (third review pass)."""

import numpy as np
import jax.numpy as jnp
import pytest

import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.factorization.lu import LuFactory
from ginkgo_tpu.factorization.ilu import IluFactory, IcFactory


def test_direct_solve_with_row_pivoting():
    """SuperLU row-pivots on a zero diagonal; the permutation must be
    carried, not folded into a non-triangular 'L'."""
    Ad = np.array([[0.0, 2, 1], [3, 0, 1], [1, 1, 1]])
    A = gko.Csr.from_matrix_data(gko.MatrixData.from_dense(Ad))
    b = jnp.asarray([[1.0], [2.0], [3.0]])
    x, info = gko.Direct.build(factorization=LuFactory()).generate(A).solve(b)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(Ad, np.asarray(b)), rtol=1e-10
    )


def test_gmres_does_not_latch_preconditioned_convergence():
    """A badly scaled preconditioner shrinks the in-cycle residual estimate;
    the outer true-residual check must be able to retract the claim."""

    class ScaledId:
        shape = (50, 50)
        dtype = jnp.float64

        def apply(self, b):
            return 1e-8 * b

    data = gko.generators.poisson_1d(50, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((50, 1))
    s = gko.Gmres.build(
        criteria=[stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-8)],
        krylov_dim=20,
        preconditioner=ScaledId(),
    ).generate(A)
    x, info = s.solve(b)
    rel = float(jnp.linalg.norm(b - A.apply(x)) / jnp.linalg.norm(b))
    conv = bool(np.all(np.asarray(info.converged)))
    assert (not conv) or rel < 1e-7


def test_solve_chunked_matches_unchunked_cg():
    """Chunk boundaries carry the CG Krylov state and the initial-residual
    baseline is frozen once — chunked == unchunked."""
    data = gko.generators.poisson_1d(40, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((40, 1))
    crit = [
        stop.Iteration(max_iters=400),
        stop.ResidualNorm(tolerance=1e-10, baseline="initial_resnorm"),
    ]
    s = gko.Cg.build(criteria=crit).generate(A)
    x1, i1 = s.solve(b)
    x2, i2 = s.solve_chunked(b, chunk=5)
    assert bool(np.all(np.asarray(i2.converged)))
    assert abs(int(i2.iterations) - int(i1.iterations)) <= 2
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), rtol=1e-8)


def test_ilu0_missing_diagonal_raises():
    Ad = np.array([[2.0, 1, 0], [3, 0, 1], [0, 1, 4]])  # no stored (1,1)
    A = gko.Csr.from_matrix_data(gko.MatrixData.from_dense(Ad))
    with pytest.raises(ValueError, match="diagonal"):
        IluFactory().generate(A)


def test_ic0_complex_hermitian():
    """IC(0) must conjugate the second factor; on a dense Hermitian matrix
    IC(0) equals the full Cholesky."""
    rng = np.random.default_rng(0)
    B = rng.standard_normal((6, 6)) + 1j * rng.standard_normal((6, 6))
    H = B @ B.conj().T + 6 * np.eye(6)
    Hc = gko.Csr.from_matrix_data(gko.MatrixData.from_dense(H))
    L = np.asarray(IcFactory().generate(Hc).l_factor.to_dense().values)
    assert np.abs(L @ L.conj().T - H).max() < 1e-8


def test_bicg_warns_without_conj_transpose():
    class MatFree:
        shape = (8, 8)
        dtype = jnp.float64

        def apply(self, b):
            return 2.0 * b

    with pytest.warns(UserWarning, match="conj_transpose"):
        gko.Bicg.build(criteria=[stop.Iteration(max_iters=3)]).generate(MatFree())


def test_idr_complex_shadow_space():
    rng = np.random.default_rng(0)
    B = rng.standard_normal((12, 12)) + 1j * rng.standard_normal((12, 12))
    H = (B @ B.conj().T + 12 * np.eye(12)).astype(np.complex128)
    A = gko.Csr.from_matrix_data(gko.MatrixData.from_dense(H))
    s = gko.Idr.build(
        criteria=[stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-10)],
        subspace_dim=2,
    ).generate(A)
    assert np.iscomplexobj(np.asarray(s.P))
    b = jnp.ones((12, 1), jnp.complex128)
    x, info = s.solve(b)
    rel = float(jnp.linalg.norm(b - A.apply(x)) / jnp.linalg.norm(b))
    assert rel < 1e-8


def test_parilut_approximate_select_runs(rng):
    from ginkgo_tpu.factorization.par_ilut import ParIlutFactory

    data = gko.generators.poisson_2d(8, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    f1 = ParIlutFactory(approximate_select=True).generate(A)
    f2 = ParIlutFactory(approximate_select=False).generate(A)
    assert f1.l_factor.nnz > 0 and f2.l_factor.nnz > 0

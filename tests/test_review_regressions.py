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


def test_bell_inflation_counts_ell_padding(rng):
    """One row touching many panels inflates EVERY block (K padding); the
    estimate must reflect allocated slots, not occupied panels."""
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.matrix.bell import Bell, bell_inflation_estimate

    n = 512
    rows = np.concatenate([np.arange(n), np.zeros(n // 128 * 4, np.int64)])
    cols = np.concatenate(
        [np.arange(n), (np.arange(n // 128 * 4) * 128 + 1) % n]
    )
    data = MatrixData.from_coo(
        (n, n), rows, cols, np.ones(len(rows))
    ).sum_duplicates().sort_row_major()
    est = bell_inflation_estimate(data, block_rows=8)
    A = Bell.from_matrix_data(data, block_rows=8)
    assert abs(est - A.storage_inflation()) / A.storage_inflation() < 0.2
    assert A.storage_inflation() > 100  # the arrow row inflates everything


def test_jacobi_export_no_densify(rng):
    """write() of a (block-)Jacobi must not materialize n^2 memory; check
    correctness on a moderate size (would already be 1.25 GB dense)."""
    data = gko.generators.poisson_1d(200, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    from ginkgo_tpu.preconditioner import JacobiFactory

    for bs in (1, 4):
        J = JacobiFactory(max_block_size=bs).generate(A)
        md = J.to_matrix_data()
        dense = md.to_dense()
        want = np.asarray(J.to_dense().values)
        np.testing.assert_allclose(dense, want, rtol=1e-10, atol=1e-12)


def test_multigrid_with_tocsr_only_operator(rng):
    """Duck-typed fine ops providing only to_csr still get smoothers."""
    from ginkgo_tpu.solver.multigrid import MultigridFactory

    data = gko.generators.poisson_2d(12, dtype=np.float64)

    class CsrOnly:
        shape = data.shape
        dtype = jnp.float64

        def apply(self, b):
            return gko.Csr.from_matrix_data(data).apply(b)

        def to_csr(self):
            return gko.Csr.from_matrix_data(data)

    mg = MultigridFactory(
        criteria=[stop.Iteration(max_iters=40), stop.ResidualNorm(tolerance=1e-8)],
        min_coarse_rows=36,
    ).generate(CsrOnly())
    b = jnp.ones((data.shape[0], 1))
    x, info = mg.solve(b)
    rel = float(jnp.linalg.norm(b - CsrOnly().apply(x)) / jnp.linalg.norm(b))
    assert rel < 1e-6


def test_csr_lookup_empty_matrix():
    A = gko.Csr.create((2, 2), [0, 0, 0], [], [])
    out = np.asarray(A.lookup(np.array([0]), np.array([1])))
    assert out[0] == -1


def test_dia_wide_rectangular_not_truncated(rng):
    """Wide Dia (m > row-frame) must use the full x, not truncate it."""
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.matrix.dia import Dia

    n, m = 100, 400
    r = np.arange(n)
    data = MatrixData.from_coo(
        (n, m),
        np.concatenate([r, r]),
        np.concatenate([r, r + 256]),
        np.concatenate([np.ones(n), 2 * np.ones(n)]),
    ).sort_row_major()
    D = Dia.from_matrix_data(data)
    x = jnp.asarray(rng.standard_normal(m))
    want = np.asarray(data.to_dense()) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(D.apply(x)), want, rtol=1e-10)

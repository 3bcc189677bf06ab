"""Whole-solve-in-VMEM fused GMRES (ops/pallas_gmres.py, solver/gmres.py
fast path).

Oracle tier: the fused kernel runs in interpreter mode on CPU and must
match the generic restarted-GMRES `lax.while_loop` solver (same
left-preconditioned CGS2 + Givens algorithm; reduction orders differ
inside vs outside the kernel) on solution and convergence behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.utils import generators
from ginkgo_tpu.matrix.dia import Dia
from ginkgo_tpu.solver.gmres import Gmres
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu import stop


@pytest.fixture
def poisson_dia():
    data = generators.poisson_2d(16, dtype=np.float32)
    return Dia.from_matrix_data(data), jnp.ones((data.shape[0], 1), jnp.float32)


def _solve_both(A, b, crit, monkeypatch, precond=None, m=10):
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    fac = Gmres.build(criteria=crit, preconditioner=precond, krylov_dim=m)
    solver = fac.generate(A)
    assert solver._try_vmem_fused(b, jnp.zeros_like(b)) is not None
    x_fast, info_fast = solver.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    x_gen, info_gen = Gmres.build(
        criteria=crit, preconditioner=precond, krylov_dim=m
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    return (x_fast, info_fast), (x_gen, info_gen)


def _relres(A, x, b):
    r = np.asarray(b) - np.asarray(A.apply(x))
    return np.linalg.norm(r) / np.linalg.norm(np.asarray(b))


def test_vmem_gmres_matches_generic(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-5)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    # both meet the criterion on the true residual
    assert _relres(A, xf, b) < 1e-5
    assert _relres(A, xg, b) < 1e-5
    # restart boundaries may differ by round-off; iteration counts agree
    # to one restart cycle
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 10


def test_vmem_gmres_multi_restart(poisson_dia, monkeypatch):
    """krylov_dim far below the iteration need forces several restart
    cycles through the in-kernel outer while_loop."""
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-5)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, m=5)
    assert bool(inf_f.converged[0])
    assert _relres(A, xf, b) < 1e-5
    assert int(inf_f.iterations) > 5  # actually restarted


def test_vmem_gmres_jacobi(poisson_dia, monkeypatch):
    A, b = poisson_dia
    # 1e-5: tolerances beyond the f32 restarted-GMRES floor (~1.6e-6
    # relative on this problem) stall the GENERIC solver too — verified
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-5)]
    M = Jacobi.build(max_block_size=1).generate(A)
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, precond=M)
    assert bool(inf_f.converged[0])
    assert _relres(A, xf, b) < 1e-5
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-3, atol=1e-4
    )


def test_vmem_gmres_iteration_only(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=12)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, m=6)
    assert int(inf_f.iterations) == 12
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-5
    )


def test_vmem_gmres_gate_declines(poisson_dia, monkeypatch):
    """Integer storage modes and absent force/backend decline cleanly."""
    A, b = poisson_dia
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Gmres.build(
        criteria=[stop.Iteration(5)], storage_precision="integer"
    ).generate(A)
    assert s._try_vmem_fused(b, jnp.zeros_like(b)) is None
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    s2 = Gmres.build(criteria=[stop.Iteration(5)]).generate(A)
    assert s2._try_vmem_fused(b, jnp.zeros_like(b)) is None


def test_vmem_gmres_bf16_basis(poisson_dia, monkeypatch):
    """CB-GMRES float storage modes ride the fused kernel with a bf16
    VMEM basis (halved basis footprint); convergence survives the
    reduced-precision basis on the true-residual outer check."""
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-4)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Gmres.build(
        criteria=crit, krylov_dim=10, storage_precision="reduce2"
    ).generate(A)
    assert s._try_vmem_fused(b, jnp.zeros_like(b)) is not None
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    assert bool(inf_f.converged[0])
    assert _relres(A, xf, b) < 1e-4
    # generic CB-GMRES reduce2 for comparison
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Gmres.build(
        criteria=crit, krylov_dim=10, storage_precision="reduce2"
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=5e-2, atol=5e-3
    )


def test_vmem_gmres_pell(monkeypatch):
    """Fused GMRES on a GENERAL unstructured (Pell) operator matches the
    generic solver on the same matrix."""
    import scipy.sparse as sps
    from ginkgo_tpu.matrix.pell import Pell
    from ginkgo_tpu.base.matrix_data import MatrixData

    rng = np.random.default_rng(4)
    n = 500
    sp = sps.random(n, n, density=0.01, random_state=5, format="csr")
    sp = (sp + sp.T + sps.eye(n) * 8).tocsr()
    co = sp.tocoo()
    data = MatrixData.from_coo(sp.shape, co.row, co.col, co.data)
    A = Pell.from_matrix_data(data).astype(jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)[:, None]
    crit = [stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-5)]

    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Gmres.build(criteria=crit, krylov_dim=15).generate(A)
    assert s._try_vmem_fused_pell(b, jnp.zeros_like(b)) is not None
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Gmres.build(criteria=crit, krylov_dim=15).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")

    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    assert _relres(A, xf, b) < 1e-5
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=5e-3, atol=5e-4
    )


def test_vmem_gmres_multichunk(poisson_dia, monkeypatch):
    """GINKGO_TPU_CG_CHUNK forces multiple row chunks through every
    chunked loop of the GMRES core (dots, axpys, staging, SpMV)."""
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-5)]
    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "2")
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch)
    assert bool(inf_f.converged[0])
    assert _relres(A, xf, b) < 1e-5


# ---- k-RHS fused GMRES (per-column stopping) -----------------------------

def _multi_rhs(A, k=3, scales=(1.0, 30.0, 0.02)):
    n = A.shape[0]
    rng = np.random.default_rng(3)
    cols = rng.standard_normal((n, k)).astype(np.float32)
    return jnp.asarray(cols * np.asarray(scales[:k], np.float32))


def test_vmem_gmres_multi_rhs(poisson_dia, monkeypatch):
    """k-RHS kernel: shared Arnoldi step counter, per-column QR factors
    and freeze.  Every column's true residual honors the tolerance and
    solutions agree with the generic vmapped solver."""
    A, _ = poisson_dia
    b = _multi_rhs(A)
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-5)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, m=20)
    assert bool(np.all(np.asarray(inf_f.converged)))
    assert bool(np.all(np.asarray(inf_g.converged)))
    r = np.asarray(b) - np.asarray(A.apply(xf))
    rel = np.linalg.norm(r, axis=0) / np.linalg.norm(np.asarray(b), axis=0)
    assert float(rel.max()) < 1e-5
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-3, atol=1e-3
    )
    # the vmapped generic counts each column independently (max
    # reported); the shared-j fused count agrees to one restart cycle
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 20


def test_vmem_gmres_multi_rhs_percolumn_absolute(poisson_dia, monkeypatch):
    """Absolute baseline makes the x30 column stop much later than the
    x0.02 column — exercises the per-column freeze path."""
    A, _ = poisson_dia
    b = _multi_rhs(A)
    crit = [
        stop.Iteration(max_iters=600),
        stop.ResidualNorm(tolerance=1e-4, baseline="absolute"),
    ]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Gmres.build(criteria=crit, krylov_dim=20).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    assert bool(np.all(np.asarray(inf_f.converged)))
    r = np.asarray(b) - np.asarray(A.apply(xf))
    assert float(np.linalg.norm(r, axis=0).max()) < 1.5e-4


def test_vmem_gmres_multi_rhs_jacobi_iteronly(poisson_dia, monkeypatch):
    A, _ = poisson_dia
    b = _multi_rhs(A, k=2, scales=(1.0, 5.0))
    crit = [stop.Iteration(max_iters=25)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        A, b, crit, monkeypatch, precond=Jacobi.build(max_block_size=1),
        m=10,
    )
    assert int(inf_f.iterations) == 25
    assert not bool(np.any(np.asarray(inf_f.converged)))
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-3, atol=1e-3
    )


def test_vmem_gmres_multi_rhs_declines_over_4(poisson_dia, monkeypatch):
    A, _ = poisson_dia
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Gmres.build(criteria=[stop.Iteration(5)]).generate(A)
    b5 = jnp.ones((A.shape[0], 5), jnp.float32)
    assert s._try_vmem_fused(b5, jnp.zeros_like(b5)) is None


def test_vmem_gmres_multi_rhs_bf16_basis(poisson_dia, monkeypatch):
    A, _ = poisson_dia
    b = _multi_rhs(A, k=2, scales=(1.0, 2.0))
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-4)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Gmres.build(
        criteria=crit, krylov_dim=10, storage_precision="reduce1"
    ).generate(A)
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    assert bool(np.all(np.asarray(inf_f.converged)))
    r = np.asarray(b) - np.asarray(A.apply(xf))
    rel = np.linalg.norm(r, axis=0) / np.linalg.norm(np.asarray(b), axis=0)
    assert float(rel.max()) < 1e-4

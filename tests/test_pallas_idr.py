"""Whole-solve-in-VMEM fused IDR(s) (ops/pallas_idr.py).

Oracle tier: interpret-mode kernel on CPU vs the generic streaming
loop (solver/idr.py) — iteration counts within one outer iteration
(the residual-replacement stop check is knife-edge to reduction
order), true residuals honoring the tolerance, matching solutions."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.matrix.dia import Dia
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu.solver.idr import Idr
from ginkgo_tpu import stop


from tests.conftest import nonsym_tridiag as _nonsym_tridiag


@pytest.fixture
def nonsym_dia():
    data = _nonsym_tridiag(700)
    A = Dia.from_matrix_data(data)
    b = jnp.asarray(
        np.random.default_rng(5).standard_normal((700, 1)).astype(np.float32)
    )
    return A, b


def _solve_both(A, b, crit, monkeypatch, s=2, precond=None):
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Idr.build(
        criteria=crit, preconditioner=precond, subspace_dim=s
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Idr.build(
        criteria=crit, preconditioner=precond, subspace_dim=s
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    return (xf, inf_f), (xg, inf_g)


@pytest.mark.parametrize("s", [2, 4])
def test_vmem_idr_matches_generic(nonsym_dia, monkeypatch, s):
    A, b = nonsym_dia
    crit = [stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, s=s)
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 1
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    bn = np.linalg.norm(np.asarray(b))
    r = np.asarray(b) - np.asarray(A.apply(xf))
    assert np.linalg.norm(r) <= 1.5e-6 * bn
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-3, atol=1e-4
    )


def test_vmem_idr_scalar_jacobi(nonsym_dia, monkeypatch):
    A, b = nonsym_dia
    crit = [stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        A, b, crit, monkeypatch, s=4, precond=Jacobi.build(max_block_size=1)
    )
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 1
    assert bool(inf_f.converged[0])
    r = np.asarray(b) - np.asarray(A.apply(xf))
    assert np.linalg.norm(r) <= 1.5e-6 * np.linalg.norm(np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-3, atol=1e-4
    )


def test_vmem_idr_iteration_only_multichunk(nonsym_dia, monkeypatch):
    A, b = nonsym_dia
    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "2")
    crit = [stop.Iteration(max_iters=4)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, s=2)
    monkeypatch.delenv("GINKGO_TPU_CG_CHUNK")
    assert int(inf_f.iterations) == 4 == int(inf_g.iterations)
    assert not bool(inf_f.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-3, atol=1e-4
    )


def test_vmem_idr_declines(nonsym_dia, monkeypatch):
    """s above the fused cap and multi-RHS must fall back to streaming."""
    A, b = nonsym_dia
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    big = Idr.build(
        criteria=[stop.Iteration(max_iters=5)], subspace_dim=6
    ).generate(A)
    assert big._try_vmem_fused(b, jnp.zeros_like(b)) is None
    b2 = jnp.ones((A.shape[0], 2), jnp.float32)
    s2 = Idr.build(criteria=[stop.Iteration(max_iters=5)]).generate(A)
    x2, info2 = s2.solve(b2)  # multi-RHS rides the vmap streaming path
    assert x2.shape == b2.shape


def test_vmem_idr_poisson_spd(monkeypatch):
    """SPD operator coverage.  IDR(s) in f32 STALLS near 1e-5 relative
    on this conditioning (both paths — the squared-ish update
    polynomials), so the criterion asks only for 1e-3: well above the
    stall floor, where fused and generic trajectories both converge."""
    from ginkgo_tpu.utils import generators

    data = generators.poisson_2d(16, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-3)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, s=4)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    r = np.asarray(b) - np.asarray(A.apply(xf))
    assert np.linalg.norm(r) <= 2e-3 * np.linalg.norm(np.asarray(b))

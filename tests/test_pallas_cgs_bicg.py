"""Whole-solve-in-VMEM fused CGS and BiCG (ops/pallas_cgs.py).

Oracle tier: interpret-mode kernels on CPU vs the generic streaming
loops (solver/bicgstab.py Cgs/Bicg) — identical iteration counts,
f32-roundoff agreement.  BiCG runs on a NONSYMMETRIC operator so a
wrong/missing conj-transpose in the kernel fails loudly."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.matrix.dia import Dia
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu.solver.bicgstab import Bicg, Cgs
from ginkgo_tpu import stop


from tests.conftest import nonsym_tridiag as _nonsym_tridiag


@pytest.fixture
def nonsym_dia():
    data = _nonsym_tridiag(700)
    A = Dia.from_matrix_data(data)
    b = jnp.asarray(
        np.random.default_rng(3).standard_normal((700, 1)).astype(np.float32)
    )
    return A, b


def _solve_both(cls, A, b, crit, monkeypatch, precond=None):
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = cls.build(criteria=crit, preconditioner=precond).generate(
        A
    ).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = cls.build(criteria=crit, preconditioner=precond).generate(
        A
    ).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    return (xf, inf_f), (xg, inf_g)


# ---------------------------------------------------------------- CGS ----

def test_vmem_cgs_matches_generic(nonsym_dia, monkeypatch):
    A, b = nonsym_dia
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(Cgs, A, b, crit, monkeypatch)
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(inf_f.residual_norm[0]), float(inf_g.residual_norm[0]),
        rtol=5e-3,
    )


def test_vmem_cgs_scalar_jacobi(nonsym_dia, monkeypatch):
    A, b = nonsym_dia
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        Cgs, A, b, crit, monkeypatch, precond=Jacobi.build(max_block_size=1)
    )
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def test_vmem_cgs_iteration_only_multichunk(nonsym_dia, monkeypatch):
    A, b = nonsym_dia
    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "2")
    crit = [stop.Iteration(max_iters=12)]
    (xf, inf_f), (xg, inf_g) = _solve_both(Cgs, A, b, crit, monkeypatch)
    monkeypatch.delenv("GINKGO_TPU_CG_CHUNK")
    assert int(inf_f.iterations) == 12 == int(inf_g.iterations)
    assert not bool(inf_f.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def test_vmem_cgs_declines_multi_rhs(nonsym_dia, monkeypatch):
    A, _ = nonsym_dia
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Cgs.build(criteria=[stop.Iteration(max_iters=5)]).generate(A)
    b2 = jnp.ones((A.shape[0], 2), jnp.float32)
    assert s._try_vmem_fused(b2, jnp.zeros_like(b2)) is None


# --------------------------------------------------------------- BiCG ----

def test_vmem_bicg_matches_generic_nonsym(nonsym_dia, monkeypatch):
    """The shadow recurrence needs A^H: a kernel that silently reused A
    would converge to a different iterate/count on this matrix."""
    A, b = nonsym_dia
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(Bicg, A, b, crit, monkeypatch)
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )
    # true residual honors the tolerance
    r = np.asarray(b) - np.asarray(A.apply(xf))
    assert np.linalg.norm(r) <= 2e-6 * np.linalg.norm(np.asarray(b))


def test_vmem_bicg_scalar_jacobi(nonsym_dia, monkeypatch):
    A, b = nonsym_dia
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        Bicg, A, b, crit, monkeypatch, precond=Jacobi.build(max_block_size=1)
    )
    assert int(inf_f.iterations) == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def test_vmem_bicg_implicit_multichunk(nonsym_dia, monkeypatch):
    A, b = nonsym_dia
    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "2")
    crit = [
        stop.Iteration(max_iters=400),
        stop.ImplicitResidualNorm(tolerance=1e-6),
    ]
    (xf, inf_f), (xg, inf_g) = _solve_both(Bicg, A, b, crit, monkeypatch)
    monkeypatch.delenv("GINKGO_TPU_CG_CHUNK")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )
    assert not np.isfinite(float(inf_f.residual_norm[0]))


def test_vmem_bicg_spd_same_as_cg_style(monkeypatch):
    """On an SPD operator BiCG reduces to CG: the fused path must still
    match the generic Bicg loop (covers the symmetric-offsets plan)."""
    from ginkgo_tpu.utils import generators

    data = generators.poisson_2d(16, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(Bicg, A, b, crit, monkeypatch)
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def test_vmem_cgs_pell_matches_generic(monkeypatch):
    """Fused CGS on a GENERAL unstructured (Pell) operator vs the
    generic streaming loop."""
    from ginkgo_tpu.matrix.pell import Pell

    data = _nonsym_tridiag(700)
    A = Pell.from_matrix_data(data)
    b = jnp.asarray(
        np.random.default_rng(4).standard_normal((700, 1)).astype(np.float32)
    )
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]
    for pre in (None, Jacobi.build(max_block_size=1)):
        (xf, inf_f), (xg, inf_g) = _solve_both(
            Cgs, A, b, crit, monkeypatch, precond=pre
        )
        assert int(inf_f.iterations) == int(inf_g.iterations)
        assert bool(inf_f.converged[0])
        r = np.asarray(b) - np.asarray(A.apply(xf))
        assert np.linalg.norm(r) <= 2e-6 * np.linalg.norm(np.asarray(b))
        np.testing.assert_allclose(
            np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
        )

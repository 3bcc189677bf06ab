"""ILU/IC-preconditioned whole-solve fused CG (ops/pallas_cg_ilu.py).

Oracle tier: the fused kernel (interpret mode) must match the generic CG
composed with IluPreconditioner(sweeps triangular solvers) — identical
algorithm, same Jacobi-Richardson trisolve recurrence, reduction orders
differ only inside vs outside the kernel."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.utils import generators
from ginkgo_tpu.matrix.dia import Dia
from ginkgo_tpu.matrix.csr import Csr
from ginkgo_tpu.solver.cg import Cg
from ginkgo_tpu.solver.triangular import LowerTrsFactory, UpperTrsFactory
from ginkgo_tpu.preconditioner.ilu import (
    IluPreconditionerFactory, IcPreconditionerFactory,
)
from ginkgo_tpu.factorization.ilu import IluFactory
from ginkgo_tpu import stop


def _ilu_sweeps_precond(A_csr, sweeps=3):
    fact = IluFactory().generate(A_csr)
    return IluPreconditionerFactory(
        l_solver_factory=LowerTrsFactory(algorithm="sweeps", sweeps=sweeps),
        u_solver_factory=UpperTrsFactory(algorithm="sweeps", sweeps=sweeps),
    ).generate(fact)


@pytest.fixture
def system():
    data = generators.poisson_2d(16, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    A_csr = Csr.from_matrix_data(data)
    b = jnp.ones((data.shape[0], 1), jnp.float32)
    return A, A_csr, b


def test_fused_ilu_cg_matches_generic(system, monkeypatch):
    A, A_csr, b = system
    M = _ilu_sweeps_precond(A_csr)
    crit = [stop.Iteration(300), stop.ResidualNorm(1e-6)]

    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Cg.build(criteria=crit, preconditioner=M).generate(A)
    assert s._try_vmem_fused_ilu(b, jnp.zeros_like(b)) is not None
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Cg.build(criteria=crit, preconditioner=M).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")

    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )
    # and the preconditioner actually helps vs plain CG
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    _, inf_plain = Cg.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) < int(inf_plain.iterations)


def test_fused_ic_cg(system, monkeypatch):
    """IC preconditioner (L then L^T, ic.hpp:107) through the same
    fused path."""
    A, A_csr, b = system
    M = IcPreconditionerFactory(
        l_solver_factory=LowerTrsFactory(algorithm="sweeps", sweeps=3),
    ).generate(A_csr)  # u side mirrors the l factory (sweeps) by design
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Cg.build(
        criteria=[stop.Iteration(300), stop.ResidualNorm(1e-6)],
        preconditioner=M,
    ).generate(A)
    fused = s._try_vmem_fused_ilu(b, jnp.zeros_like(b))
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    assert fused is not None
    xf, inf_f = fused
    r = np.asarray(b).ravel() - np.asarray(A.apply(xf)).ravel()
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-5


def test_fused_ilu_gate_declines(system, monkeypatch):
    A, A_csr, b = system
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    # block_scan (exact) triangular solvers are not in-kernel fusable
    M_exact = IluPreconditionerFactory().generate(IluFactory().generate(A_csr))
    s = Cg.build(
        criteria=[stop.Iteration(5)], preconditioner=M_exact
    ).generate(A)
    assert s._try_vmem_fused_ilu(b, jnp.zeros_like(b)) is None
    # sweep counts beyond the unroll cap decline
    M_many = _ilu_sweeps_precond(A_csr, sweeps=50)
    s2 = Cg.build(
        criteria=[stop.Iteration(5)], preconditioner=M_many
    ).generate(A)
    assert s2._try_vmem_fused_ilu(b, jnp.zeros_like(b)) is None
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")


def test_fused_ilu_iteration_only(system, monkeypatch):
    A, A_csr, b = system
    M = _ilu_sweeps_precond(A_csr)
    crit = [stop.Iteration(15)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Cg.build(criteria=crit, preconditioner=M).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS", raising=False)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, _ = Cg.build(criteria=crit, preconditioner=M).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == 15
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def _convection_diffusion(n_side, eps=0.3):
    """Nonsymmetric banded system (convection-diffusion stencil)."""
    import scipy.sparse as sps

    n = n_side * n_side
    I = sps.eye(n_side)
    T = sps.diags([-1 - eps, 2.0, -1 + eps], [-1, 0, 1],
                  shape=(n_side, n_side))
    S = sps.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n_side, n_side))
    A = (sps.kron(I, T) + sps.kron(S, I)).tocsr()
    co = A.tocoo()
    from ginkgo_tpu.base.matrix_data import MatrixData

    return A, MatrixData.from_coo(
        A.shape, co.row, co.col, co.data.astype(np.float32)
    )


def test_fused_ilu_bicgstab_matches_generic(monkeypatch):
    from ginkgo_tpu.solver.bicgstab import Bicgstab

    sp, data = _convection_diffusion(16)
    A = Dia.from_matrix_data(data)
    A_csr = Csr.from_matrix_data(data)
    b = jnp.ones((sp.shape[0], 1), jnp.float32)
    M = _ilu_sweeps_precond(A_csr)
    crit = [stop.Iteration(300), stop.ResidualNorm(1e-6)]

    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Bicgstab.build(criteria=crit, preconditioner=M).generate(A)
    assert s._try_vmem_fused_ilu(b, jnp.zeros_like(b)) is not None
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Bicgstab.build(
        criteria=crit, preconditioner=M
    ).generate(A).solve(b)
    _, inf_plain = Bicgstab.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")

    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    rf = np.asarray(b).ravel() - sp @ np.asarray(xf).ravel()
    # recurrence residual met 1e-6; the TRUE residual drifts ~5x in f32
    # BiCGSTAB (generic loop shows the same drift)
    assert np.linalg.norm(rf) / np.linalg.norm(np.asarray(b)) < 2e-5
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert int(inf_f.iterations) < int(inf_plain.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-3, atol=1e-3
    )


def test_fused_ilu_cg_multichunk(system, monkeypatch):
    """Multi-chunk coverage for the trisolve staging + sweep loops."""
    A, A_csr, b = system
    M = _ilu_sweeps_precond(A_csr)
    crit = [stop.Iteration(300), stop.ResidualNorm(1e-6)]
    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "2")
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Cg.build(criteria=crit, preconditioner=M).generate(A)
    assert s._try_vmem_fused_ilu(b, jnp.zeros_like(b)) is not None
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.delenv("GINKGO_TPU_CG_CHUNK")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, _ = Cg.build(criteria=crit, preconditioner=M).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )


def test_fused_trs_sweeps_matches_streaming(system, monkeypatch):
    """Standalone fused trisolve (ops/pallas_trs.py): identical result to
    the streaming sweeps loop, on both factors of an ILU."""
    A, A_csr, b = system
    fact = IluFactory().generate(A_csr)
    for factory, factor in (
        (LowerTrsFactory(algorithm="sweeps", sweeps=4), fact.get_l_factor()),
        (UpperTrsFactory(algorithm="sweeps", sweeps=4), fact.get_u_factor()),
    ):
        ts = factory.generate(factor)
        rhs = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (A.shape[0], 2)
            ), jnp.float32
        )
        monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
        fused = ts._try_fused_sweeps(rhs)
        monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
        assert fused is not None
        monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
        stream = ts.apply(rhs)
        monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(stream), rtol=2e-5, atol=2e-5
        )

"""Whole-solve fused IR/Richardson (ops/pallas_ir.py) + fused multigrid
smoother.  Oracle tier: interpret-mode kernels vs the generic loops."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.utils import generators
from ginkgo_tpu.matrix.dia import Dia
from ginkgo_tpu.solver.ir import Ir
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu import stop


@pytest.fixture
def poisson_dia():
    data = generators.poisson_2d(16, dtype=np.float32)
    return Dia.from_matrix_data(data), jnp.ones((data.shape[0], 1), jnp.float32)


def _solve_both(A, b, crit, monkeypatch, precond=None, relax=1.0):
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Ir.build(
        criteria=crit, preconditioner=precond, relaxation_factor=relax
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Ir.build(
        criteria=crit, preconditioner=precond, relaxation_factor=relax
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    return (xf, inf_f), (xg, inf_g)


def test_fused_ir_jacobi_resnorm(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=2000), stop.ResidualNorm(tolerance=1e-5)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        A, b, crit, monkeypatch, precond=Jacobi.build(max_block_size=1),
        relax=0.9,
    )
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        float(inf_f.residual_norm[0]), float(inf_g.residual_norm[0]), rtol=1e-3
    )


def test_fused_ir_iteration_only(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=25)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        A, b, crit, monkeypatch, precond=Jacobi.build(max_block_size=1),
        relax=0.8,
    )
    assert int(inf_f.iterations) == 25 == int(inf_g.iterations)
    assert not bool(inf_f.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-6, atol=2e-6
    )


def test_fused_ir_identity_inner(poisson_dia, monkeypatch):
    """No inner solver (plain Richardson on a scaled operator so it
    converges): omega rides the SMEM scalar, use_minv=False path."""
    data = generators.poisson_2d(16, dtype=np.float32)
    A = Dia.from_matrix_data(data).scale(0.2)  # rho(I - 0.5 A) < 1
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=3000), stop.ResidualNorm(tolerance=1e-5)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch, relax=0.5)
    # ~1700 slow Richardson sweeps: f32 reduction-order drift can move the
    # stopping crossing by a couple of iterations — bound, don't equate
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 5
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def test_fused_ir_declines_implicit_and_multirhs(poisson_dia, monkeypatch):
    A, b = poisson_dia
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    solver = Ir.build(
        criteria=[stop.Iteration(max_iters=10),
                  stop.ImplicitResidualNorm(tolerance=1e-6)],
        preconditioner=Jacobi.build(max_block_size=1),
    ).generate(A)
    assert solver._try_vmem_fused(b, jnp.zeros_like(b)) is None
    solver2 = Ir.build(
        criteria=[stop.Iteration(max_iters=10)],
        preconditioner=Jacobi.build(max_block_size=1),
    ).generate(A)
    b2 = jnp.ones((A.shape[0], 2), jnp.float32)
    assert solver2._try_vmem_fused(b2, jnp.zeros_like(b2)) is None


def test_fused_smoother_matches_generic(poisson_dia, monkeypatch):
    """FixedSmoother fused path (kernel, x0_zero + with_residual variants)
    vs the bare fori_loop."""
    from ginkgo_tpu.solver.multigrid import _fixed_smoother

    A, b = poisson_dia
    for iters in (1, 3):
        sm = _fixed_smoother(A, iters=iters, relax=0.9)
        monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
        x_gen, _ = sm.solve(b)
        xg2, rg2 = sm.solve_with_residual(b, x0=0.25 * b)
        monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
        monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
        x_fus, _ = sm.solve(b)
        xf2, rf2 = sm.solve_with_residual(b, x0=0.25 * b)
        monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
        np.testing.assert_allclose(
            np.asarray(x_fus), np.asarray(x_gen), rtol=2e-6, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(xf2), np.asarray(xg2), rtol=2e-6, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(rf2), np.asarray(rg2), rtol=2e-6, atol=2e-5
        )
        # residual really is b - A x
        want = np.asarray(b) - np.asarray(A.apply(jnp.asarray(xf2)))
        np.testing.assert_allclose(
            np.asarray(rf2), want, rtol=2e-6, atol=2e-5
        )


def test_fused_smoother_1d_rhs(poisson_dia, monkeypatch):
    from ginkgo_tpu.solver.multigrid import _fixed_smoother

    A, b = poisson_dia
    sm = _fixed_smoother(A, iters=2, relax=0.9)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    x1, _ = sm.solve(b[:, 0])
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    x2, _ = sm.solve(b[:, 0])
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert x1.shape == x2.shape == (A.shape[0],)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2),
                               rtol=2e-6, atol=2e-6)


def test_multigrid_cycle_with_fused_smoothers(monkeypatch):
    """End-to-end V-cycle solve: fused smoothers (with the in-kernel
    residual feeding restriction) vs the all-generic cycle."""
    from ginkgo_tpu.solver.multigrid import MultigridFactory

    data = generators.poisson_2d(32, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=30), stop.ResidualNorm(tolerance=1e-5)]

    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    mg_g = MultigridFactory(criteria=crit).generate(A)
    xg, inf_g = mg_g.solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")

    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    mg_f = MultigridFactory(criteria=crit).generate(A)
    xf, inf_f = mg_f.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")

    assert int(inf_f.iterations) == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=5e-5, atol=5e-5
    )


def test_vmem_ir_pell_matches_generic(monkeypatch):
    """Fused Richardson/IR on a GENERAL unstructured (Pell) operator vs
    the generic streaming loop (scalar-Jacobi inner solver)."""
    import numpy as np
    import jax.numpy as jnp

    from ginkgo_tpu.matrix.pell import Pell
    from ginkgo_tpu.preconditioner.jacobi import Jacobi
    from ginkgo_tpu.solver.ir import Ir
    from ginkgo_tpu import stop
    from tests.conftest import nonsym_tridiag

    data = nonsym_tridiag(700)
    A = Pell.from_matrix_data(data)
    b = jnp.asarray(
        np.random.default_rng(6).standard_normal((700, 1)).astype(np.float32)
    )
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Ir.build(
        criteria=crit, preconditioner=Jacobi.build(max_block_size=1),
        relaxation_factor=0.9,
    ).generate(A)
    assert s._try_vmem_fused(b, jnp.zeros_like(b)) is not None
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Ir.build(
        criteria=crit, preconditioner=Jacobi.build(max_block_size=1),
        relaxation_factor=0.9,
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0])
    r = np.asarray(b) - np.asarray(A.apply(xf))
    assert np.linalg.norm(r) <= 2e-6 * np.linalg.norm(np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )

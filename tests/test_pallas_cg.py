"""Whole-solve-in-VMEM fused CG (ops/pallas_cg.py, solver/cg.py fast path).

Oracle tier (SURVEY §4 tier 2/3 analog): the fused kernel runs in
interpreter mode on CPU and must match the generic `lax.while_loop` CG
to f32 round-off (same update order; reduction orders differ inside vs
outside the kernel) with identical iteration counts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ginkgo_tpu.utils import generators
from ginkgo_tpu.matrix.dia import Dia
from ginkgo_tpu.solver.cg import Cg
from ginkgo_tpu.preconditioner.jacobi import Jacobi
from ginkgo_tpu import stop


@pytest.fixture
def poisson_dia():
    data = generators.poisson_2d(16, dtype=np.float32)
    return Dia.from_matrix_data(data), jnp.ones((data.shape[0], 1), jnp.float32)


def _solve_both(A, b, crit, monkeypatch, precond=None):
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    fac = Cg.build(criteria=crit, preconditioner=precond)
    x_fast, info_fast = fac.generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    x_gen, info_gen = Cg.build(criteria=crit, preconditioner=precond).generate(
        A
    ).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    return (x_fast, info_fast), (x_gen, info_gen)


def test_vmem_cg_matches_generic_resnorm(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch)
    assert int(inf_f.iterations) == int(inf_g.iterations)
    # parity is f32-roundoff-level (different reduction orders inside vs
    # outside the Pallas kernel), with identical iteration counts
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-6, atol=2e-5
    )
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        float(inf_f.residual_norm[0]), float(inf_g.residual_norm[0]), rtol=1e-3
    )


def test_vmem_cg_matches_generic_implicit(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=500), stop.ImplicitResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-5, atol=1e-7
    )
    assert bool(inf_f.converged[0])
    assert not np.isfinite(float(inf_f.residual_norm[0]))  # generic parity


def test_vmem_cg_iteration_only(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=30)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch)
    assert int(inf_f.iterations) == 30 == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-6, atol=2e-5
    )
    assert not bool(inf_f.converged[0])


def test_vmem_cg_scalar_jacobi(poisson_dia, monkeypatch):
    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        A, b, crit, monkeypatch, precond=Jacobi.build(max_block_size=1)
    )
    assert int(inf_f.iterations) == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-6, atol=1e-8
    )


def test_vmem_cg_initial_guess(poisson_dia, monkeypatch):
    A, b = poisson_dia
    x0 = jnp.full_like(b, 0.5)
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Cg.build(criteria=crit).generate(A).solve(b, x0)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    Ad = np.asarray(A.to_dense().values)
    res = np.linalg.norm(np.asarray(b)[:, 0] - Ad @ np.asarray(xf)[:, 0])
    assert res <= 1e-5 * np.linalg.norm(np.asarray(b))
    assert bool(inf_f.converged[0])


def test_vmem_cg_multichunk_and_store_q(monkeypatch):
    """Cover the chunked in-kernel loops (R not a multiple of the chunk
    forces several chunks) and the store_q=False recompute variant."""
    from ginkgo_tpu.ops.pallas_cg import cg_vmem_solve

    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "2")
    data = generators.poisson_2d(48, dtype=np.float32)  # R=18 -> 9 chunks
    A = Dia.from_matrix_data(data)
    n = data.shape[0]
    R = A.diags.shape[1]
    bp = np.zeros((R * 128,), np.float32)
    bp[:n] = 1.0
    r0 = jnp.asarray(bp.reshape(R, 128))
    x0 = jnp.zeros((R, 128), jnp.float32)
    tol_sq = (1e-6 * np.sqrt(n)) ** 2
    xs, its, _, _ = cg_vmem_solve(
        A.diags, A.offsets, r0, x0, None, tol_sq_eff=tol_sq, max_iters=300,
        store_q=True, interpret=True,
    )
    xn, itn, _, _ = cg_vmem_solve(
        A.diags, A.offsets, r0, x0, None, tol_sq_eff=tol_sq, max_iters=300,
        store_q=False, interpret=True,
    )
    assert int(its) == int(itn)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(xn))  # same kernel
    # against the generic solver
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, infog = Cg.build(
        criteria=[stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-6)]
    ).generate(A).solve(jnp.ones((n, 1), jnp.float32))
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(infog.iterations) == int(its)
    # chunked partial sums reorder the dot reductions vs jnp.sum's tree,
    # so multi-chunk parity is tight-allclose rather than bit-exact
    np.testing.assert_allclose(
        np.asarray(xs).reshape(-1)[:n], np.asarray(xg)[:, 0],
        rtol=2e-6, atol=2e-4,
    )


def test_vmem_cg_declines_unsupported(poisson_dia, monkeypatch):
    """>8-column RHS, custom criteria, non-Dia operators must fall back
    (2-8 columns ride the k-RHS kernel, cg_vmem_solve_multi)."""
    A, b = poisson_dia
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    solver = Cg.build(
        criteria=[stop.Iteration(max_iters=50), stop.ResidualNorm(tolerance=1e-6)]
    ).generate(A)
    assert solver._try_vmem_fused(jnp.ones((A.shape[0], 9), jnp.float32),
                                  jnp.zeros((A.shape[0], 9), jnp.float32)) is None

    class Weird(stop.Criterion):
        def check(self, ctx):
            return jnp.zeros((ctx["num_cols"],), dtype=bool)

    weird = Cg.build(criteria=[stop.Iteration(max_iters=5), Weird()]).generate(A)
    assert weird._try_vmem_fused(b, jnp.zeros_like(b)) is None

    csr_solver = Cg.build(
        criteria=[stop.Iteration(max_iters=5)]
    ).generate(A.to_csr())
    assert csr_solver._try_vmem_fused(b, jnp.zeros_like(b)) is None


def test_vmem_bicgstab_matches_generic(poisson_dia, monkeypatch):
    """Fused whole-solve BiCGSTAB (ops/pallas_bicgstab.py) vs the generic
    loop: identical iteration counts, f32-roundoff agreement; diagonal
    preconditioning folded into the operator."""
    from ginkgo_tpu.solver.bicgstab import Bicgstab

    A, b = poisson_dia
    for pre in (None, Jacobi.build(max_block_size=1)):
        crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
        monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
        xf, inf_f = Bicgstab.build(criteria=crit, preconditioner=pre).generate(
            A
        ).solve(b)
        monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
        monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
        xg, inf_g = Bicgstab.build(criteria=crit, preconditioner=pre).generate(
            A
        ).solve(b)
        monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
        assert int(inf_f.iterations) == int(inf_g.iterations)
        assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
        np.testing.assert_allclose(
            np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
        )


def test_vmem_bicgstab_iteration_only(poisson_dia, monkeypatch):
    from ginkgo_tpu.solver.bicgstab import Bicgstab

    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=15)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Bicgstab.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Bicgstab.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == 15 == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def test_vmem_fcg_matches_generic(poisson_dia, monkeypatch):
    """FCG rides the fused CG kernel with flexible=True (the
    Polak-Ribiere numerator as a third reduction in the update pass) and
    must match the generic Fcg loop iteration-for-iteration."""
    from ginkgo_tpu.solver.cg import Fcg

    A, b = poisson_dia
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Fcg.build(criteria=crit).generate(A)
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Fcg.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )


def test_vmem_fcg_pell(monkeypatch):
    from ginkgo_tpu.solver.cg import Fcg
    from ginkgo_tpu.matrix.pell import Pell
    from ginkgo_tpu.utils import generators as gen

    data = gen.poisson_2d(16, dtype=np.float32)
    A = Pell.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Fcg.build(criteria=crit).generate(A)
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Fcg.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )


def _multi_rhs(A, k=3, scales=(1.0, 50.0, 1e-3)):
    n = A.shape[0]
    rng = np.random.default_rng(11)
    cols = rng.standard_normal((n, k)).astype(np.float32)
    return jnp.asarray(cols * np.asarray(scales[:k], np.float32))


def test_vmem_cg_multi_rhs_matches_generic(poisson_dia, monkeypatch):
    """k-RHS fused kernel with per-column stopping vs the generic
    column-masked loop: same iteration count, per-column converged
    masks, and solutions (columns scaled so they converge at different
    iterations under the rhs_norm baseline... identical here; the
    absolute baseline below forces genuinely different stop times)."""
    A, _ = poisson_dia
    b = _multi_rhs(A)
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch)
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert np.array_equal(
        np.asarray(inf_f.converged), np.asarray(inf_g.converged)
    )
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(inf_f.residual_norm),
        np.asarray(inf_g.residual_norm),
        rtol=1e-3,
    )


def test_vmem_cg_multi_rhs_percolumn_stopping(poisson_dia, monkeypatch):
    """Absolute-baseline stop: the 50x column needs more iterations than
    the 1e-3x column, so the kernel's per-column freeze is exercised —
    every column must still land below the absolute threshold."""
    A, _ = poisson_dia
    b = _multi_rhs(A)
    crit = [
        stop.Iteration(max_iters=800),
        stop.ResidualNorm(tolerance=1e-5, baseline="absolute"),
    ]
    (xf, inf_f), (xg, inf_g) = _solve_both(A, b, crit, monkeypatch)
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert np.array_equal(
        np.asarray(inf_f.converged), np.asarray(inf_g.converged)
    )
    assert bool(np.all(np.asarray(inf_f.converged)))
    # true per-column residuals honor the absolute tolerance up to the
    # f32 recurrence drift (the 50x column solves to ~1e-8 RELATIVE,
    # well past the f32 floor, so its true residual stalls above the
    # recurrence value — same behavior as the generic loop)
    r = np.asarray(b) - np.asarray(A.apply(xf))
    scale = np.maximum(np.linalg.norm(np.asarray(b), axis=0), 1.0)
    assert float((np.linalg.norm(r, axis=0) / scale).max()) < 1e-5
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )


@pytest.mark.parametrize("solver_name", ["Cg", "Bicgstab", "Gmres"])
def test_krhs_seeded_stopped_columns(solver_name, poisson_dia, monkeypatch):
    """VERDICT r2 #9 — the reference's deliberately-seeded extreme
    (test/solver/cg_kernels.cpp:55-120, stopping_status.hpp:62-145): one
    column converged at iteration ~1 (tiny absolute rhs), one NEVER
    (huge rhs vs an absolute tolerance).  The k-RHS fused kernel must
    freeze/flag per column exactly as the streaming loop does."""
    import ginkgo_tpu as gko

    solver_cls = getattr(gko, solver_name)
    A, _ = poisson_dia
    n = A.shape[0]
    rng = np.random.default_rng(42)
    b = np.empty((n, 2), np.float32)
    b[:, 0] = rng.standard_normal(n) * 1e-7   # below tol at iteration ~1
    b[:, 1] = rng.standard_normal(n) * 1e6    # unreachable in max_iters
    b = jnp.asarray(b)
    crit = [
        stop.Iteration(max_iters=40),
        stop.ResidualNorm(tolerance=1e-5, baseline="absolute"),
    ]
    kw = {"krylov_dim": 10} if solver_name == "Gmres" else {}
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = solver_cls.build(criteria=crit, **kw).generate(A)
    # the k-RHS fused kernel must actually take this solve
    assert s._try_vmem_fused_multi(b, jnp.zeros_like(b)) is not None
    xf, inf_f = s.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = solver_cls.build(criteria=crit, **kw).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    for inf in (inf_f, inf_g):
        conv = np.asarray(inf.converged)
        assert bool(conv[0]) and not bool(conv[1]), (solver_name, conv)
        assert int(inf.iterations) == 40  # the live column ran them all
    np.testing.assert_array_equal(
        np.asarray(inf_f.converged), np.asarray(inf_g.converged)
    )
    # the frozen column's solution must be identical stream vs fused
    # (frozen means UNTOUCHED after its stop iteration)
    np.testing.assert_allclose(
        np.asarray(xf[:, 0]), np.asarray(xg[:, 0]), rtol=2e-5, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(xf[:, 1]), np.asarray(xg[:, 1]), rtol=2e-4,
        atol=2e-4 * 1e6,
    )


def test_vmem_cg_multi_rhs_jacobi_and_iteronly(poisson_dia, monkeypatch):
    A, _ = poisson_dia
    b = _multi_rhs(A, k=2, scales=(1.0, 7.0))
    crit = [stop.Iteration(max_iters=25)]
    (xf, inf_f), (xg, inf_g) = _solve_both(
        A, b, crit, monkeypatch, precond=Jacobi.build(max_block_size=1)
    )
    assert int(inf_f.iterations) == 25 == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )
    assert not bool(np.any(np.asarray(inf_f.converged)))


def test_vmem_fcg_multi_rhs(poisson_dia, monkeypatch):
    from ginkgo_tpu.solver.cg import Fcg

    A, _ = poisson_dia
    b = _multi_rhs(A, k=2, scales=(1.0, 3.0))
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Fcg.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Fcg.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-5, atol=2e-4
    )


def test_vmem_cg_multi_rhs_multichunk(monkeypatch):
    """Force small chunks so the k-RHS kernel's chunked fori paths and
    the store_q=False recompute branch are both covered."""
    from ginkgo_tpu.ops.pallas_cg import cg_vmem_solve_multi
    from ginkgo_tpu.solver._fused_gate import frame_cols, unframe_cols

    data = generators.poisson_2d(12, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    n = A.shape[0]
    b = _multi_rhs(A, k=2, scales=(1.0, 2.0))
    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "1")
    R = A.diags.shape[1]
    r0_3 = frame_cols(b, R)
    x0_3 = jnp.zeros_like(r0_3)
    outs = {}
    for sq in (True, False):
        x3, it, mon, conv, itc = cg_vmem_solve_multi(
            A.diags, A.offsets, r0_3, x0_3, None,
            tol_sq_eff=jnp.full((2,), 1e-12, jnp.float32),
            max_iters=400, store_q=sq, interpret=True,
        )
        outs[sq] = np.asarray(unframe_cols(x3, n))
        assert bool(np.all(np.asarray(conv)))
        assert int(np.asarray(itc).max()) == int(it)
    monkeypatch.delenv("GINKGO_TPU_CG_CHUNK")
    x_ref = np.asarray(unframe_cols(x3, n))
    r = np.asarray(b) - np.asarray(A.apply(jnp.asarray(outs[True])))
    assert float(np.linalg.norm(r, axis=0).max()) < 1e-4
    np.testing.assert_allclose(outs[True], outs[False], rtol=3e-5, atol=3e-5)


def test_vmem_bicgstab_multi_rhs_matches_generic(poisson_dia, monkeypatch):
    from ginkgo_tpu.solver.bicgstab import Bicgstab

    A, _ = poisson_dia
    b = _multi_rhs(A, k=3, scales=(1.0, 20.0, 0.05))
    crit = [stop.Iteration(max_iters=600), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Bicgstab.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Bicgstab.build(criteria=crit).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert np.array_equal(
        np.asarray(inf_f.converged), np.asarray(inf_g.converged)
    )
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-4, atol=2e-4
    )


def test_vmem_bicgstab_multi_rhs_percolumn_jacobi(poisson_dia, monkeypatch):
    """Absolute baseline + scalar Jacobi: columns stop at different
    iterations; every column's true residual lands near its threshold."""
    from ginkgo_tpu.solver.bicgstab import Bicgstab

    A, _ = poisson_dia
    b = _multi_rhs(A, k=3, scales=(1.0, 20.0, 0.05))
    crit = [
        stop.Iteration(max_iters=900),
        stop.ResidualNorm(tolerance=1e-5, baseline="absolute"),
    ]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Bicgstab.build(
        criteria=crit, preconditioner=Jacobi.build(max_block_size=1)
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Bicgstab.build(
        criteria=crit, preconditioner=Jacobi.build(max_block_size=1)
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    # the 20x column converges ~3 orders past its f32 relative floor, so
    # the in-kernel chunked reductions can flip the last stop test by one
    # iteration vs jnp's tree sums — allow +-1, demand the same masks
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 1
    assert np.array_equal(
        np.asarray(inf_f.converged), np.asarray(inf_g.converged)
    )
    assert bool(np.all(np.asarray(inf_f.converged)))
    r = np.asarray(b) - np.asarray(A.apply(xf))
    scale = np.maximum(np.linalg.norm(np.asarray(b), axis=0), 1.0)
    assert float((np.linalg.norm(r, axis=0) / scale).max()) < 1e-5
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-4, atol=2e-4
    )


def test_reduced_storage_solve_stays_f32_and_fused(poisson_dia, monkeypatch):
    """BENCH r3 regression: solve() on a reduce_storage (bf16-storage)
    operator must NOT downcast the solve to bf16 — storage reduction is
    an accessor concept with f32 accumulation.  The fused kernel must
    engage through the public solve() even under an enclosing user jit,
    and the result dtype is the caller's."""
    from ginkgo_tpu.log.logger import (
        Counters, add_global_logger, remove_global_logger,
    )

    A, b = poisson_dia
    A16 = A.reduce_storage()
    assert A16.diags.dtype == jnp.bfloat16
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    s = Cg.build(criteria=[stop.Iteration(max_iters=30)]).generate(A16)
    c = Counters()
    add_global_logger(c)
    try:
        @jax.jit
        def run(rhs):
            x, info = s.solve(rhs)
            return x

        x = run(b)
    finally:
        remove_global_logger(c)
    assert x.dtype == jnp.float32
    assert c.kernel_counts.get("cg_vmem_solve", 0) >= 1, dict(c.kernel_counts)
    # numerics match the f32-operator fused solve to bf16-storage error
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    x_ref, _ = Cg.build(
        criteria=[stop.Iteration(max_iters=30)]
    ).generate(A).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=2e-2, atol=2e-2
    )

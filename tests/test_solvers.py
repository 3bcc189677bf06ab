"""Solver tests vs scipy/numpy oracles (reference model: reference/test/solver
+ test/solver comparison tier; tolerances follow r<T>::value scaling)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla
import jax
import jax.numpy as jnp

import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.utils import generators


def poisson_system(n=10, k=2, dtype=np.float64, rng=None):
    rng = rng or np.random.default_rng(7)
    data = generators.poisson_2d(n).astype(dtype)
    A = gko.Csr.from_matrix_data(data)
    x_true = rng.standard_normal((n * n, k)).astype(dtype)
    b = np.asarray(A.apply(x_true))
    return A, x_true, b


def spd_random_system(n=40, k=2, dtype=np.float64, rng=None):
    rng = rng or np.random.default_rng(3)
    data = generators.make_spd(
        generators.generate_random_matrix(n, n, 2, 6, rng, dtype=dtype)
    )
    A = gko.Csr.from_matrix_data(data)
    x_true = rng.standard_normal((n, k)).astype(dtype)
    b = np.asarray(A.apply(x_true))
    return A, x_true, b


def test_cg_poisson_converges():
    A, x_true, b = poisson_system()
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)
    assert int(info.iterations) < 500


def test_cg_respects_iteration_limit():
    A, x_true, b = poisson_system()
    solver = gko.Cg.build(criteria=[stop.Iteration(max_iters=3)]).generate(A)
    x, info = solver.solve(b)
    assert int(info.iterations) == 3


def test_cg_multirhs_column_masking():
    """Columns converge independently; an already-solved column stays put
    (the stopped-column edge case seeded in test/solver/cg_kernels.cpp)."""
    A, x_true, b = poisson_system(k=3)
    b = b.copy()
    b[:, 1] = 0.0  # column 1: exact solution x=0 at iteration 0
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x)[:, 1], 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x)[:, 0], x_true[:, 0], rtol=1e-7, atol=1e-8)


def test_cg_with_scalar_jacobi():
    A, x_true, b = spd_random_system()
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-12)],
        preconditioner=gko.Jacobi.build(max_block_size=1),
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-8)


def test_cg_with_block_jacobi_converges_faster():
    A, x_true, b = spd_random_system(n=60)
    crit = [stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-12)]
    plain = gko.Cg.build(criteria=crit).generate(A)
    blocked = gko.Cg.build(
        criteria=crit, preconditioner=gko.Jacobi.build(max_block_size=4)
    ).generate(A)
    _, info_p = plain.solve(b)
    x, info_b = blocked.solve(b)
    assert bool(np.all(np.asarray(info_b.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)
    assert int(info_b.iterations) <= int(info_p.iterations)


def test_cg_implicit_residual_criterion():
    A, x_true, b = poisson_system()
    solver = gko.Cg.build(
        criteria=[
            stop.Iteration(max_iters=500),
            stop.ImplicitResidualNorm(tolerance=1e-12),
        ]
    ).generate(A)
    x, info = solver.solve(b)
    res = b - np.asarray(A.apply(x))
    assert np.linalg.norm(res) / np.linalg.norm(b) < 1e-9


def test_cg_history_tracking():
    A, x_true, b = poisson_system(k=1)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=50), stop.ResidualNorm(tolerance=1e-12)],
        track_history=True,
    ).generate(A)
    x, info = solver.solve(b)
    h = np.asarray(info.history)
    it = int(info.iterations)
    assert h.shape[0] == 50
    # monotone-ish decay on SPD problem: final << first
    assert h[it - 1, 0] < h[0, 0] * 1e-6


def test_fcg_converges():
    A, x_true, b = spd_random_system()
    solver = gko.Fcg.build(
        criteria=[stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-8)


def test_ir_with_jacobi_inner():
    A, x_true, b = spd_random_system(n=30)
    solver = gko.Ir.build(
        criteria=[stop.Iteration(max_iters=2000), stop.ResidualNorm(tolerance=1e-10)],
        preconditioner=gko.Jacobi.build(max_block_size=1),
        relaxation_factor=0.9,
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-5, atol=1e-6)


def test_solver_is_jittable_pytree():
    A, x_true, b = poisson_system(n=6, k=1)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)

    @jax.jit
    def run(s, rhs):
        x, info = s.solve(rhs)
        return x, info.iterations

    x, iters = run(solver, b)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)


def test_solve_chunked_time_and_logging():
    A, x_true, b = poisson_system(n=8, k=1)
    conv = gko.log.Convergence()
    solver = gko.Cg.build(
        criteria=[
            stop.Iteration(max_iters=400),
            stop.Time(60.0),
            stop.ResidualNorm(tolerance=1e-12),
        ]
    ).generate(A)
    x, info = solver.solve_chunked(b, chunk=10, loggers=[conv])
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)
    assert conv.num_iterations > 0
    assert conv.has_converged


def test_apply_initial_guess():
    A, x_true, b = poisson_system(k=1)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)
    # start from the exact solution: should converge immediately
    x, info = solver.solve(b, x0=x_true)
    assert int(info.iterations) <= 1


# -- block jacobi unit behavior -------------------------------------------------


def test_block_jacobi_matches_dense_blockinv(rng):
    data = generators.make_spd(generators.generate_random_matrix(12, 12, 2, 5, rng))
    A = gko.Csr.from_matrix_data(data)
    ptrs = np.array([0, 3, 5, 9, 12])
    M = gko.Jacobi.build(max_block_size=4, block_pointers=ptrs).generate(A)
    dense = data.to_dense()
    expected = np.zeros_like(dense)
    for i in range(len(ptrs) - 1):
        s, e = ptrs[i], ptrs[i + 1]
        expected[s:e, s:e] = np.linalg.inv(dense[s:e, s:e])
    r = rng.standard_normal((12, 2))
    np.testing.assert_allclose(np.asarray(M.apply(r)), expected @ r, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(M.to_dense().values), expected, rtol=1e-10
    )


def test_block_jacobi_adaptive_storage(rng):
    data = generators.make_spd(generators.generate_random_matrix(16, 16, 2, 5, rng))
    A = gko.Csr.from_matrix_data(data)
    exact = gko.Jacobi.build(max_block_size=4).generate(A)
    reduced = gko.Jacobi.build(
        max_block_size=4,
        storage_optimization=gko.precision_reduction(0, 1),
    ).generate(A)
    assert reduced.inv_blocks.dtype in (jnp.bfloat16, jnp.float32)
    r = rng.standard_normal((16, 1))
    ye = np.asarray(exact.apply(r))
    yr = np.asarray(reduced.apply(r))
    # bf16 storage: ~3 decimal digits
    np.testing.assert_allclose(yr, ye, rtol=3e-2, atol=3e-2)


def test_find_natural_blocks_caps_size(rng):
    data = generators.poisson_1d(20)
    A = gko.Csr.from_matrix_data(data)
    ptrs = gko.preconditioner.find_natural_blocks(A, 4)
    sizes = np.diff(ptrs)
    assert sizes.max() <= 4 and ptrs[0] == 0 and ptrs[-1] == 20


# -- precision_dispatch (base/precision_dispatch.py) ---------------------------


def test_precision_dispatch_apply():
    """f32 operator applied to f64 vectors computes in f32 and returns
    f64 (precision_dispatch.hpp semantics)."""
    import ginkgo_tpu as gko
    from ginkgo_tpu.matrix.csr import Csr
    from ginkgo_tpu.utils import generators

    data = generators.poisson_2d(8, dtype=np.float32)
    A = Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[1],), jnp.float64)
    y = gko.precision_dispatch(A.apply, A.dtype, b)
    assert y.dtype == jnp.float64
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(A.apply(b.astype(jnp.float32))), rtol=1e-6
    )
    # real operator x complex vectors: per-part dispatch
    bc = b + 1j * (2.0 * b)
    yc = gko.precision_dispatch(A.apply, A.dtype, bc)
    assert jnp.issubdtype(yc.dtype, jnp.complexfloating)
    np.testing.assert_allclose(np.asarray(yc.real), np.asarray(y), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(yc.imag), 2.0 * np.asarray(y), rtol=1e-6
    )


def test_solver_auto_precision_dispatch():
    """Solving with f64 b on an f32 operator runs the solve in f32 and
    returns f64 x (automatic conversion at the solve boundary)."""
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.solver.cg import Cg
    from ginkgo_tpu import stop
    from ginkgo_tpu.utils import generators

    data = generators.poisson_2d(12, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    assert A.dtype == jnp.float32
    b64 = jnp.ones((A.shape[0], 1), jnp.float64)
    x, info = Cg.build(
        criteria=[stop.Iteration(max_iters=300),
                  stop.ResidualNorm(tolerance=1e-6)]
    ).generate(A).solve(b64)
    assert x.dtype == jnp.float64
    assert bool(info.converged[0])
    r = np.asarray(b64)[:, 0] - np.asarray(A.to_dense().values) @ np.asarray(
        x
    )[:, 0]
    assert np.linalg.norm(r) <= 1e-4  # f32 compute accuracy

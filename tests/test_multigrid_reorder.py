"""Multigrid (PGM, FixedCoarsening, V/W/F cycles) and reordering (RCM,
ScaledReordered) tests (reference model: reference/test/multigrid,
core/test/reorder)."""

import numpy as np
import pytest
import scipy.sparse as sps

import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.multigrid import Pgm, FixedCoarsening
from ginkgo_tpu.reorder import Rcm, RcmFactory, rcm_permutation, bandwidth, ScaledReorderedFactory
from ginkgo_tpu.solver.multigrid import MultigridFactory
from ginkgo_tpu.utils import generators


def test_pgm_aggregation_properties(rng):
    data = generators.poisson_2d(8)
    A = gko.Csr.from_matrix_data(data)
    level = Pgm().generate(A)
    n = data.shape[0]
    nc = level.coarse_op.shape[0]
    assert 0 < nc < n  # coarsened
    assert nc >= n // 4  # size-2 matching halves at most... allow slack
    # galerkin property: Ac == R A P
    agg = np.asarray(level.restrict_op.agg)
    P = np.zeros((n, nc))
    P[np.arange(n), agg] = 1
    expected = P.T @ data.to_dense() @ P
    np.testing.assert_allclose(
        np.asarray(level.coarse_op.to_dense().values), expected, rtol=1e-12
    )
    # restrict/prolong ops match P
    x = rng.standard_normal((nc, 2))
    np.testing.assert_allclose(np.asarray(level.prolong_op.apply(x)), P @ x)
    y = rng.standard_normal((n, 2))
    np.testing.assert_allclose(np.asarray(level.restrict_op.apply(y)), P.T @ y)


def test_fixed_coarsening(rng):
    data = generators.poisson_1d(16)
    A = gko.Csr.from_matrix_data(data)
    rows = np.arange(0, 16, 2)
    level = FixedCoarsening(rows).generate(A)
    assert level.coarse_op.shape == (8, 8)
    x = rng.standard_normal(8)
    full = np.asarray(level.prolong_op.apply(x))
    assert np.allclose(full[rows], x) and np.allclose(np.delete(full, rows), 0)


@pytest.mark.parametrize("cycle", ["v", "w", "f", "k"])
def test_multigrid_solves_poisson(rng, cycle):
    data = generators.poisson_2d(16)  # 256 dofs, 3+ levels
    A = gko.Csr.from_matrix_data(data)
    x_true = rng.standard_normal((data.shape[0], 1))
    b = data.to_dense() @ x_true
    solver = MultigridFactory(
        criteria=[stop.Iteration(max_iters=60), stop.ResidualNorm(tolerance=1e-10)],
        min_coarse_rows=16,
        cycle=cycle,
    ).generate(A)
    assert len(solver.levels) >= 2
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged))), cycle
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)


def test_multigrid_preconditioned_cg(rng):
    data = generators.poisson_2d(16)
    A = gko.Csr.from_matrix_data(data)
    x_true = rng.standard_normal((data.shape[0], 1))
    b = data.to_dense() @ x_true
    crit = [stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-10)]
    mg_factory = MultigridFactory(
        criteria=[stop.Iteration(max_iters=1)], min_coarse_rows=16
    )
    plain = gko.Cg.build(criteria=crit).generate(A)
    precond = gko.Cg.build(criteria=crit, preconditioner=mg_factory).generate(A)
    _, ip = plain.solve(b)
    x, im = precond.solve(b)
    assert bool(np.all(np.asarray(im.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)
    assert int(im.iterations) < int(ip.iterations)  # MG accelerates CG


@pytest.mark.parametrize(
    "kw",
    [
        {"kcycle_rel_tol": float("nan")},  # always two FCG iterations
        {"kcycle_rel_tol": -1.0},          # always one FCG iteration
        {"kcycle_base": 2},                # accelerate every other level
    ],
)
def test_kcycle_variants_solve(rng, kw):
    """The working K-cycle (reference declares kcycle_base/kcycle_rel_tol
    and the kcycle_step kernels but never wires them in v1.5.0): every
    second-iteration policy converges on Poisson."""
    data = generators.poisson_2d(16)
    A = gko.Csr.from_matrix_data(data)
    x_true = rng.standard_normal((data.shape[0], 1))
    b = data.to_dense() @ x_true
    solver = MultigridFactory(
        criteria=[stop.Iteration(max_iters=60), stop.ResidualNorm(tolerance=1e-10)],
        min_coarse_rows=16,
        cycle="k",
        **kw,
    ).generate(A)
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged))), kw
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-7)


def test_kcycle_accelerates_vs_v(rng):
    """On a deeper hierarchy the FCG-accelerated coarse correction should
    not converge slower than the plain V-cycle (that is its purpose —
    Notay's K-cycle bounds the condition of aggressive coarsening)."""
    data = generators.poisson_2d(24)
    A = gko.Csr.from_matrix_data(data)
    b = rng.standard_normal((data.shape[0], 1))
    crit = [stop.Iteration(max_iters=120), stop.ResidualNorm(tolerance=1e-9)]
    its = {}
    for cyc in ("v", "k"):
        s = MultigridFactory(
            criteria=crit, min_coarse_rows=9, cycle=cyc
        ).generate(A)
        x, info = s.solve(b)
        assert bool(np.all(np.asarray(info.converged))), cyc
        its[cyc] = int(info.iterations)
    assert its["k"] <= its["v"] + 1, its


def test_multigrid_convergence_rate(rng):
    # plain-aggregation AMG: expect a bounded per-cycle contraction factor
    # (PGM is unsmoothed aggregation — factors ~0.5-0.7 are nominal; the
    # reference uses it mostly as a preconditioner)
    data = generators.poisson_2d(20)
    A = gko.Csr.from_matrix_data(data)
    b = rng.standard_normal((data.shape[0], 1))
    solver = MultigridFactory(
        criteria=[stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-9)],
        min_coarse_rows=25,
        smoother_iters=2,
    ).generate(A)
    # decent coarsening: each level at most ~0.65 of the previous
    sizes = [l.fine_op.shape[0] for l in solver.levels] + [
        solver.levels[-1].coarse_op.shape[0]
    ]
    for a, c in zip(sizes, sizes[1:]):
        assert c <= 0.7 * a, sizes
    x, info = solver.solve(b)
    assert bool(np.all(np.asarray(info.converged)))


# -- RCM ------------------------------------------------------------------------


@pytest.mark.parametrize("strategy", ["pseudo_peripheral", "minimum_degree"])
def test_rcm_reduces_bandwidth(rng, strategy):
    # random sparse symmetric matrix with scattered entries
    data = generators.generate_random_matrix(60, 60, 2, 4, rng)
    sym = gko.MatrixData.from_dense(
        data.to_dense() + data.to_dense().T + 10 * np.eye(60)
    )
    A = gko.Csr.from_matrix_data(sym)
    perm = RcmFactory(starting_strategy=strategy).generate(A)
    B = A.symm_permute(perm.to_host())
    assert bandwidth(B) <= bandwidth(A)
    # permutation is valid
    assert sorted(perm.to_host().tolist()) == list(range(60))


def test_rcm_disconnected_components():
    # block-diagonal: two disconnected chains
    d1 = generators.poisson_1d(5)
    rows = np.concatenate([d1.rows, d1.rows + 5])
    cols = np.concatenate([d1.cols, d1.cols + 5])
    vals = np.concatenate([d1.values, d1.values])
    data = gko.MatrixData.from_coo((10, 10), rows, cols, vals)
    A = gko.Csr.from_matrix_data(data)
    perm = rcm_permutation(A)
    assert sorted(perm.tolist()) == list(range(10))


def test_scaled_reordered_solver(rng):
    data = generators.make_spd(generators.generate_random_matrix(30, 30, 2, 5, rng))
    A = gko.Csr.from_matrix_data(data)
    dense = data.to_dense()
    x_true = rng.standard_normal((30, 1))
    b = dense @ x_true
    inner = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-12)]
    )
    solver = ScaledReorderedFactory(
        solver=inner, reordering=RcmFactory()
    ).generate(A)
    x = np.asarray(solver.apply(b))
    np.testing.assert_allclose(x, x_true, rtol=1e-7, atol=1e-8)

    # with row/col scaling
    d = gko.Diagonal.create(rng.uniform(0.5, 2.0, 30))
    solver2 = ScaledReorderedFactory(
        solver=inner, reordering=RcmFactory(), row_scaling=d, col_scaling=d
    ).generate(A)
    x2 = np.asarray(solver2.apply(b))
    np.testing.assert_allclose(x2, x_true, rtol=1e-6, atol=1e-7)


def test_rcm_enables_dia(rng):
    """The RCM -> Dia pipeline: reorder a scattered banded matrix, convert to
    Dia, verify SpMV matches (the TPU-native fast path for general matrices)."""
    # a banded matrix with rows randomly permuted
    base = generators.generate_tridiag_matrix(50)
    p = np.random.default_rng(5).permutation(50)
    scattered = gko.Csr.from_matrix_data(base).symm_permute(p)
    assert bandwidth(scattered) > 10
    perm = RcmFactory().generate(scattered)
    B = scattered.symm_permute(perm.to_host())
    assert bandwidth(B) <= 2
    D = B.to_dia()
    assert D.num_diags <= 5
    x = rng.standard_normal(50)
    np.testing.assert_allclose(
        np.asarray(D.apply(x)), np.asarray(B.apply(x)), rtol=1e-12
    )


def test_multigrid_on_dia_fast_format(rng):
    """MG keeps the caller's fast-format operator as the fine op (TPU
    streaming path), and still solves correctly."""
    import jax.numpy as jnp
    from ginkgo_tpu.matrix.dia import Dia

    data = generators.poisson_2d(16, dtype=np.float64)
    A = Dia.from_matrix_data(data)
    solver = MultigridFactory(
        criteria=[stop.Iteration(max_iters=60), stop.ResidualNorm(tolerance=1e-10)],
        min_coarse_rows=16,
    ).generate(A)
    assert isinstance(solver.levels[0].fine_op, Dia)
    b = jnp.ones((data.shape[0], 1))
    x, info = solver.solve(b)
    r = b - A.apply(x)
    assert float(jnp.linalg.norm(r)) < 1e-8 * float(jnp.linalg.norm(b)) * 1e4
    assert bool(np.all(np.asarray(info.converged)))


def test_banded_transfers_match_general_ops(rng):
    """BandedRestriction/Prolongation (gather-free masked-shift transfers)
    agree with the segment_sum/take general ops for any bounded-delta
    aggregation — including odd n and aggregate sizes 1/2/3."""
    import jax.numpy as jnp
    from ginkgo_tpu.multigrid.pgm import (
        BandedProlongation,
        BandedRestriction,
        Prolongation,
        Restriction,
    )

    for n in (37, 64, 101):
        # random near-index aggregation: sizes 1-3, ids within +-3 of i//2
        agg = np.zeros(n, np.int64)
        c = 0
        i = 0
        while i < n:
            size = rng.integers(1, 4)
            agg[i : i + size] = c
            i += size
            c += 1
        nc = c
        delta = agg - np.arange(n) // 2  # drifts with the size-1/3 mix;
        ds = tuple(int(d) for d in np.unique(delta))  # any set works
        br = BandedRestriction(
            delta=jnp.asarray(delta, jnp.int32), deltas=ds, n_coarse=nc
        )
        bp = BandedProlongation(
            delta=jnp.asarray(delta, jnp.int32), deltas=ds, n_coarse=nc
        )
        gr = Restriction(agg=jnp.asarray(agg, jnp.int32), n_coarse=nc)
        gp = Prolongation(agg=jnp.asarray(agg, jnp.int32), n_coarse=nc)
        x = rng.standard_normal((n, 2))
        y = rng.standard_normal((nc, 2))
        np.testing.assert_allclose(
            np.asarray(br.apply(x)), np.asarray(gr.apply(x)), rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(bp.apply(y)), np.asarray(gp.apply(y)), rtol=1e-12
        )
        np.testing.assert_array_equal(np.asarray(br.agg), agg)


def test_pgm_poisson_transfers_are_banded():
    """Proximity tie-breaking pairs stencil neighbors in index order, so
    the PGM level on 2-D Poisson gets pure-reshape transfers (deltas (0,))
    and a Dia coarse operator — the whole AMG hierarchy is gather-free."""
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.multigrid.pgm import BandedRestriction, PgmFactory

    data = generators.poisson_2d(32, dtype=np.float64)
    lvl = PgmFactory().generate(Dia.from_matrix_data(data))
    assert isinstance(lvl.restrict_op, BandedRestriction)
    assert lvl.restrict_op.deltas == (0,)
    assert isinstance(lvl.coarse_op, Dia)


def test_banded_transfers_stride(rng):
    """Stride-S pairing (vertical grid pairs) also gets gather-free
    transfers: compare against the general ops on a synthetic (i, i+S)
    aggregation with a few deviating rows."""
    import jax.numpy as jnp
    from ginkgo_tpu.multigrid.pgm import (
        _banded_transfer_ops,
        BandedRestriction,
        Restriction,
        Prolongation,
    )

    S, rblocks = 16, 6
    n = 2 * S * rblocks
    i = np.arange(n)
    agg = (i // (2 * S)) * S + i % S
    nc = agg.max() + 1
    br, bp = _banded_transfer_ops(agg, nc)
    assert isinstance(br, BandedRestriction) and br.stride == S
    gr = Restriction(agg=jnp.asarray(agg, jnp.int32), n_coarse=int(nc))
    gp = Prolongation(agg=jnp.asarray(agg, jnp.int32), n_coarse=int(nc))
    x = rng.standard_normal((n, 3))
    y = rng.standard_normal((int(nc), 3))
    np.testing.assert_allclose(
        np.asarray(br.apply(x)), np.asarray(gr.apply(x)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(bp.apply(y)), np.asarray(gp.apply(y)), rtol=1e-12
    )
    np.testing.assert_array_equal(np.asarray(br.agg), agg)


@pytest.mark.parametrize("stride,n", [(1, 999), (1, 2048), (128, 4096), (256, 7000)])
def test_banded_transfer_frame_fast_path(rng, stride, n):
    """The exact-stride single-RHS frame path (MXU lane-pair matmul /
    frame-row block sum) matches the general segment ops bit-for-bit-ish."""
    import jax.numpy as jnp
    from ginkgo_tpu.multigrid.pgm import (
        _banded_transfer_ops,
        _pair_base,
        Prolongation,
        Restriction,
    )

    agg = _pair_base(n, stride)
    nc = int(agg.max()) + 1
    br, bp = _banded_transfer_ops(agg, nc)
    assert br.deltas == (0,) and br.stride == stride
    gr = Restriction(agg=jnp.asarray(agg, jnp.int32), n_coarse=nc)
    gp = Prolongation(agg=jnp.asarray(agg, jnp.int32), n_coarse=nc)
    x = rng.standard_normal((n, 1)).astype(np.float32)
    y = rng.standard_normal((nc, 1)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(br.apply(jnp.asarray(x))), np.asarray(gr.apply(jnp.asarray(x))),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bp.apply(jnp.asarray(y))), np.asarray(gp.apply(jnp.asarray(y))),
        rtol=1e-6, atol=1e-6,
    )
    # multi-RHS still uses the general masked path
    x2 = rng.standard_normal((n, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(br.apply(jnp.asarray(x2))), np.asarray(gr.apply(jnp.asarray(x2))),
        rtol=1e-6, atol=1e-6,
    )

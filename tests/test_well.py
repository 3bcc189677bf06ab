"""WELL (windowed gather-ELL) locality-free SpMV: layering invariants,
interpret parity across pattern regimes, plan selection, strategy wiring.

Reference role: cuda/matrix/csr_kernels.cu:276-310 (load_balance) and
include/ginkgo/core/matrix/hybrid.hpp:206-241 (imbalance split) — fast
SpMV when the sparsity pattern has no column locality."""

import numpy as np
import pytest
import scipy.sparse as sps
import jax.numpy as jnp

from ginkgo_tpu.ops.spmv_well import (
    WellPlan,
    well_spmv,
    well_spmm,
    choose_unstructured_plan,
)
from ginkgo_tpu.ops.spmv_pallas import PellPlan


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def _powerlaw(n, seed=23, cap=64):
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(2.1, size=n) + 2, cap)
    rows = np.repeat(np.arange(n), deg)
    u = rng.random(rows.size)
    cols = np.minimum((u ** 3.0 * n).astype(np.int64), n - 1)
    vals = rng.standard_normal(rows.size)
    sp = sps.coo_matrix(
        (
            np.concatenate([vals, np.full(n, 4.0)]),
            (
                np.concatenate([rows, np.arange(n)]),
                np.concatenate([cols, np.arange(n)]),
            ),
        ),
        shape=(n, n),
    ).tocsr()
    sp.sum_duplicates()
    sp.sort_indices()
    return sp


PATTERNS = {
    "uniform": lambda: sps.random(900, 1100, density=0.01, random_state=1,
                                  format="csr"),
    "powerlaw": lambda: _powerlaw(4096),
    "banded": lambda: sps.diags(
        [np.ones(2000)] * 5, [-512, -1, 0, 1, 512], shape=(2000, 2000)
    ).tocsr(),
    "tiny_wide": lambda: sps.random(5, 300, density=0.2, random_state=2,
                                    format="csr"),
    "tall_narrow": lambda: sps.random(300, 5, density=0.2, random_state=2,
                                      format="csr"),
    "near_empty": lambda: sps.coo_matrix(
        ([1.0, 2.0], ([0, 700], [3, 900])), shape=(1025, 1025)
    ).tocsr(),
    "one_hub_col": lambda: sps.coo_matrix(
        (np.ones(2000), (np.arange(2000), np.zeros(2000, int))),
        shape=(2000, 2000),
    ).tocsr(),
}


@pytest.mark.parametrize("name", sorted(PATTERNS))
def test_well_parity(name, rng):
    sp = PATTERNS[name]()
    sp.sum_duplicates()
    sp.sort_indices()
    plan = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape)
    x = rng.standard_normal(sp.shape[1])
    y = np.asarray(well_spmv(plan, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, sp @ x, rtol=1e-10, atol=1e-10)
    X = rng.standard_normal((sp.shape[1], 3))
    Y = np.asarray(well_spmm(plan, jnp.asarray(X), interpret=True))
    np.testing.assert_allclose(Y, sp @ X, rtol=1e-10, atol=1e-10)


def test_well_layering_invariants():
    """The plan's routing arrays satisfy the layout contract: per (slot,
    sublane) one distinct column per residue; cell (s, l) holds only
    entries of tile row 128 s + l; round-trip reconstruction matches.
    T pinned to 1: this checks the classic single-tile layout."""
    sp = _powerlaw(2048, seed=5)
    plan = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape, T=1)
    vals = np.asarray(plan.values)
    q = np.asarray(plan.qidx).astype(np.int64)
    rt = np.asarray(plan.rt).astype(np.int64)
    bases = np.asarray(plan.bases).astype(np.int64)
    assert rt.min() >= 0 and rt.max() < 8
    assert q.min() >= 0 and q.max() < 128

    # reconstruct the matrix from occupied cells through the SAME chained
    # composition the kernel uses — must reproduce every nonzero
    tiles = np.asarray(plan.tile_of_step)
    slots_per_tile = np.bincount(tiles, minlength=plan.NT) * plan.G
    slot_tile = np.repeat(np.arange(plan.NT), slots_per_tile)
    sl, s, lane = np.nonzero(vals)
    rows = slot_tile[sl] * 1024 + s * 128 + lane
    qv = q[sl, s, lane]
    wr = rt[sl, s, qv]
    cols = (bases[sl] + wr) * 128 + qv
    got = sps.coo_matrix(
        (vals[sl, s, lane], (rows, cols)), shape=sp.shape
    ).tocsr()
    got.sum_duplicates()
    diff = np.abs(got - sp)
    assert (diff.max() if diff.nnz else 0.0) == 0.0


@pytest.mark.parametrize("T", [4, 16])
def test_well_supertile_parity_and_invariants(T, rng):
    """Supertile (XL) layout (round 5): cell (s, l) serves row
    1024*tsb + 128 s + l of its supertile; reconstruction through the
    tsb routing must reproduce every nonzero, and the kernel (interpret)
    must match scipy for SpMV and SpMM."""
    sp = _powerlaw(4096, seed=11)
    plan = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape, T=T, G=8)
    assert plan.T == T and plan.tsb is not None
    vals = np.asarray(plan.values)
    q = np.asarray(plan.qidx).astype(np.int64)
    rt = np.asarray(plan.rt).astype(np.int64)
    tsb = np.asarray(plan.tsb).astype(np.int64)
    bases = np.asarray(plan.bases).astype(np.int64)
    assert tsb.min() >= 0 and tsb.max() < T
    tiles = np.asarray(plan.tile_of_step)
    slots_per_blk = np.bincount(tiles, minlength=plan.NST) * plan.G
    slot_blk = np.repeat(np.arange(plan.NST), slots_per_blk)
    sl, s, lane = np.nonzero(vals)
    rows = (slot_blk[sl] * T + tsb[sl, s, lane]) * 1024 + s * 128 + lane
    qv = q[sl, s, lane]
    cols = (bases[sl] + rt[sl, s, qv]) * 128 + qv
    got = sps.coo_matrix(
        (vals[sl, s, lane], (rows, cols)), shape=sp.shape
    ).tocsr()
    got.sum_duplicates()
    diff = np.abs(got - sp)
    assert (diff.max() if diff.nnz else 0.0) == 0.0
    x = rng.standard_normal(sp.shape[1])
    y = np.asarray(well_spmv(plan, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, sp @ x, rtol=1e-10, atol=1e-10)
    X = rng.standard_normal((sp.shape[1], 2))
    Y = np.asarray(well_spmm(plan, jnp.asarray(X), interpret=True))
    np.testing.assert_allclose(Y, sp @ X, rtol=1e-10, atol=1e-10)


def test_well_deep_supertile_correct_and_gated(rng):
    """T=32/64 deep supertiles: kernel parity holds (same masked-add
    path, longer chain) and the auto search only TRIES deep candidates
    beyond _T_DEEP_MIN_NNZ (their mask chains cost ~20-36 ns/slot on
    chip, so small patterns must not pay the extra layering passes)."""
    from ginkgo_tpu.ops import spmv_well as sw

    sp = _powerlaw(2048, seed=3)
    for T in (32, 64):
        plan = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape, T=T, G=8)
        assert plan.T == T
        x = rng.standard_normal(sp.shape[1])
        y = np.asarray(well_spmv(plan, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(y, sp @ x, rtol=1e-10, atol=1e-10)
    # gating: small pattern -> deep candidates not evaluated
    auto = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape,
                    materialize=False)
    assert sp.nnz < sw._T_DEEP_MIN_NNZ and auto.T <= 16


def test_well_supertile_cuts_powerlaw_inflation():
    """The r5 design point: on the locality-free power-law pattern the
    supertile layout must cut padded cells well below the T=1 (tile,
    window) pair floor (measured 40.9x -> 7.2x at 131k rows; at 8k rows
    the gap is smaller but must still be >1.5x)."""
    sp = _powerlaw(8192)
    t1 = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape, T=1,
                  materialize=False)
    t16 = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape, T=16,
                   materialize=False)
    assert t16.total_cells * 1.5 < t1.total_cells, (
        t16.total_cells, t1.total_cells
    )
    auto = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape,
                    materialize=False)
    assert auto.T > 1  # the cost model must pick a supertile here


def test_well_beats_pell_on_powerlaw():
    """The whole point: WELL's padded cells on a locality-free pattern
    must be far below PELL's (which needs ~a slot per nonzero there)."""
    sp = _powerlaw(8192)
    well = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape,
                    materialize=False)
    pell = PellPlan(sp.indptr, sp.indices, sp.data, sp.shape,
                    materialize=False)
    # at n=8192 PELL's 64 panels still collide into ~44x inflation while
    # WELL stays ~17x; the gap WIDENS with n (PELL ~180x at 131k,
    # BENCH_r03) because PELL's distinct (base, occ) slots scale with
    # nnz while WELL's scale with touched windows
    assert well.total_cells < pell.total_cells / 2.5, (
        well.total_cells, pell.total_cells
    )
    assert well.inflation < 25, well.inflation


def test_choose_plan_regimes():
    """Cost model picks PELL on locality patterns, WELL on scattered."""
    banded = PATTERNS["banded"]()
    p = choose_unstructured_plan(
        banded.indptr, banded.indices, banded.data, banded.shape
    )
    assert isinstance(p, PellPlan), type(p)
    pl_ = _powerlaw(8192)
    w = choose_unstructured_plan(pl_.indptr, pl_.indices, pl_.data, pl_.shape)
    assert isinstance(w, WellPlan), type(w)


def test_csr_auto_accepts_powerlaw(monkeypatch):
    """Csr 'auto' must resolve to 'pallas' on a locality-free pattern now
    that WELL exists (VERDICT r3 missing #1) — exercised by faking the
    TPU backend gate (resolution is host-side stats only)."""
    import jax as _jax
    from ginkgo_tpu.matrix.csr import Csr

    sp = _powerlaw(8192)
    A = Csr.from_scipy(sp)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert A._resolve_strategy() == "pallas"


def test_well_vmap_dispatch(rng):
    sp = PATTERNS["uniform"]()
    sp.sum_duplicates()
    sp.sort_indices()
    plan = WellPlan(sp.indptr, sp.indices, sp.data, sp.shape)
    X = rng.standard_normal((4, sp.shape[1]))
    Y = np.asarray(
        jnp.stack(
            [well_spmv(plan, jnp.asarray(x), interpret=True) for x in X]
        )
    )
    import jax

    Yv = np.asarray(
        jax.vmap(lambda x: well_spmv(plan, x, interpret=True))(
            jnp.asarray(X)
        )
    )
    np.testing.assert_allclose(Yv, Y, rtol=1e-10, atol=1e-10)


def test_well_streaming_route(monkeypatch, rng):
    """linop_streaming_spmv routes a scattered Ell/Coo pattern through a
    WELL plan under GINKGO_TPU_FORCE_STREAMING (interpret kernel)."""
    import ginkgo_tpu as gko
    from ginkgo_tpu.matrix.coo import Coo
    from ginkgo_tpu.ops.spmv_pallas import linop_streaming_spmv, _OP_PLAN_CACHE

    monkeypatch.setenv("GINKGO_TPU_FORCE_STREAMING", "1")
    _OP_PLAN_CACHE.clear()
    sp = _powerlaw(4096).tocoo()
    A = Coo(
        rows=jnp.asarray(sp.row),
        cols=jnp.asarray(sp.col),
        values=jnp.asarray(sp.data),
        shape=sp.shape,
    )
    x = rng.standard_normal(sp.shape[1])
    y = linop_streaming_spmv(A, jnp.asarray(x)[:, None])
    assert y is not None
    np.testing.assert_allclose(
        np.asarray(y)[:, 0], sp.tocsr() @ x, rtol=1e-10, atol=1e-10
    )


def test_well_format_roundtrip_and_ops(rng):
    """Well format class: apply parity, reconstruction round-trip,
    scale/abs/astype/reduce_storage/transpose surface."""
    import jax.numpy as jnp_
    from ginkgo_tpu.matrix.well import Well
    from ginkgo_tpu.matrix.csr import Csr

    sp = _powerlaw(2048, seed=9)
    A = Csr.from_scipy(sp)
    W = Well.from_csr(A)
    assert W.nnz == sp.nnz
    x = rng.standard_normal(sp.shape[1])
    np.testing.assert_allclose(
        np.asarray(W.apply(jnp.asarray(x))), sp @ x, rtol=1e-10, atol=1e-10
    )
    # round-trip reconstruction
    back = W.to_csr().to_scipy()
    diff = abs(back - sp)
    assert (diff.max() if diff.nnz else 0.0) == 0.0
    # ops
    np.testing.assert_allclose(
        np.asarray(W.scale(2.0).apply(jnp.asarray(x))), 2 * (sp @ x),
        rtol=1e-10, atol=1e-10,
    )
    Wt = W.transpose()
    t_back = Wt.to_csr().to_scipy()
    diff_t = abs(t_back - sp.T.tocsr())
    assert (diff_t.max() if diff_t.nnz else 0.0) == 0.0
    assert W.reduce_storage().values.dtype == jnp_.bfloat16


def test_choose_format_picks_well_for_locality_free():
    from ginkgo_tpu.matrix.auto import choose_format
    from ginkgo_tpu.matrix.well import Well
    from ginkgo_tpu.base.matrix_data import MatrixData

    sp = _powerlaw(8192).tocoo()
    data = MatrixData.from_coo(sp.shape, sp.row, sp.col, sp.data)
    op = choose_format(data, max_inflation=20.0)
    assert isinstance(op, Well), type(op)

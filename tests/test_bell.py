"""Blocked-ELL format + Pallas kernel vs CSR oracle.

Reference analog: the backend-vs-reference CSR strategy comparison tier
(test/matrix/csr_kernels2.cpp pattern) applied to the TPU-native
general-sparse format."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.matrix.bell import Bell, suitable_for_bell, LANES
from ginkgo_tpu.matrix.csr import Csr
from ginkgo_tpu.ops.pallas_bell import bell_spmv_pallas
from ginkgo_tpu.utils import generators


@pytest.mark.parametrize("n,m,kpr", [(100, 90, 4), (257, 300, 7), (64, 64, 1)])
def test_bell_apply_matches_csr(n, m, kpr, rng):
    data = generators.generate_random_matrix(n, m, 1, kpr, rng, dtype=np.float32)
    A = Bell.from_matrix_data(data)
    R = Csr.from_matrix_data(data)
    x = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(A.apply(x)), np.asarray(R.apply(x)), atol=1e-5
    )
    # multivector
    xm = jnp.asarray(rng.standard_normal((m, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(A.apply(xm)), np.asarray(R.apply(xm)), atol=1e-5
    )


def test_bell_pallas_matches_xla(rng):
    data = generators.generate_random_matrix(257, 300, 1, 7, rng, dtype=np.float32)
    A = Bell.from_matrix_data(data, block_rows=16)
    x = jnp.asarray(rng.standard_normal(300).astype(np.float32))
    NPC = -(-300 // LANES)
    xp = jnp.pad(x, (0, NPC * LANES - 300)).reshape(NPC, LANES)
    y_p = bell_spmv_pallas(A.values, A.panel_ids, A.panel_valid, xp, interpret=True)
    y_ref = Csr.from_matrix_data(data).apply(x)
    np.testing.assert_allclose(np.asarray(y_p[:257]), np.asarray(y_ref), atol=1e-5)


def test_bell_roundtrip_and_ops(rng):
    data = generators.generate_random_matrix(64, 64, 1, 5, rng)
    A = Bell.from_matrix_data(data)
    d0 = data.sum_duplicates().sort_row_major()
    back = A.to_matrix_data()
    np.testing.assert_array_equal(back.rows, d0.rows)
    np.testing.assert_array_equal(back.cols, d0.cols)
    np.testing.assert_allclose(back.values, d0.values)
    assert A.nnz == d0.nnz
    # transpose round trip
    T = A.transpose()
    np.testing.assert_allclose(
        T.to_matrix_data().to_dense(), d0.to_dense().T
    )
    # diagonal
    np.testing.assert_allclose(
        np.asarray(A.extract_diagonal().values), np.diag(d0.to_dense())
    )


def test_bell_advanced_apply_and_scale(rng):
    data = generators.generate_random_matrix(40, 40, 1, 4, rng)
    A = Bell.from_matrix_data(data)
    x = jnp.asarray(rng.standard_normal((40, 2)))
    c = jnp.asarray(rng.standard_normal((40, 2)))
    got = A.apply_advanced(2.0, x, -0.5, c)
    want = 2.0 * np.asarray(data.to_dense()) @ np.asarray(x) - 0.5 * np.asarray(c)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(A.scale(3.0).apply(x)), 3 * np.asarray(A.apply(x)), rtol=1e-12
    )


def test_bell_inflation_and_suitability(rng):
    # block-structured matrix: few panels, decent fill -> low inflation
    NRB, BR, K = 16, 8, 3
    n = NRB * BR
    rows_l, cols_l = [], []
    for rb in range(NRB):
        panels = rng.choice(8, size=K, replace=False)
        for p in panels:
            rr, cc = np.nonzero(rng.random((BR, LANES)) < 0.4)
            rows_l.append(rb * BR + rr)
            cols_l.append(p * LANES + cc)
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    data = MatrixData.from_coo(
        (n, 8 * LANES), rows, cols, rng.standard_normal(len(rows))
    ).sort_row_major()
    A = Bell.from_matrix_data(data, block_rows=BR)
    assert A.storage_inflation() < 4.0
    assert suitable_for_bell(data, block_rows=BR)
    x = jnp.asarray(rng.standard_normal(8 * LANES))
    np.testing.assert_allclose(
        np.asarray(A.apply(x)),
        np.asarray(data.to_dense()) @ np.asarray(x),
        rtol=1e-9,
    )


def test_csr_lookup_and_to_bell(rng):
    from ginkgo_tpu.matrix.csr import Csr

    data = generators.generate_random_matrix(30, 25, 1, 4, rng)
    A = Csr.from_matrix_data(data)
    d = data.sum_duplicates().sort_row_major()
    # every stored entry found at its slot
    idx = np.asarray(A.lookup(d.rows, d.cols))
    np.testing.assert_array_equal(idx, np.arange(d.nnz))
    # absent entries -> -1
    dense = d.to_dense()
    zr, zc = np.nonzero(dense == 0)
    miss = np.asarray(A.lookup(zr[:10], zc[:10]))
    np.testing.assert_array_equal(miss, -1)
    # to_bell round-trips
    B = A.to_bell()
    np.testing.assert_allclose(
        B.to_matrix_data().to_dense(), dense, rtol=1e-12
    )


def test_bell_preserves_explicit_zeros(rng):
    # explicit zero entries survive the round trip (fixed-pattern contract)
    data = MatrixData.from_coo(
        (10, 10),
        np.array([0, 0, 3, 7]),
        np.array([1, 5, 3, 2]),
        np.array([1.0, 0.0, 0.0, 2.0]),
    ).sort_row_major()
    A = Bell.from_matrix_data(data)
    back = A.to_matrix_data()
    assert back.nnz == 4
    np.testing.assert_array_equal(back.rows, data.rows)
    np.testing.assert_array_equal(back.cols, data.cols)
    np.testing.assert_allclose(back.values, data.values)


def test_choose_format(rng):
    import ginkgo_tpu as gko
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.matrix.csr import Csr

    # stencil -> Dia
    assert isinstance(gko.choose_format(generators.poisson_2d(8)), Dia)
    # fully random scatter -> the WELL windowed-gather format (round 4:
    # locality-free patterns stream through ops/spmv_well.py instead of
    # falling to gather-speed Csr); exactness is covered by test_well
    from ginkgo_tpu.matrix.well import Well

    d = generators.generate_random_matrix(64, 2048, 1, 2, rng)
    assert isinstance(gko.choose_format(d), Well)
    # block-structured -> Bell
    NRB, BR = 16, 8
    rows_l, cols_l = [], []
    for rb in range(NRB):
        for p in rng.choice(4, size=2, replace=False):
            rr, cc = np.nonzero(rng.random((BR, LANES)) < 0.5)
            rows_l.append(rb * BR + rr)
            cols_l.append(p * LANES + cc)
    rows = np.concatenate(rows_l); cols = np.concatenate(cols_l)
    d2 = MatrixData.from_coo(
        (NRB * BR, 4 * LANES), rows, cols, rng.standard_normal(len(rows))
    ).sort_row_major()
    assert isinstance(gko.choose_format(d2), Bell)


def test_bell_spmm_pallas_matches_oracle(rng):
    from ginkgo_tpu.ops.pallas_bell import bell_spmm_pallas

    data = generators.generate_random_matrix(200, 260, 1, 6, rng, dtype=np.float32)
    A = Bell.from_matrix_data(data, block_rows=16)
    k = 5
    X = rng.standard_normal((260, k)).astype(np.float32)
    want = np.asarray(data.to_dense()) @ X
    NPC = -(-260 // LANES)
    Xp = np.zeros((NPC * LANES, k), np.float32)
    Xp[:260] = X
    got = bell_spmm_pallas(
        A.values, A.panel_ids, jnp.asarray(Xp.T), interpret=True
    )
    np.testing.assert_allclose(np.asarray(got)[:200], want, atol=1e-4)


def test_bell_reduced_storage(rng):
    data = generators.generate_random_matrix(100, 100, 1, 5, rng, dtype=np.float32)
    A = Bell.from_matrix_data(data).reduce_storage()
    assert A.values.dtype == jnp.bfloat16
    x = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    want = np.asarray(data.to_dense()) @ np.asarray(x)
    got = np.asarray(A.apply(x))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_poisson_3d_generator():
    d = generators.poisson_3d(4, dtype=np.float64)
    assert d.shape == (64, 64)
    dense = d.to_dense()
    np.testing.assert_array_equal(np.diag(dense), np.full(64, 6.0))
    assert (dense == dense.T).all()
    # row sums: interior rows 0, boundary rows positive
    rs = dense.sum(1)
    assert rs.min() == 0 and rs.max() > 0
    # dia-suitable
    from ginkgo_tpu.matrix.dia import suitable_for_dia
    assert suitable_for_dia(d)


def test_bell_extract_diagonal_no_densify(rng):
    # scalability contract: extract_diagonal must read only stored slots
    data = generators.generate_random_matrix(300, 300, 1, 3, rng)
    # force some diagonal entries incl. explicit zero
    d2 = MatrixData.from_coo(
        (300, 300),
        np.concatenate([data.rows, [5, 7]]),
        np.concatenate([data.cols, [5, 7]]),
        np.concatenate([data.values, [2.5, 0.0]]),
    ).sum_duplicates().sort_row_major()
    A = Bell.from_matrix_data(d2)
    want = np.diag(d2.to_dense())
    np.testing.assert_allclose(np.asarray(A.extract_diagonal().values), want)

"""ELL / SELL-P / Hybrid / FBCSR / SparsityCsr / FFT tests vs oracles
(reference model: reference/test/matrix/*)."""

import numpy as np
import pytest
import jax.numpy as jnp

import ginkgo_tpu as gko
from ginkgo_tpu.utils import generators


def rand_sys(rng, n=40, m=33, lo=0, hi=8, dtype=np.float64):
    data = generators.generate_random_matrix(n, m, lo, hi, rng, dtype=dtype)
    dense = data.sum_duplicates().to_dense()
    x = generators.generate_random_dense(m, 3, rng, dtype)
    return data, dense, x


def test_ell_spmv_and_roundtrip(rng):
    data, dense, x = rand_sys(rng)
    E = gko.Ell.from_matrix_data(data)
    np.testing.assert_allclose(np.asarray(E.apply(x)), dense @ x, rtol=1e-12)
    np.testing.assert_allclose(E.to_matrix_data().to_dense(), dense)
    np.testing.assert_allclose(np.asarray(E.to_dense().values), dense)
    assert E.max_nnz_per_row == max(
        np.diff(np.asarray(gko.Csr.from_matrix_data(data).row_ptrs))
    )
    # advanced apply
    c = generators.generate_random_dense(data.shape[0], 3, rng)
    np.testing.assert_allclose(
        np.asarray(E.apply_advanced(2.0, x, -1.0, c)), 2 * dense @ x - c, rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(E.extract_diagonal().values),
        np.diag(dense)[: min(data.shape)],
    )


def test_ell_empty_rows(rng):
    data = gko.MatrixData.from_coo((4, 4), [1], [2], [5.0])
    E = gko.Ell.from_matrix_data(data)
    np.testing.assert_allclose(np.asarray(E.apply(np.ones(4))), [0, 5, 0, 0])


@pytest.mark.parametrize("slice_size", [4, 64])
def test_sellp_spmv_and_roundtrip(rng, slice_size):
    data, dense, x = rand_sys(rng, n=70)
    S = gko.Sellp.from_matrix_data(data, slice_size=slice_size)
    np.testing.assert_allclose(np.asarray(S.apply(x)), dense @ x, rtol=1e-12)
    np.testing.assert_allclose(S.to_matrix_data().to_dense(), dense)
    assert S.slice_size == slice_size
    # stride_factor pads slice lengths
    S2 = gko.Sellp.from_matrix_data(data, slice_size=4, stride_factor=8)
    np.testing.assert_allclose(np.asarray(S2.apply(x)), dense @ x, rtol=1e-12)
    ss = np.asarray(S2.slice_sets)
    assert np.all(np.diff(ss) % 8 == 0)


@pytest.mark.parametrize(
    "strategy,arg", [("column_limit", 3), ("imbalance_limit", 0.6), ("automatic", None)]
)
def test_hybrid_partitions(rng, strategy, arg):
    # skewed matrix: a few very heavy rows
    data, dense, x = rand_sys(rng, n=30, m=30, lo=1, hi=4)
    heavy = generators.generate_random_matrix(1, 30, 25, 28, rng)
    d = gko.MatrixData.from_coo(
        (30, 30),
        np.concatenate([data.rows, heavy.rows + 7]),
        np.concatenate([data.cols, heavy.cols]),
        np.concatenate([data.values, heavy.values]),
    ).sum_duplicates()
    dense = d.to_dense()
    H = gko.Hybrid.from_matrix_data(d, strategy=strategy, strategy_arg=arg)
    np.testing.assert_allclose(np.asarray(H.apply(x)), dense @ x, rtol=1e-12)
    np.testing.assert_allclose(H.to_matrix_data().to_dense(), dense)
    if strategy == "column_limit":
        assert H.ell.max_nnz_per_row == 3
        assert H.coo.nnz > 0


@pytest.mark.parametrize("bs", [2, 4])
def test_fbcsr_spmv_and_roundtrip(rng, bs):
    data, dense, x = rand_sys(rng, n=24, m=16)
    F = gko.Fbcsr.from_matrix_data(data, block_size=bs)
    assert F.block_size == bs
    np.testing.assert_allclose(np.asarray(F.apply(x)), dense @ x, rtol=1e-12)
    np.testing.assert_allclose(F.to_matrix_data().to_dense(), dense)
    T = F.transpose()
    np.testing.assert_allclose(T.to_matrix_data().to_dense(), dense.T)


def test_fbcsr_nondivisible_shape(rng):
    data, dense, x = rand_sys(rng, n=13, m=11)
    F = gko.Fbcsr.from_matrix_data(data, block_size=4)
    np.testing.assert_allclose(np.asarray(F.apply(x)), dense @ x, rtol=1e-12)


def test_sparsity_csr(rng):
    data, dense, x = rand_sys(rng, n=20, m=20, lo=1, hi=5)
    S = gko.SparsityCsr.from_matrix_data(data)
    pattern = (dense != 0).astype(float)
    np.testing.assert_allclose(np.asarray(S.apply(x)), pattern @ x, rtol=1e-12)
    adj = S.to_adjacency_matrix()
    pat2 = pattern.copy()
    np.fill_diagonal(pat2, 0)
    np.testing.assert_allclose(adj.to_dense().values, pat2)
    T = S.transpose()
    np.testing.assert_allclose(np.asarray(T.to_dense().values), pattern.T)


def test_fft_linops(rng):
    n = 16
    F = gko.Fft.create(n)
    x = generators.generate_random_dense(n, 2, rng)
    np.testing.assert_allclose(
        np.asarray(F.apply(x)), np.fft.fft(x, axis=0), rtol=1e-6, atol=1e-8
    )
    Fi = F.conj_transpose()
    roundtrip = np.asarray(Fi.apply(F.apply(x))) / n
    np.testing.assert_allclose(roundtrip.real, x, rtol=1e-5, atol=1e-6)

    F2 = gko.Fft2.create(4, 4)
    x2 = generators.generate_random_dense(16, 1, rng)
    g = x2.reshape(4, 4)
    np.testing.assert_allclose(
        np.asarray(F2.apply(x2))[:, 0].reshape(4, 4),
        np.fft.fft2(g),
        rtol=1e-5,
        atol=1e-8,
    )
    F3 = gko.Fft3.create(2, 2, 2)
    x3 = generators.generate_random_dense(8, 1, rng)
    np.testing.assert_allclose(
        np.asarray(F3.apply(x3))[:, 0].reshape(2, 2, 2),
        np.fft.fftn(x3.reshape(2, 2, 2)),
        rtol=1e-5,
        atol=1e-8,
    )


def test_csr_strategy_sellp_matches(rng):
    data, dense, x = rand_sys(rng)
    A = gko.Csr.from_matrix_data(data, strategy="sellp")
    np.testing.assert_allclose(np.asarray(A.apply(x)), dense @ x, rtol=1e-12)

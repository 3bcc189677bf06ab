"""Pallas TPU kernels vs the XLA oracle paths (interpret mode on CPU).

Mirrors the reference's backend-vs-reference comparison tier (SURVEY.md §4,
test/matrix/*_kernels.cpp pattern): random data, run the device kernel and
the oracle on the same arrays, compare elementwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.matrix.dia import Dia, LANES
from ginkgo_tpu.ops.pallas_dia import dia_spmv_pallas
from ginkgo_tpu.utils import generators


def _banded(n, offs, rng, dtype=np.float32):
    rows_l, cols_l, vals_l = [], [], []
    for o in offs:
        r = np.arange(max(0, -o), min(n, n - o))
        rows_l.append(r)
        cols_l.append(r + o)
        vals_l.append(rng.standard_normal(len(r)).astype(dtype))
    return MatrixData.from_coo(
        (n, n),
        np.concatenate(rows_l),
        np.concatenate(cols_l),
        np.concatenate(vals_l),
    ).sort_row_major()


def _run(D, x, block_rows):
    R = D.diags.shape[1]
    xp = jnp.pad(x, (0, R * LANES - x.shape[0])).reshape(R, LANES)
    y = dia_spmv_pallas(
        D.diags, D.offsets, xp, block_rows=block_rows, interpret=True
    )
    return y.reshape(-1)[: x.shape[0]]


@pytest.mark.parametrize("n_side", [16, 33])
def test_dia_pallas_matches_xla_on_stencil(n_side, rng):
    data = generators.poisson_2d(n_side, dtype=np.float32)
    D = Dia.from_matrix_data(data)
    x = jnp.asarray(rng.standard_normal(data.shape[0]).astype(np.float32))
    y_ref = D.apply(x)
    y = _run(D, x, block_rows=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_dia_pallas_irregular_offsets(rng):
    offs = [-300, -128, -127, -1, 0, 1, 127, 128, 129, 256, 511]
    data = _banded(700, offs, rng)
    D = Dia.from_matrix_data(data)
    x = jnp.asarray(rng.standard_normal(700).astype(np.float32))
    y_ref = D.apply(x)
    for br in (4, 16):
        y = _run(D, x, block_rows=br)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)


def test_dia_pallas_single_diag_negative(rng):
    data = _banded(200, [-5], rng)
    D = Dia.from_matrix_data(data)
    x = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    y = _run(D, x, block_rows=8)
    y_ref = D.apply(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_dia_pallas_block_not_dividing_rows(rng):
    # R not a multiple of block_rows exercises the pad path
    data = _banded(130, [0, 1], rng)  # R = 2 rows of frame
    D = Dia.from_matrix_data(data)
    x = jnp.asarray(rng.standard_normal(130).astype(np.float32))
    y = _run(D, x, block_rows=8)
    y_ref = D.apply(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_dia_advanced_pallas_matches_oracle(rng):
    from ginkgo_tpu.ops.pallas_dia import dia_advanced_spmv_pallas

    data = generators.poisson_2d(16, dtype=np.float32)
    D = Dia.from_matrix_data(data)
    n = data.shape[0]
    R = D.diags.shape[1]
    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    alpha, beta = np.float32(1.7), np.float32(-0.4)
    want = alpha * (np.asarray(data.to_dense()) @ x) + beta * y
    xp = jnp.pad(jnp.asarray(x), (0, R * LANES - n)).reshape(R, LANES)
    yp = jnp.pad(jnp.asarray(y), (0, R * LANES - n)).reshape(R, LANES)
    got = dia_advanced_spmv_pallas(
        D.diags, D.offsets, xp, alpha, beta, yp, block_rows=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1)[:n], want, rtol=1e-5, atol=1e-5
    )


def test_dia_pallas_bf16_storage(rng):
    data = generators.poisson_2d(16, dtype=np.float32)
    D = Dia.from_matrix_data(data).reduce_storage()
    assert D.diags.dtype == jnp.bfloat16
    x = jnp.asarray(rng.standard_normal(data.shape[0]).astype(np.float32))
    R = D.diags.shape[1]
    xp = jnp.pad(x, (0, R * LANES - data.shape[0])).reshape(R, LANES)
    y = dia_spmv_pallas(D.diags, D.offsets, xp, block_rows=16, interpret=True)
    want = np.asarray(data.to_dense()) @ np.asarray(x)
    # bf16 storage: ~3 significant digits on the values
    np.testing.assert_allclose(
        np.asarray(y).reshape(-1)[: data.shape[0]], want, rtol=2e-2, atol=2e-2
    )
    assert y.dtype == jnp.float32


def test_dia_spmm_pallas_matches_oracle(rng):
    from ginkgo_tpu.ops.pallas_dia import dia_spmm_pallas

    data = generators.poisson_2d(12, dtype=np.float32)
    D = Dia.from_matrix_data(data)
    n = data.shape[0]
    R = D.diags.shape[1]
    k = 3
    X = rng.standard_normal((n, k)).astype(np.float32)
    want = np.asarray(data.to_dense()) @ X
    Xp = np.zeros((R * LANES, k), np.float32)
    Xp[:n] = X
    xk = jnp.asarray(Xp.T.reshape(k, R, LANES))
    got = dia_spmm_pallas(D.diags, D.offsets, xk, block_rows=8, interpret=True)
    got_flat = np.asarray(got).reshape(k, R * LANES)[:, :n].T
    np.testing.assert_allclose(got_flat, want, atol=1e-4)


def test_dia_spmv_vmap_dispatches_to_spmm(rng):
    """jax.vmap over dia_spmv_pallas's x must dispatch to the k-RHS SpMM
    kernel (custom_vmap) — Pallas calls cannot be auto-batched, and the
    streaming GMRES multi-RHS driver vmaps whole solves over columns
    (the round-3 on-chip crash at ops/pallas_dia.py:328)."""
    offs = [-130, -1, 0, 5, 128]
    data = _banded(700, offs, rng)
    D = Dia.from_matrix_data(data)
    R = D.diags.shape[1]
    f = lambda x2: dia_spmv_pallas(D.diags, D.offsets, x2, interpret=True)
    X = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, R, LANES))
        .astype(np.float32))
    import jax

    yv = jax.vmap(f)(X)
    ys = jnp.stack([f(X[i]) for i in range(4)])
    np.testing.assert_allclose(np.asarray(yv), np.asarray(ys),
                               rtol=1e-5, atol=1e-5)

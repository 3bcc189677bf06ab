"""Accessor library + IndexSet semantics vs numpy oracle.

Reference tiers: accessor tests (core/test/accessor/) and
core/test/base/index_set.cpp."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu.base.accessor import (
    ReducedRowMajor,
    ScaledReducedRowMajor,
    block_col_major,
)
from ginkgo_tpu.base.index_set import IndexSet


def test_reduced_row_major_roundtrip(rng):
    v = rng.standard_normal((8, 5)).astype(np.float32)
    acc = ReducedRowMajor.create(jnp.asarray(v))  # f32 -> bf16 storage
    assert acc.storage_dtype == jnp.bfloat16
    got = np.asarray(acc.read())
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, v, rtol=1e-2)  # bf16 has ~3 digits


def test_reduced_row_major_write(rng):
    v = jnp.zeros((4, 4), jnp.float32)
    acc = ReducedRowMajor.create(v)
    acc = acc.write((1, 2), 3.25)  # exactly representable in bf16
    assert float(acc.read((1, 2))) == 3.25


def test_scaled_reduced_row_major(rng):
    v = rng.standard_normal((6, 32)).astype(np.float32) * 7.3
    acc = ScaledReducedRowMajor.create(jnp.asarray(v), storage_dtype=jnp.int16)
    got = np.asarray(acc.read())
    np.testing.assert_allclose(got, v, atol=np.abs(v).max() * 2e-4)


def test_block_col_major_layout():
    v = jnp.arange(12.0).reshape(6, 2)
    blk = block_col_major(v, 3)
    assert blk.shape == (2, 2, 3)
    # block 0, column 1, entries = rows 0..2 of column 1
    np.testing.assert_array_equal(np.asarray(blk[0, 1]), [1.0, 3.0, 5.0])


def test_index_set_intervals():
    s = IndexSet(20, [0, 1, 2, 7, 8, 15])
    assert s.num_subsets == 3
    assert s.get_num_elems() == 6
    assert s.get_size() == 20
    np.testing.assert_array_equal(s.to_global_indices(), [0, 1, 2, 7, 8, 15])


def test_index_set_maps():
    s = IndexSet(20, [3, 4, 5, 10, 11])
    assert s.get_global_index(0) == 3
    assert s.get_global_index(3) == 10
    assert s.get_local_index(5) == 2
    assert s.get_local_index(11) == 4
    assert s.get_local_index(9) == -1
    assert s.contains(4) and not s.contains(6)
    np.testing.assert_array_equal(
        s.get_local_index(np.array([3, 6, 11])), [0, -1, 4]
    )


def test_index_set_complement_and_dedup():
    s = IndexSet(10, [5, 1, 1, 3, 2])
    np.testing.assert_array_equal(s.to_global_indices(), [1, 2, 3, 5])
    c = s.complement()
    np.testing.assert_array_equal(c.to_global_indices(), [0, 4, 6, 7, 8, 9])


def test_index_set_empty_and_bounds():
    s = IndexSet(5)
    assert s.get_num_elems() == 0
    assert s.get_local_index(3) == -1
    assert not s.contains(3)
    with pytest.raises(ValueError):
        IndexSet(5, [7])


def test_csr_create_submatrix(rng):
    import ginkgo_tpu as gko
    from ginkgo_tpu.utils import generators

    data = generators.generate_random_matrix(12, 10, 1, 4, rng)
    A = gko.Csr.from_matrix_data(data)
    dense = data.to_dense()
    rs = IndexSet(12, [0, 1, 5, 9])
    cs = IndexSet(10, [2, 3, 4, 8])
    S = A.create_submatrix(rs, cs)
    np.testing.assert_allclose(
        np.asarray(S.to_dense().values), dense[np.ix_([0, 1, 5, 9], [2, 3, 4, 8])]
    )
    S2 = A.create_submatrix(slice(2, 7), slice(0, 5))
    np.testing.assert_allclose(
        np.asarray(S2.to_dense().values), dense[2:7, 0:5]
    )

"""ops/components vs numpy oracle (reference: core/components kernels +
core/test/components/)."""

import numpy as np
import jax.numpy as jnp

from ginkgo_tpu.ops import components as C


def test_prefix_sums():
    a = jnp.asarray([3, 1, 4, 1, 5])
    np.testing.assert_array_equal(np.asarray(C.prefix_sum_nonnegative(a)), [0, 3, 4, 8, 9])
    np.testing.assert_array_equal(np.asarray(C.inclusive_prefix_sum(a)), [3, 4, 8, 9, 14])


def test_fill_reduce_absolute_convert():
    assert float(C.reduce_add_array(C.fill_array((4,), 2.5))) == 10.0
    np.testing.assert_array_equal(np.asarray(C.fill_seq_array(3)), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(C.absolute_array(jnp.asarray([-1.0, 2.0]))), [1.0, 2.0])
    assert C.convert_precision(jnp.zeros(2, jnp.float64), jnp.float32).dtype == jnp.float32
    assert float(C.max_array(jnp.asarray([1.0, 7.0, 3.0]))) == 7.0


def test_ptr_idx_roundtrip():
    ptrs = jnp.asarray([0, 2, 2, 5], jnp.int32)
    idxs = C.convert_ptrs_to_idxs(ptrs, 5)
    np.testing.assert_array_equal(np.asarray(idxs), [0, 0, 2, 2, 2])
    back = C.convert_idxs_to_ptrs(idxs, 3)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ptrs))


def test_disjoint_sets():
    ds = C.DisjointSets(6)
    assert ds.find(3) == 3 and ds.is_representative(3)
    r = ds.join(0, 1)
    ds.join(1, 2)
    assert ds.find(2) == ds.find(0) == r
    assert ds.size_of(0) == 3
    assert ds.find(4) != ds.find(0)
    ds.join(4, 5)
    ds.join(0, 4)
    assert ds.size_of(5) == 5
    assert len(ds) == 6


def test_bootstrap_helpers(monkeypatch):
    from ginkgo_tpu.distributed import bootstrap

    monkeypatch.setenv("SLURM_LOCALID", "3")
    assert bootstrap.map_rank_to_device_id(4) == 3
    assert bootstrap.map_rank_to_device_id(2) == 1
    monkeypatch.delenv("SLURM_LOCALID")
    assert bootstrap.map_rank_to_device_id(4) == 0
    assert bootstrap.process_count() >= 1
    assert bootstrap.global_mesh().devices.shape[0] >= 1


def test_exception_taxonomy():
    import jax.numpy as jnp
    import ginkgo_tpu as gko
    from ginkgo_tpu.base import exceptions as exc

    A = gko.Csr.from_matrix_data(
        __import__("ginkgo_tpu").generators.poisson_1d(8, dtype=np.float64)
    )
    s = gko.Cg.build().generate(A)
    with __import__("pytest").raises(exc.DimensionMismatch):
        s.solve(jnp.ones((5, 1)))
    exc.assert_square(A)
    with __import__("pytest").raises(exc.BadDimension):
        class R:  # rectangular stub
            shape = (3, 5)
        exc.assert_square(R())

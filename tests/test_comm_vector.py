"""comm vocabulary + DistVector vs numpy oracle on the 8-device CPU mesh.

Reference analog: core/test/mpi/ (communicator op tests) and
test/mpi/distributed/vector.cpp (dot/norm vs replicated-gather)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map
import pytest

from ginkgo_tpu.distributed import Partition, DistVector, make_mesh, comm
from ginkgo_tpu.distributed import vector as dvec


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _smap(mesh, fn, *args, in_specs=None, out_specs=None):
    return shard_map(
        fn, mesh=mesh,
        in_specs=in_specs if in_specs is not None else P("rows"),
        out_specs=out_specs if out_specs is not None else P("rows"),
    )(*args)


def test_all_reduce_ops(mesh):
    x = jnp.arange(8, dtype=jnp.float64).reshape(8, 1) + 1

    def f(v):
        return jnp.stack([
            comm.all_reduce(v[0], "rows", "sum"),
            comm.all_reduce(v[0], "rows", "max"),
            comm.all_reduce(v[0], "rows", "min"),
            comm.all_reduce(v[0], "rows", "prod"),
        ])[None]

    out = np.asarray(_smap(mesh, f, x))[0]
    np.testing.assert_allclose(out[:, 0], [36.0, 8.0, 1.0, 40320.0], rtol=1e-12)


def test_broadcast_gather_scatter(mesh):
    x = jnp.arange(8.0).reshape(8, 1)

    def f(v):
        b = comm.broadcast(v[0], "rows", root=3)
        return b[None]

    out = np.asarray(_smap(mesh, f, x))
    np.testing.assert_array_equal(out[:, 0], np.full(8, 3.0))

    def g(v):
        return comm.scatter(comm.all_gather(v[0], "rows"), "rows")[None]

    out = np.asarray(_smap(mesh, g, x))
    np.testing.assert_array_equal(out, np.asarray(x))


def test_scan_and_ring(mesh):
    x = jnp.ones((8, 1))

    def f(v):
        inc = comm.scan_sum(v[0], "rows")
        exc = comm.scan_sum(v[0], "rows", exclusive=True)
        nxt = comm.send_recv(v[0] * comm.rank("rows"), "rows", shift=1)
        return jnp.stack([inc, exc, nxt])[None]

    out = np.asarray(_smap(mesh, f, x))  # (8, 3, 1)
    np.testing.assert_array_equal(out[:, 0, 0], np.arange(1, 9))
    np.testing.assert_array_equal(out[:, 1, 0], np.arange(8))
    # ring shift: device d receives from d-1, payload = (d-1)
    np.testing.assert_array_equal(out[:, 2, 0], (np.arange(8) - 1) % 8)


def test_dist_vector_reductions_match_oracle(rng):
    n, k = 37, 3
    part = Partition.build_from_global_size_uniform(n, 8)
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((n, k))
    da = DistVector.from_global(jnp.asarray(a), part)
    db = DistVector.from_global(jnp.asarray(b), part)
    np.testing.assert_allclose(np.asarray(da.compute_dot(db)), (a * b).sum(0), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(da.compute_norm2()), np.linalg.norm(a, axis=0), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(da.compute_norm1()), np.abs(a).sum(0), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(da.to_global(part)), a, rtol=1e-15)


def test_shard_level_reductions_match(mesh, rng):
    n, k = 64, 2
    part = Partition.build_from_global_size_uniform(n, 8)
    a = rng.standard_normal((n, k))
    b = rng.standard_normal((n, k))
    da = DistVector.from_global(jnp.asarray(a), part)
    db = DistVector.from_global(jnp.asarray(b), part)

    def f(va, vb):
        d = dvec.dot(va[0], vb[0], "rows")
        n2 = dvec.norm2(va[0], "rows")
        n1 = dvec.norm1(va[0], "rows")
        return jnp.stack([d, n2, n1])[None]

    out = np.asarray(
        shard_map(
            f, mesh=mesh,
            in_specs=(P("rows"), P("rows")),
            out_specs=P("rows"),
        )(da.values, db.values)
    )
    # every shard returns the same reduced values; check shard 0
    np.testing.assert_allclose(out[0, 0], (a * b).sum(0), rtol=1e-12)
    np.testing.assert_allclose(out[0, 1], np.linalg.norm(a, axis=0), rtol=1e-12)
    np.testing.assert_allclose(out[0, 2], np.abs(a).sum(0), rtol=1e-12)


def test_profiler_logger_and_version():
    from ginkgo_tpu.log.profiler import ProfilerRange, profile_region
    from ginkgo_tpu.log.logger import Event
    from ginkgo_tpu.base.version import version_info

    prof = ProfilerRange()
    prof.on(Event.linop_apply_started, name="spmv")
    prof.on(Event.linop_apply_completed, name="spmv")
    prof.on(Event.iteration_complete, iteration=3)
    prof.close()
    with profile_region("test-region"):
        pass
    vi = version_info()
    assert str(vi.core_version).startswith("0.")


def test_all_reduce_prod_signed_and_zero(mesh):
    # MPI_PROD semantics with negatives and zeros (review regression)
    neg = jnp.asarray([1.0, -2.0, 3.0, -1.0, 1.0, 1.0, 1.0, 1.0]).reshape(8, 1)
    wz = jnp.asarray([1.0, -2.0, 0.0, 4.0, 1.0, 1.0, 1.0, 1.0]).reshape(8, 1)

    def f(v):
        return comm.all_reduce(v[0], "rows", "prod")[None]

    out = np.asarray(_smap(mesh, f, neg))
    np.testing.assert_allclose(out[0, 0], 6.0, rtol=1e-6)
    out = np.asarray(_smap(mesh, f, wz))
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-12)

"""Distributed-layer tests on the 8-device virtual CPU mesh
(reference model: test/mpi/distributed/matrix.cpp + test/mpi/solver/solver.cpp,
which compare distributed ops against the replicated-gather reference)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.distributed import (
    Partition,
    DistCsr,
    distributed_solve,
    make_mesh,
    pad_global,
    unpad_global,
)
from ginkgo_tpu.utils import generators


def test_partition_builders():
    p = Partition.build_from_global_size_uniform(10, 3)
    assert list(p.part_sizes) == [4, 3, 3]
    assert p.has_ordered_parts()
    assert p.padded_local_size == 4

    p2 = Partition.build_from_contiguous([0, 2, 5, 10])
    assert list(p2.part_sizes) == [2, 3, 5]

    mapping = [0, 1, 0, 2, 1, 2]
    p3 = Partition.build_from_mapping(mapping, 3)
    assert list(p3.part_sizes) == [2, 2, 2]
    assert not p3.has_ordered_parts()
    np.testing.assert_array_equal(p3.rows_of_part[0], [0, 2])


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_dist_spmv_matches_replicated(rng, ndev):
    mesh = make_mesh(ndev)
    n = 50
    data = generators.make_spd(generators.generate_random_matrix(n, n, 2, 6, rng))
    part = Partition.build_from_global_size_uniform(n, ndev)
    A = DistCsr.from_matrix_data(data, part)
    x = generators.generate_random_dense(n, 2, rng)

    xp, _ = pad_global(x, part)
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, v: a.apply(v),
        mesh=mesh,
        in_specs=(a_specs, P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )(A, xp)
    y_global = unpad_global(y, part)
    expected = data.to_dense() @ x
    np.testing.assert_allclose(np.asarray(y_global), expected, rtol=1e-10, atol=1e-12)


def test_dist_spmv_nonuniform_partition(rng):
    mesh = make_mesh(4)
    n = 23
    data = generators.generate_random_matrix(n, n, 1, 5, rng)
    mapping = rng.integers(0, 4, n)  # scattered ownership
    part = Partition.build_from_mapping(mapping, 4)
    A = DistCsr.from_matrix_data(data, part)
    x = generators.generate_random_dense(n, 1, rng)
    xp, _ = pad_global(x, part)
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, v: a.apply(v),
        mesh=mesh,
        in_specs=(a_specs, P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )(A, xp)
    np.testing.assert_allclose(
        np.asarray(unpad_global(y, part)), data.to_dense() @ x, rtol=1e-10, atol=1e-12
    )


def test_distributed_cg_matches_single_device(rng):
    mesh = make_mesh(8)
    nx = 12
    data = generators.poisson_2d(nx)  # 144 rows over 8 devices
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(n, 8)
    A = DistCsr.from_matrix_data(data, part)
    x_true = rng.standard_normal((n, 2))
    b = data.to_dense() @ x_true

    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-12)]
    x, info = distributed_solve(mesh, gko.Cg, A, b, part, criteria=crit)
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-7, atol=1e-8)

    # matches the single-device solve trajectory
    As = gko.Csr.from_matrix_data(data)
    xs, info_s = gko.Cg.build(criteria=crit).generate(As).solve(b)
    assert abs(int(info.iterations) - int(info_s.iterations)) <= 2


def test_distributed_cg_with_jacobi(rng):
    mesh = make_mesh(4)
    n = 60
    data = generators.make_spd(generators.generate_random_matrix(n, n, 2, 5, rng))
    part = Partition.build_from_global_size_uniform(n, 4)
    A = DistCsr.from_matrix_data(data, part)
    x_true = rng.standard_normal((n, 1))
    b = data.to_dense() @ x_true
    x, info = distributed_solve(
        mesh,
        gko.Cg,
        A,
        b,
        part,
        criteria=[stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-12)],
        preconditioner=gko.Jacobi.build(max_block_size=1),
    )
    assert bool(np.all(np.asarray(info.converged)))
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-6, atol=1e-8)


def test_neighbor_halo_mode_matches_all_gather(rng):
    import jax.numpy as jnp
    from ginkgo_tpu.distributed import Partition, DistCsr, distributed_solve, make_mesh
    from ginkgo_tpu import Cg, stop, generators

    data = generators.poisson_2d(8, dtype=np.float32)  # bandwidth 8 < L
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(n, 8)
    A_nb = DistCsr.from_matrix_data(data, part)  # auto -> neighbor
    assert A_nb.halo_mode == "neighbor"
    A_ag = DistCsr.from_matrix_data(data, part, halo="all_gather")
    assert A_ag.halo_mode == "all_gather"
    mesh = make_mesh(8)
    b = jnp.ones((n, 1), jnp.float32)
    crit = [stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-6)]
    x1, i1 = distributed_solve(mesh, Cg, A_nb, b, part, criteria=crit)
    x2, i2 = distributed_solve(mesh, Cg, A_ag, b, part, criteria=crit)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-6)
    assert int(i1.iterations) == int(i2.iterations)


def test_neighbor_halo_rejects_long_range(rng):
    from ginkgo_tpu.distributed import Partition, DistCsr
    from ginkgo_tpu.base.matrix_data import MatrixData

    # one entry connecting row 0 to the last column: part 0 <-> part 7
    n = 64
    data = MatrixData.from_coo(
        (n, n),
        np.concatenate([np.arange(n), [0]]),
        np.concatenate([np.arange(n), [n - 1]]),
        np.ones(n + 1),
    ).sort_row_major()
    part = Partition.build_from_global_size_uniform(n, 8)
    A = DistCsr.from_matrix_data(data, part)  # auto falls back
    assert A.halo_mode == "all_gather"
    with pytest.raises(ValueError):
        DistCsr.from_matrix_data(data, part, halo="neighbor")


def test_non_uniform_partition_solve(rng):
    """Ragged parts via build_from_mapping (partition.hpp:254 analog):
    distributed solve must match the replicated solve."""
    import jax.numpy as jnp
    from ginkgo_tpu.distributed import Partition, DistCsr, distributed_solve, make_mesh
    from ginkgo_tpu import Cg, stop, generators

    data = generators.poisson_2d(10, dtype=np.float32)  # n = 100
    n = data.shape[0]
    # ragged contiguous parts: sizes 5,20,7,18,10,15,13,12
    sizes = [5, 20, 7, 18, 10, 15, 13, 12]
    assert sum(sizes) == n
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    part = Partition.build_from_contiguous(bounds)
    A = DistCsr.from_matrix_data(data, part)
    mesh = make_mesh(8)
    b = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    crit = [stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-6)]
    x, info = distributed_solve(mesh, Cg, A, b, part, criteria=crit)
    x_ref, _ = gko.Cg.build(criteria=crit).generate(
        gko.Csr.from_matrix_data(data)
    ).solve(b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-5)


def test_partition_mapping_scattered(rng):
    """Non-contiguous ownership via build_from_mapping."""
    import jax.numpy as jnp
    from ginkgo_tpu.distributed import Partition, DistCsr, distributed_solve, make_mesh
    from ginkgo_tpu import Cg, stop, generators

    data = generators.poisson_1d(64, dtype=np.float32)
    n = data.shape[0]
    mapping = rng.integers(0, 8, size=n)  # scattered rows
    part = Partition.build_from_mapping(mapping, 8)
    A = DistCsr.from_matrix_data(data, part)
    assert A.halo_mode == "all_gather"  # scattered halos reach far parts
    mesh = make_mesh(8)
    b = jnp.ones((n, 1), jnp.float32)
    crit = [stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-7)]
    x, info = distributed_solve(mesh, Cg, A, b, part, criteria=crit)
    x_ref, _ = gko.Cg.build(criteria=crit).generate(
        gko.Csr.from_matrix_data(data)
    ).solve(b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=2e-4, atol=2e-5)


def test_dist_dia_matches_replicated(rng):
    """DistDia (two-ppermute window, static-slice SpMV) vs replicated Dia."""
    import jax.numpy as jnp
    from ginkgo_tpu.distributed import (
        DistDia, build_banded_partition, distributed_solve, make_mesh,
    )
    from ginkgo_tpu import Cg, stop, generators

    data = generators.poisson_2d(16, dtype=np.float32)  # n=256, bandwidth 16
    n = data.shape[0]
    part = build_banded_partition(n, 8)  # L = 32 >= bandwidth
    A = DistDia.from_matrix_data(data, part)
    mesh = make_mesh(8)

    # raw SpMV check through shard_map
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    x = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    from ginkgo_tpu.distributed.solve import pad_global, unpad_global

    xp, _ = pad_global(x, part)
    a_specs = __import__("jax").tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, v: a.apply(v),
        mesh=mesh, in_specs=(a_specs, P("rows")), out_specs=P("rows"),
        check_vma=False,
    )(A, xp)
    y = unpad_global(y, part)
    want = np.asarray(data.to_dense()) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5, atol=1e-5)

    # full distributed CG on DistDia
    b = jnp.ones((n, 1), jnp.float32)
    crit = [stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-6)]
    xs, info = distributed_solve(mesh, Cg, A, b, part, criteria=crit)
    r = b - jnp.asarray(want := np.asarray(data.to_dense())) @ xs
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-4, rel


def test_dist_dia_rejects_bad_partition(rng):
    from ginkgo_tpu.distributed import DistDia, Partition
    from ginkgo_tpu import generators

    data = generators.poisson_1d(64, dtype=np.float32)
    bad = Partition.build_from_contiguous([0, 5, 25, 32, 50, 55, 60, 62, 64])
    with pytest.raises(ValueError):
        DistDia.from_matrix_data(data, bad)


@pytest.mark.parametrize("solver_name", ["Bicgstab", "Gmres", "Fcg", "Cgs"])
def test_distribution_transparent_solvers(rng, solver_name):
    """Every Krylov solver runs unchanged on the distributed operator
    (test/mpi/solver/solver.cpp analog)."""
    import jax.numpy as jnp
    from ginkgo_tpu.distributed import Partition, DistCsr, distributed_solve, make_mesh
    from ginkgo_tpu import stop, generators

    solver_cls = getattr(gko, solver_name)
    data = generators.poisson_2d(8, dtype=np.float32)
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(n, 8)
    A = DistCsr.from_matrix_data(data, part)
    mesh = make_mesh(8)
    b = jnp.ones((n, 1), jnp.float32)
    crit = [stop.Iteration(max_iters=150), stop.ResidualNorm(tolerance=1e-5)]
    kw = {"krylov_dim": 20} if solver_name == "Gmres" else {}
    x, info = distributed_solve(mesh, solver_cls, A, b, part, criteria=crit, **kw)
    A_rep = gko.Csr.from_matrix_data(data)
    rel = float(jnp.linalg.norm(b - A_rep.apply(x)) / jnp.linalg.norm(b))
    assert rel < 1e-4, (solver_name, rel)


@pytest.mark.parametrize("solver_name", ["Gmres", "Bicgstab"])
def test_distributed_krylov_on_pell_vs_replicated(rng, solver_name):
    """VERDICT r2 #3: GMRES/BiCGSTAB through distributed_solve on
    DistPell, compared against the REPLICATED solve trajectory (not just
    a residual check) — test/mpi/solver/solver.cpp analog."""
    from ginkgo_tpu.distributed import DistPell

    solver_cls = getattr(gko, solver_name)
    data = generators.poisson_2d(12, dtype=np.float64)  # n=144
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(n, 8)
    A = DistPell.from_matrix_data(data, part)
    mesh = make_mesh(8)
    b = jnp.asarray(rng.standard_normal((n, 1)))
    crit = [stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-9)]
    kw = {"krylov_dim": 25} if solver_name == "Gmres" else {}
    x, info = distributed_solve(
        mesh, solver_cls, A, b, part, criteria=crit, **kw
    )
    x_rep, info_rep = solver_cls.build(criteria=crit, **kw).generate(
        gko.Csr.from_matrix_data(data)
    ).solve(b)
    assert bool(np.all(np.asarray(info.converged)))
    assert abs(int(info.iterations) - int(info_rep.iterations)) <= 2, (
        solver_name, int(info.iterations), int(info_rep.iterations),
    )
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_rep), rtol=1e-6, atol=1e-7
    )


def test_distributed_ir_vs_replicated(rng):
    """IR (Richardson) through distributed_solve (VERDICT r2 #3)."""
    data = generators.poisson_2d(10, dtype=np.float64)
    n = data.shape[0]
    # scale so Richardson (omega=1, M=I) contracts: A has eigs in (0, 8)
    data = gko.MatrixData(data.shape, data.rows, data.cols,
                          data.values / 8.0)
    part = Partition.build_from_global_size_uniform(n, 8)
    A = DistCsr.from_matrix_data(data, part)
    mesh = make_mesh(8)
    b = jnp.ones((n, 1))
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-8)]
    x, info = distributed_solve(mesh, gko.Ir, A, b, part, criteria=crit)
    x_rep, info_rep = gko.Ir.build(criteria=crit).generate(
        gko.Csr.from_matrix_data(data)
    ).solve(b)
    assert int(info.iterations) == int(info_rep.iterations)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_rep), rtol=1e-6, atol=1e-8
    )


@pytest.mark.parametrize("solver_name", ["Cg", "Bicgstab", "Gmres"])
def test_distributed_stopped_columns(rng, solver_name):
    """Deliberately-seeded stopped columns (stopping_status.hpp:62-145
    analog): column 0 converges at iteration ~1 (rhs ≈ A @ e0 scaled
    tiny), column 1 runs long.  Distributed per-column freeze must match
    the replicated solver exactly."""
    solver_cls = getattr(gko, solver_name)
    data = generators.poisson_2d(8, dtype=np.float64)
    n = data.shape[0]
    dense = data.to_dense()
    b = np.empty((n, 2))
    # col 0: b = A @ (tiny constant) -> one Krylov step nails it
    b[:, 0] = dense @ np.full(n, 1e-3)
    b[:, 1] = rng.standard_normal(n)
    part = Partition.build_from_global_size_uniform(n, 8)
    A = DistCsr.from_matrix_data(data, part)
    mesh = make_mesh(8)
    crit = [stop.Iteration(max_iters=120), stop.ResidualNorm(tolerance=1e-10)]
    kw = {"krylov_dim": 20} if solver_name == "Gmres" else {}
    x, info = distributed_solve(
        mesh, solver_cls, A, jnp.asarray(b), part, criteria=crit, **kw
    )
    x_rep, info_rep = solver_cls.build(criteria=crit, **kw).generate(
        gko.Csr.from_matrix_data(data)
    ).solve(jnp.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(info.converged), np.asarray(info_rep.converged)
    )
    assert int(info.iterations) == int(info_rep.iterations)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_rep), rtol=1e-6, atol=1e-8
    )


def test_dist_rectangular_with_col_partition(rng):
    """matrix.cpp:142-225 parity: distinct row/col partitions, rectangular
    operator; distributed apply vs replicated dense product."""
    mesh = make_mesh(4)
    n, m = 30, 44
    data = generators.generate_random_matrix(n, m, 2, 6, rng)
    row_part = Partition.build_from_global_size_uniform(n, 4)
    col_part = Partition.build_from_global_size_uniform(m, 4)
    A = DistCsr.from_matrix_data(data, row_part, col_partition=col_part)
    assert A.shape == (n, m)
    x = generators.generate_random_dense(m, 2, rng)
    xp, _ = pad_global(x, col_part)
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, v: a.apply(v),
        mesh=mesh,
        in_specs=(a_specs, P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )(A, xp)
    y_global = unpad_global(y, row_part)
    np.testing.assert_allclose(
        np.asarray(y_global), data.to_dense() @ x, rtol=1e-10, atol=1e-12
    )


def test_dist_square_scattered_col_partition(rng):
    """col partition != row partition on a square operator: the input and
    output vectors live in different distributions."""
    mesh = make_mesh(4)
    n = 37
    data = generators.make_spd(
        generators.generate_random_matrix(n, n, 2, 5, rng)
    )
    row_part = Partition.build_from_global_size_uniform(n, 4)
    mapping = rng.integers(0, 4, n)  # scattered column ownership
    col_part = Partition.build_from_mapping(mapping, 4)
    A = DistCsr.from_matrix_data(data, row_part, col_partition=col_part)
    x = generators.generate_random_dense(n, 1, rng)
    xp, _ = pad_global(x, col_part)
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, v: a.apply(v),
        mesh=mesh,
        in_specs=(a_specs, P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )(A, xp)
    y_global = unpad_global(y, row_part)
    np.testing.assert_allclose(
        np.asarray(y_global), data.to_dense() @ x, rtol=1e-10, atol=1e-12
    )


def test_dist_apply_advanced(rng):
    mesh = make_mesh(4)
    n = 32
    data = generators.make_spd(
        generators.generate_random_matrix(n, n, 2, 5, rng)
    )
    part = Partition.build_from_global_size_uniform(n, 4)
    A = DistCsr.from_matrix_data(data, part)
    b = generators.generate_random_dense(n, 2, rng)
    x0 = generators.generate_random_dense(n, 2, rng)
    bp, _ = pad_global(b, part)
    xp, _ = pad_global(x0, part)
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, bb, xx: a.apply_advanced(2.0, bb, -0.5, xx),
        mesh=mesh,
        in_specs=(a_specs, P("rows"), P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )(A, bp, xp)
    y_global = unpad_global(y, part)
    np.testing.assert_allclose(
        np.asarray(y_global), 2.0 * (data.to_dense() @ b) - 0.5 * x0,
        rtol=1e-10, atol=1e-12,
    )


def test_dist_pell_matches_replicated(rng):
    """DistPell: both blocks stream via the PELL kernel; result must
    match the replicated product (VERDICT r1 #7 fast path)."""
    from ginkgo_tpu.distributed import DistPell

    mesh = make_mesh(4)
    n = 600
    data = generators.make_spd(
        generators.generate_random_matrix(n, n, 3, 7, rng)
    )
    part = Partition.build_from_global_size_uniform(n, 4)
    A = DistPell.from_matrix_data(data, part)
    x = generators.generate_random_dense(n, 2, rng)
    xp, _ = pad_global(x, part)
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, v: a.apply(v),
        mesh=mesh,
        in_specs=(a_specs, P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )(A, xp)
    y_global = unpad_global(y, part)
    np.testing.assert_allclose(
        np.asarray(y_global), data.to_dense() @ x, rtol=1e-4, atol=1e-5
    )


def test_dist_pell_solve_and_diagonal(rng):
    """Distributed CG on a DistPell operator (scalar-Jacobi via the
    PELL-reconstructed local diagonal)."""
    from ginkgo_tpu.distributed import DistPell, distributed_solve
    import ginkgo_tpu as gko2
    from ginkgo_tpu import stop as stop2

    mesh = make_mesh(4)
    data = generators.poisson_2d(24, dtype=np.float64)
    n = data.shape[0]
    part = Partition.build_from_global_size_uniform(n, 4)
    A = DistPell.from_matrix_data(data, part)
    # diagonal parity vs assembled data
    diag_expected = np.zeros(n)
    dd = data.sum_duplicates()
    on = dd.rows == dd.cols
    np.add.at(diag_expected, dd.rows[on], dd.values[on])
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    d = shard_map(
        lambda a: a.extract_diagonal_local(),
        mesh=mesh, in_specs=(a_specs,), out_specs=P("rows"),
        check_vma=False,
    )(A)
    d_global = unpad_global(np.asarray(d)[:, None], part)[:, 0]
    np.testing.assert_allclose(d_global, diag_expected, rtol=1e-12)
    b = np.ones((n, 1))
    x, info = distributed_solve(
        mesh, gko2.Cg, A, b, part,
        criteria=[stop2.Iteration(500), stop2.ResidualNorm(1e-9)],
    )
    r = data.to_dense() @ np.asarray(x) - b
    assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(b)


def test_read_distributed_auto_choice():
    """read_distributed picks the fastest suitable distributed operator:
    DistDia for banded data on a block partition, DistPell for general
    unstructured, DistCsr for hopeless patterns (with a hint)."""
    import warnings

    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.distributed import Partition, read_distributed
    from ginkgo_tpu.distributed.dia import DistDia, build_banded_partition
    from ginkgo_tpu.distributed.pell import DistPell
    from ginkgo_tpu.distributed.matrix import DistCsr
    from ginkgo_tpu.utils import generators

    # banded + block partition -> DistDia
    data = generators.poisson_2d(16, dtype=np.float32)
    part = build_banded_partition(data.shape[0], 4)
    A = read_distributed(data, part)
    assert isinstance(A, DistDia)

    # unstructured with locality -> DistPell
    rng = np.random.default_rng(0)
    n = 512
    rows = np.repeat(np.arange(n), 6)
    cols = np.clip(rows + rng.integers(-40, 41, size=rows.size), 0, n - 1)
    vals = rng.standard_normal(rows.size).astype(np.float32)
    d2 = MatrixData.from_coo((n, n), rows, cols, vals).sum_duplicates()
    p2 = Partition.build_from_contiguous(np.asarray([0, 128, 256, 384, 512]))
    B = read_distributed(d2, p2)
    assert isinstance(B, DistPell)

    # locality-free scatter -> DistWell (round 4: the windowed
    # chained-gather layout replaces the gather fallback here)
    from ginkgo_tpu.distributed.well import DistWell

    nb = 4096
    rows3 = rng.integers(0, nb, size=3 * nb)
    cols3 = rng.integers(0, nb, size=3 * nb)
    d3 = MatrixData.from_coo(
        (nb, nb), rows3, cols3, np.ones(3 * nb, np.float32)
    ).sum_duplicates()
    p3 = Partition.build_from_contiguous(
        np.asarray([0, 1024, 2048, 3072, 4096])
    )
    C = read_distributed(d3, p3, max_pell_inflation=4.0)
    assert isinstance(C, DistWell)

    # hyper-sparse scatter (1 nnz/row over 64k cols): even WELL inflates
    # past its gate -> DistCsr + PerformanceHint
    nh = 1 << 16
    d4 = MatrixData.from_coo(
        (nh, nh), np.arange(nh), rng.integers(0, nh, size=nh),
        np.ones(nh, np.float32),
    ).sum_duplicates()
    p4 = Partition.build_from_contiguous(
        np.asarray([0, nh // 2, nh])
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        D = read_distributed(d4, p4, max_pell_inflation=4.0)
    assert isinstance(D, DistCsr) and not isinstance(D, DistPell)
    assert any("PerformanceHint" in str(x.message) for x in w)


def test_dist_well_matches_replicated(rng):
    """DistWell: locality-free local/non-local blocks stream via the
    WELL chained-gather kernel; result must match the replicated
    product."""
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.distributed import DistWell

    mesh = make_mesh(4)
    n = 600
    rows = rng.integers(0, n, size=5 * n)
    cols = rng.integers(0, n, size=5 * n)
    data = MatrixData.from_coo(
        (n, n),
        np.concatenate([rows, np.arange(n)]),
        np.concatenate([cols, np.arange(n)]),
        np.concatenate([
            rng.standard_normal(rows.size) * 1e-1, np.full(n, 4.0)
        ]),
    ).sum_duplicates()
    part = Partition.build_from_global_size_uniform(n, 4)
    A = DistWell.from_matrix_data(data, part)
    x = generators.generate_random_dense(n, 2, rng)
    xp, _ = pad_global(x, part)
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    y = shard_map(
        lambda a, v: a.apply(v),
        mesh=mesh,
        in_specs=(a_specs, P("rows")),
        out_specs=P("rows"),
        check_vma=False,
    )(A, xp)
    y_global = unpad_global(y, part)
    np.testing.assert_allclose(
        np.asarray(y_global), data.to_dense() @ x, rtol=1e-4, atol=1e-5
    )


def test_dist_well_solve_and_diagonal(rng):
    """Distributed BiCGSTAB on a DistWell operator (scalar-Jacobi via
    the chained-gather-reconstructed local diagonal)."""
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.distributed import DistWell, distributed_solve
    import ginkgo_tpu as gko2
    from ginkgo_tpu import stop as stop2

    mesh = make_mesh(4)
    n = 512
    rows = rng.integers(0, n, size=4 * n)
    cols = rng.integers(0, n, size=4 * n)
    data = MatrixData.from_coo(
        (n, n),
        np.concatenate([rows, np.arange(n)]),
        np.concatenate([cols, np.arange(n)]),
        np.concatenate([
            rng.standard_normal(rows.size) * 1e-2, np.full(n, 3.0)
        ]),
    ).sum_duplicates()
    part = Partition.build_from_global_size_uniform(n, 4)
    A = DistWell.from_matrix_data(data, part)
    # diagonal parity vs assembled data
    diag_expected = np.zeros(n)
    dd = data.sum_duplicates()
    on = dd.rows == dd.cols
    np.add.at(diag_expected, dd.rows[on], dd.values[on])
    a_specs = jax.tree_util.tree_map(lambda _: P("rows"), A)
    d = shard_map(
        lambda a: a.extract_diagonal_local(),
        mesh=mesh, in_specs=(a_specs,), out_specs=P("rows"),
        check_vma=False,
    )(A)
    d_global = unpad_global(np.asarray(d)[:, None], part)[:, 0]
    np.testing.assert_allclose(d_global, diag_expected, rtol=1e-12)
    b = np.ones((n, 1))
    x, info = distributed_solve(
        mesh, gko2.Bicgstab, A, b, part,
        criteria=[stop2.Iteration(500), stop2.ResidualNorm(1e-9)],
    )
    r = data.to_dense() @ np.asarray(x) - b
    assert np.linalg.norm(r) < 1e-6 * np.linalg.norm(b)

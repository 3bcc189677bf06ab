"""Row-partitioned distributed CG over a device mesh.

Reference: examples/distributed-solver/distributed-solver.cpp:60-170
(partition build, read_distributed, CG on the distributed operator).  On
TPU the MPI ranks become mesh devices; halo exchange and dot-product
reductions run as XLA collectives inside shard_map.

Run with 8 virtual devices on CPU:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/distributed_solver.py
"""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.distributed import Partition, DistCsr, distributed_solve, make_mesh


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    data = gko.generators.poisson_2d(16, dtype=np.float32)
    n = data.shape[0]

    # build_from_global_size_uniform (partition.hpp:254-284 analog)
    part = Partition.build_from_global_size_uniform(n, n_dev)
    A = DistCsr.from_matrix_data(data, part)  # read_distributed analog
    b = jnp.ones((n, 1), jnp.float32)

    crit = [stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-6)]
    x, info = distributed_solve(mesh, gko.Cg, A, b, part, criteria=crit)
    # verify against the replicated operator
    A_rep = gko.Csr.from_matrix_data(data)
    r = b - A_rep.apply(x)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    print(f"DistCsr  {n_dev} devices: iters {int(info.iterations)}, rel|r| {rel:.2e}")

    # banded fast path: DistDia (two-ppermute window halos, zero gather)
    from ginkgo_tpu.distributed import DistDia, build_banded_partition

    part2 = build_banded_partition(n, n_dev)
    A2 = DistDia.from_matrix_data(data, part2)
    x2, info2 = distributed_solve(mesh, gko.Cg, A2, b, part2, criteria=crit)
    rel2 = float(jnp.linalg.norm(b - A_rep.apply(x2)) / jnp.linalg.norm(b))
    print(f"DistDia  {n_dev} devices: iters {int(info2.iterations)}, rel|r| {rel2:.2e}")


if __name__ == "__main__":
    main()

"""Adaptive-precision block-Jacobi preconditioner.

Reference: examples/adaptiveprecision-blockjacobi.cpp (storage_optimization
= precision_reduction autodetect; blocks store in reduced precision when
their conditioning allows)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop, precision_reduction
from ginkgo_tpu.preconditioner import JacobiFactory


def main():
    data = gko.generators.poisson_2d(16, dtype=np.float32)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]

    full = gko.Cg.build(
        criteria=crit, preconditioner=JacobiFactory(max_block_size=8)
    ).generate(A)
    adaptive = gko.Cg.build(
        criteria=crit,
        preconditioner=JacobiFactory(
            max_block_size=8, storage_optimization=precision_reduction(0, 1)
        ),
    ).generate(A)

    _, i_full = full.solve(b)
    _, i_adap = adaptive.solve(b)
    print(f"CG iters: full-precision blocks {int(i_full.iterations)}, "
          f"reduced-storage blocks {int(i_adap.iterations)}")


if __name__ == "__main__":
    main()

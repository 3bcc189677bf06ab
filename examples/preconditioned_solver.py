"""Block-Jacobi preconditioned CG.

Reference: examples/preconditioned-solver.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.preconditioner import JacobiFactory


def main():
    data = gko.generators.poisson_2d(24, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    crit = [stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-10)]

    plain = gko.Cg.build(criteria=crit).generate(A)
    precond = gko.Cg.build(
        criteria=crit, preconditioner=JacobiFactory(max_block_size=8)
    ).generate(A)

    _, ip = plain.solve(b)
    _, im = precond.solve(b)
    print(f"CG iterations: plain {int(ip.iterations)}, block-Jacobi {int(im.iterations)}")


if __name__ == "__main__":
    main()

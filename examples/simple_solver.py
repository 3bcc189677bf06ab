"""Read a matrix from .mtx, solve with CG, check the residual.

Reference: examples/simple-solver/simple-solver.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import os
import tempfile

import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main():
    # write + read a MatrixMarket file (gko::read analog)
    data = gko.generators.poisson_1d(100, dtype=np.float64)
    path = os.path.join(tempfile.gettempdir(), "simple_solver_A.mtx")
    gko.write_raw(path, data)
    A = gko.read(path)  # CSR by default

    b = jnp.ones((A.shape[0], 1), A.dtype)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=1000), stop.ResidualNorm(tolerance=1e-10)]
    ).generate(A)
    x, info = solver.solve(b)

    r = b - A.apply(x)
    print(f"iterations: {int(info.iterations)}")
    print(f"residual norm: {float(jnp.linalg.norm(r)):.3e}")


if __name__ == "__main__":
    main()

"""Iterative refinement with an inner CG solver.

Reference: examples/iterative-refinement.cpp (Ir factory with a CG inner
solver stopped loosely)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main():
    data = gko.generators.poisson_1d(200, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)

    inner = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=20), stop.ResidualNorm(tolerance=1e-2)]
    )
    # the inner solver rides the "preconditioner" slot (ir.hpp's `solver`)
    solver = gko.Ir.build(
        criteria=[stop.Iteration(max_iters=50), stop.ResidualNorm(tolerance=1e-12)],
        preconditioner=inner,
    ).generate(A)
    x, info = solver.solve(b)
    r = b - A.apply(x)
    print(f"IR outer iterations {int(info.iterations)}, |r| {float(jnp.linalg.norm(r)):.2e}")


if __name__ == "__main__":
    main()

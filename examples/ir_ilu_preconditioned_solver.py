"""IR outer loop around an ILU-preconditioned CG inner solver.

Reference: examples/ir-ilu-preconditioned-solver.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.preconditioner.ilu import IluPreconditionerFactory


def main():
    data = gko.generators.poisson_2d(12, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)

    inner = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=10)],
        preconditioner=IluPreconditionerFactory(),
    )
    solver = gko.Ir.build(
        criteria=[stop.Iteration(max_iters=40), stop.ResidualNorm(tolerance=1e-12)],
        preconditioner=inner,
    ).generate(A)
    x, info = solver.solve(b)
    r = b - A.apply(x)
    print(f"outer iters {int(info.iterations)}, |r| {float(jnp.linalg.norm(r)):.2e}")


if __name__ == "__main__":
    main()

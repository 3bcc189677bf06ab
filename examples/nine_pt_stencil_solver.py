"""2-D 9-point stencil Poisson solve, DIA format fast path.

Reference: examples/nine-pt-stencil-solver.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main(nx=24):
    data = gko.generators.poisson_2d_9pt(nx, dtype=np.float64)
    A = gko.Dia.from_matrix_data(data)  # banded stencil -> DIA fast path
    n = data.shape[0]
    b = jnp.ones((n, 1), A.dtype)
    x, info = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=2000), stop.ResidualNorm(tolerance=1e-10)]
    ).generate(A).solve(b)
    r = b - A.apply(x)
    print(f"n={n} iters={int(info.iterations)} |r|={float(jnp.linalg.norm(r)):.2e}")


if __name__ == "__main__":
    main()

"""3-point stencil assembled as COO triples, solved with CG.

Reference: examples/three-pt-stencil-solver.cpp (assembles row/col/val
arrays directly)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main(n=64):
    rows, cols, vals = [], [], []
    for i in range(n):
        for j, v in ((i - 1, -1.0), (i, 2.0), (i + 1, -1.0)):
            if 0 <= j < n:
                rows.append(i)
                cols.append(j)
                vals.append(v)
    data = gko.MatrixData.from_coo(
        (n, n), np.array(rows), np.array(cols), np.array(vals, np.float64)
    )
    A = gko.Csr.from_matrix_data(data)
    x_true = np.linspace(0, 1, n)
    b = jnp.asarray(data.to_dense() @ x_true)[:, None]
    x, info = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A).solve(b)
    print(f"iters {int(info.iterations)}, err {np.abs(np.asarray(x)[:,0]-x_true).max():.2e}")


if __name__ == "__main__":
    main()

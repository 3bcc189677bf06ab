"""Inverse iteration: smallest eigenpair via repeated shifted solves.

Reference: examples/inverse-iteration.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main(n=64, iters=12):
    data = gko.generators.poisson_1d(n, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=2000), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((n, 1)))
    for _ in range(iters):
        w, _ = solver.solve(v)
        v = w / jnp.linalg.norm(w)
    lam = float((v.T @ A.apply(v))[0, 0])

    exact = 2.0 - 2.0 * np.cos(np.pi / (n + 1))  # smallest eig of tridiag(-1,2,-1)
    print(f"inverse iteration lambda = {lam:.8f}, exact = {exact:.8f}")


if __name__ == "__main__":
    main()

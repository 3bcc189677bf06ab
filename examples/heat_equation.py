"""1-D heat equation, implicit Euler: one CG solve per time step.

Reference: examples/heat-equation.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main(n=128, steps=20, dt=1e-4, kappa=1.0):
    h = 1.0 / (n + 1)
    lap = gko.generators.poisson_1d(n, dtype=np.float64)  # h^2 * (-Laplacian)
    # system matrix: I + dt*kappa/h^2 * tridiag(-1,2,-1)
    dense = np.eye(n) + dt * kappa / h**2 * lap.to_dense()
    A = gko.Csr.from_matrix_data(gko.MatrixData.from_dense(dense))
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=1000), stop.ResidualNorm(tolerance=1e-10)]
    ).generate(A)

    xs = np.linspace(h, 1 - h, n)
    u = jnp.asarray(np.exp(-100 * (xs - 0.5) ** 2))[:, None]  # gaussian bump
    e0 = float(jnp.sum(u))
    for _ in range(steps):
        u, _ = solver.solve(u)
    print(f"heat: mass {e0:.4f} -> {float(jnp.sum(u)):.4f}, "
          f"peak {float(jnp.max(u)):.4f} (diffused)")


if __name__ == "__main__":
    main()

"""1-D Poisson problem: assemble, solve, compare to the closed form.

Reference: examples/poisson-solver/poisson-solver.cpp (u'' = f with
Dirichlet boundary, discretized on n interior points)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main(n=100):
    h = 1.0 / (n + 1)
    # -u'' = f, u(0)=u0, u(1)=u1; manufactured solution u = x^3
    u0, u1 = 0.0, 1.0
    xs = np.linspace(h, 1.0 - h, n)
    f = -6.0 * xs  # -u'' for u = x^3

    data = gko.generators.poisson_1d(n, dtype=np.float64)  # tridiag(-1,2,-1)
    A = gko.Csr.from_matrix_data(data)
    rhs = f * h * h  # A u = h^2 (-u'') + boundary terms
    rhs[0] += u0
    rhs[-1] += u1
    b = jnp.asarray(rhs)[:, None]

    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=2000), stop.ResidualNorm(tolerance=1e-12)]
    ).generate(A)
    x, info = solver.solve(b)

    u_exact = xs**3
    err = float(np.max(np.abs(np.asarray(x)[:, 0] - u_exact)))
    assert err < 1e-4, f"discretization error unexpectedly large: {err}"
    print(f"iterations: {int(info.iterations)}, max error vs x^3: {err:.3e}")


if __name__ == "__main__":
    main()

"""AMG-preconditioned CG (one PGM V-cycle per iteration).

Reference: examples/multigrid-preconditioned-solver.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.solver.multigrid import MultigridFactory


def main():
    data = gko.generators.poisson_2d(24, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    crit = [stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-10)]

    mg = MultigridFactory(criteria=[stop.Iteration(max_iters=1)], min_coarse_rows=16)
    plain = gko.Cg.build(criteria=crit).generate(A)
    amg_cg = gko.Cg.build(criteria=crit, preconditioner=mg).generate(A)

    _, ip = plain.solve(b)
    _, im = amg_cg.solve(b)
    print(f"CG iters: plain {int(ip.iterations)}, AMG-preconditioned {int(im.iterations)}")


if __name__ == "__main__":
    main()

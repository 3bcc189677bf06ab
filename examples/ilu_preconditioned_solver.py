"""ILU(0)-preconditioned BiCGSTAB.

Reference: examples/ilu-preconditioned-solver.cpp (generates the factors
with factorization::ParIlu, wraps them in preconditioner::Ilu)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.preconditioner.ilu import IluPreconditionerFactory


def main():
    data = gko.generators.poisson_2d(16, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    crit = [stop.Iteration(max_iters=300), stop.ResidualNorm(tolerance=1e-10)]

    plain = gko.Bicgstab.build(criteria=crit).generate(A)
    ilu = gko.Bicgstab.build(
        criteria=crit, preconditioner=IluPreconditionerFactory()
    ).generate(A)

    _, ip = plain.solve(b)
    _, im = ilu.solve(b)
    print(f"BiCGSTAB iterations: plain {int(ip.iterations)}, ILU {int(im.iterations)}")


if __name__ == "__main__":
    main()

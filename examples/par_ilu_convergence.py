"""ParILU sweep-count study: factorization residual vs sweeps.

Reference: examples/par-ilu-convergence.cpp (measures ||A - LU|| as the
asynchronous fixed-point sweeps progress)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu.factorization.par_ilu import ParIluFactory


def main():
    data = gko.generators.poisson_2d(12, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    Ad = jnp.asarray(data.to_dense())
    for sweeps in (0, 1, 2, 4, 8):
        fact = ParIluFactory(iterations=sweeps).generate(A)
        L, U = fact.l_factor, fact.u_factor
        res = float(jnp.linalg.norm(
            jnp.asarray(L.to_dense().values) @ jnp.asarray(U.to_dense().values) - Ad
        ))
        print(f"sweeps={sweeps}: ||LU - A||_F on pattern = {res:.4e}")


if __name__ == "__main__":
    main()

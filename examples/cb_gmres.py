"""Compressed-basis GMRES: Krylov basis stored in reduced precision.

Reference: examples/cb-gmres.cpp (storage_precision modes,
cb_gmres.hpp:88-95)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def main():
    data = gko.generators.poisson_2d(16, dtype=np.float32)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    crit = [stop.Iteration(max_iters=400), stop.ResidualNorm(tolerance=1e-6)]

    for mode in ("keep", "reduce1", "integer"):
        solver = gko.CbGmres.build(
            criteria=crit, krylov_dim=30, storage_precision=mode
        ).generate(A)
        x, info = solver.solve(b)
        r = b - A.apply(x)
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
        print(f"storage={mode:8s} iters={int(info.iterations):3d} rel|r|={rel:.2e}")


if __name__ == "__main__":
    main()

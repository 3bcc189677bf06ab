"""Mixed-precision multigrid: coarse-level hierarchy in bf16.

Reference: examples/mixed-multigrid-solver.cpp (float lower levels under a
double finest level)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.solver.multigrid import MultigridFactory


def main():
    data = gko.generators.poisson_2d(20, dtype=np.float32)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    crit = [stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-6)]

    for levels_dtype, label in ((None, "f32 hierarchy"), (jnp.bfloat16, "bf16 levels")):
        mg = MultigridFactory(
            criteria=[stop.Iteration(max_iters=1)], min_coarse_rows=16
        )
        solver = gko.Cg.build(criteria=crit, preconditioner=mg).generate(
            A if levels_dtype is None else A.astype(jnp.float32)
        )
        x, info = solver.solve(b)
        r = b - A.apply(x)
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
        print(f"{label}: iters {int(info.iterations)}, rel|r| {rel:.2e}")


if __name__ == "__main__":
    main()

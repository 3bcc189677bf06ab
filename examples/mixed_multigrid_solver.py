"""Mixed-precision multigrid: the AMG hierarchy runs in bf16 under an f32
outer Krylov solver.

Reference: examples/mixed-multigrid-solver.cpp (float lower levels under a
double finest level)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.solver.multigrid import MultigridFactory


class ReducedPrecisionMg:
    """Preconditioner factory: builds the whole AMG hierarchy from a
    reduced-precision copy of the operator and casts at the boundary
    (the precision_dispatch pattern)."""

    def __init__(self, dtype=jnp.bfloat16, **mg_params):
        self.dtype = dtype
        self.mg_params = mg_params

    def generate(self, A):
        low = A.astype(self.dtype)
        mg = MultigridFactory(**self.mg_params).generate(low)
        outer_dtype = A.dtype

        class _Apply:
            shape = A.shape
            dtype = outer_dtype

            def apply(self, r):
                z, _ = mg.solve(r.astype(low.dtype))
                return z.astype(outer_dtype)

        return _Apply()


def main():
    data = gko.generators.poisson_2d(20, dtype=np.float32)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    crit = [stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-6)]
    mg_params = dict(criteria=[stop.Iteration(max_iters=1)], min_coarse_rows=16)

    for label, precond in (
        ("f32 hierarchy", MultigridFactory(**mg_params)),
        ("bf16 hierarchy", ReducedPrecisionMg(jnp.bfloat16, **mg_params)),
    ):
        solver = gko.Cg.build(criteria=crit, preconditioner=precond).generate(A)
        x, info = solver.solve(b)
        r = b - A.apply(x)
        rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
        print(f"{label}: iters {int(info.iterations)}, rel|r| {rel:.2e}")


if __name__ == "__main__":
    main()

"""Mixed-precision iterative refinement: bf16 inner solve, f32 outer residual.

Reference: examples/mixed-precision-ir.cpp (double outer, float inner).
On TPU the natural pair is f32 outer / bf16 inner — the inner operator
storage halves and the MXU/VPU run at bf16 rates."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


class Bf16InnerCg:
    """Inner-solver factory: casts the operator to bf16 and solves in bf16,
    returning the correction in the outer dtype (precision_dispatch analog)."""

    def __init__(self, iters=15):
        self.iters = iters

    def generate(self, A):
        A16 = A.astype(jnp.bfloat16)
        inner = gko.Cg.build(
            criteria=[stop.Iteration(max_iters=self.iters)]
        ).generate(A16)
        outer_dtype = A.dtype

        class _Apply:
            shape = A.shape
            dtype = outer_dtype

            def apply(self, r):
                x, _ = inner.solve(r.astype(jnp.bfloat16))
                return x.astype(outer_dtype)

        return _Apply()


def main():
    data = gko.generators.poisson_1d(128, dtype=np.float32)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    solver = gko.Ir.build(
        criteria=[stop.Iteration(max_iters=60), stop.ResidualNorm(tolerance=1e-6)],
        preconditioner=Bf16InnerCg(),
    ).generate(A)
    x, info = solver.solve(b)
    r = b - A.apply(x)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    print(f"outer iters {int(info.iterations)}, relative |r| {rel:.2e}")


if __name__ == "__main__":
    main()

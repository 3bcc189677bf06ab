"""User-defined matrix-free operator plugged into the solver stack.

Reference: examples/custom-matrix-format.cpp (a user LinOp with its own
CUDA kernel).  Here the custom operator is a matrix-free 3-point stencil
apply — any object with shape/dtype/apply duck-types as a LinOp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.base.linop import LinOp, linop_dataclass, static_field


@linop_dataclass
class StencilMatrix(LinOp):
    """Matrix-free tridiag(-1, 2, -1): apply is pure XLA, no storage."""

    n: int = static_field(default=0)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return jnp.float64

    def apply(self, b):
        up = jnp.concatenate([b[1:], jnp.zeros_like(b[:1])], axis=0)
        down = jnp.concatenate([jnp.zeros_like(b[:1]), b[:-1]], axis=0)
        return 2.0 * b - up - down


def main(n=100):
    A = StencilMatrix(n=n)
    b = jnp.ones((n, 1), jnp.float64)
    x, info = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=2000), stop.ResidualNorm(tolerance=1e-10)]
    ).generate(A).solve(b)
    r = b - A.apply(x)
    print(f"matrix-free CG: iters {int(info.iterations)}, |r| {float(jnp.linalg.norm(r)):.2e}")


if __name__ == "__main__":
    main()

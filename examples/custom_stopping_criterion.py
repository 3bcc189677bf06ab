"""User-defined stopping criterion fused into the solver loop.

Reference: examples/custom-stopping-criterion.cpp (a Criterion subclass).
Any Criterion whose check(ctx) returns a per-column bool mask composes
with the built-ins — it runs inside lax.while_loop, no host syncs."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.base.linop import linop_dataclass, static_field


@linop_dataclass
class ResidualDropCriterion(stop.Criterion):
    """Stop once the residual has dropped by `factor` from the initial one."""

    factor: float = static_field(default=1e6)
    needs_residual_norm = True

    def check(self, ctx):
        return ctx["residual_norm"] * self.factor <= ctx["initial_resnorm"]


def main():
    data = gko.generators.poisson_1d(80, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), ResidualDropCriterion(factor=1e8)]
    ).generate(A)
    x, info = solver.solve(b)
    r = b - A.apply(x)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    print(f"stopped at iter {int(info.iterations)} with rel|r| {rel:.2e}")


if __name__ == "__main__":
    main()

"""Built-in loggers: Convergence summary + Stream event trace.

Reference: examples/simple-solver-logging.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import io
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.log.logger import Convergence, Stream, Event


def main():
    data = gko.generators.poisson_1d(64, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-10)]
    ).generate(A)

    conv = Convergence()
    buf = io.StringIO()
    trace = Stream(events={Event.iteration_complete}, out=buf)
    x, info = solver.solve_chunked(b, chunk=25, loggers=[conv, trace])

    print(f"converged: {conv.has_converged}, iterations: {conv.num_iterations}")
    print(f"final residual norm: {conv.residual_norm}")
    print(f"stream logged {len(buf.getvalue().splitlines())} events")


if __name__ == "__main__":
    main()

"""User-defined logger collecting per-iteration residual history.

Reference: examples/custom-logger.cpp (a Logger subclass overriding
on_iteration_complete)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.log.logger import Logger, Event


class ResidualHistoryLogger(Logger):
    def __init__(self):
        super().__init__({Event.iteration_complete})
        self.history = []

    def on(self, event, **data):
        rn = data.get("residual_norm")
        if rn is not None:
            self.history.append(float(np.max(np.asarray(rn))))


def main():
    data = gko.generators.poisson_1d(64, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=200), stop.ResidualNorm(tolerance=1e-10)],
        track_history=True,  # record per-iteration residuals in-graph
    ).generate(A)
    lg = ResidualHistoryLogger()
    # default solve() path: iteration_complete is replayed from SolveInfo
    x, info = solver.solve(b, loggers=[lg])
    print(f"{int(info.iterations)} iterations, history points {len(lg.history)}")
    print("first/last residuals:", lg.history[0], lg.history[-1])


if __name__ == "__main__":
    main()

"""Performance debugging: Counters logger + phase timing.

Reference: examples/performance-debugging.cpp (OperationLogger-style
aggregation of per-operation time)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import time

import numpy as np
import jax
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.log.logger import Counters


def main():
    data = gko.generators.poisson_2d(24, dtype=np.float64)

    t0 = time.perf_counter()
    A = gko.Csr.from_matrix_data(data)
    t_assembly = time.perf_counter() - t0

    b = jnp.ones((A.shape[0], 1), A.dtype)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-10)]
    ).generate(A)

    counters = Counters()
    t0 = time.perf_counter()
    x, info = solver.solve_chunked(b, chunk=50, loggers=[counters])
    jax.block_until_ready(x)
    t_solve = time.perf_counter() - t0

    print(f"assembly: {t_assembly*1e3:.2f} ms, solve: {t_solve*1e3:.2f} ms "
          f"({int(info.iterations)} iterations)")
    for name, cnt in sorted(counters.counts.items()):
        print(f"  event {name}: x{cnt}")


if __name__ == "__main__":
    main()

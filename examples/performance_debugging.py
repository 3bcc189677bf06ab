"""Performance debugging: Counters logger + phase timing + kernel counts.

Reference: examples/performance-debugging.cpp (OperationLogger-style
aggregation of per-operation time; logger.hpp:148-481 operation events).

Kernel-level activity: Pallas entry points are wrapped with
`logged_kernel`, which emits operation_launched/completed through the
GLOBAL logger registry (under jit these fire once per trace — the honest
signal of XLA's dispatch model; eager applies fire per call)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import time

import numpy as np
import jax
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.log.logger import (
    Counters,
    add_global_logger,
    remove_global_logger,
)


def main():
    import os

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        # demonstrate the kernel counters on the CPU tier too: force the
        # fused whole-solve kernel (interpret mode)
        os.environ.setdefault("GINKGO_TPU_FORCE_VMEM_CG", "1")
    dtype = np.float32
    data = gko.generators.poisson_2d(24, dtype=dtype)

    t0 = time.perf_counter()
    # Dia keeps the banded stencil on the gather-free Pallas kernels
    A = gko.Dia.from_matrix_data(data)
    t_assembly = time.perf_counter() - t0

    b = jnp.ones((A.shape[0], 1), A.dtype)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-6)]
    ).generate(A)

    counters = Counters()
    add_global_logger(counters)  # kernel events ride the global registry
    try:
        t0 = time.perf_counter()
        x, info = solver.solve_chunked(b, chunk=50, loggers=[counters])
        jax.block_until_ready(x)
        t_solve = time.perf_counter() - t0
        # plain solve(): eligible for the whole-solve fused kernel, whose
        # launch the kernel counters observe (once per trace under jit)
        x2, _ = solver.solve(b)
        jax.block_until_ready(x2)
    finally:
        remove_global_logger(counters)

    print(f"assembly: {t_assembly*1e3:.2f} ms, solve: {t_solve*1e3:.2f} ms "
          f"({int(info.iterations)} iterations)")
    for name, cnt in sorted(counters.counts.items()):
        print(f"  event {name}: x{cnt}")
    for name, cnt in sorted(counters.kernel_counts.items()):
        print(f"  kernel {name}: x{cnt} "
              f"({counters.op_seconds[name]*1e3:.2f} ms traced)")


if __name__ == "__main__":
    main()

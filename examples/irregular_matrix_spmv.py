"""SpMV and solves on a locality-free (power-law graph) matrix.

The hard case for any ELL-style padded layout: Zipf-distributed degrees
and hub columns with no designed-in locality.  `gko.choose_format` (and
`Csr("auto")`) route such patterns to the WELL windowed-chained-gather
format (matrix/well.py) — the TPU-native answer to the reference's
load-balanced / merge-path CSR kernels
(reference: cuda/matrix/csr_kernels.cu:121-310,
include/ginkgo/core/matrix/hybrid.hpp:206-241 imbalance split).

On a v5e chip the measured gap is ~270x over the gather fallback
(benchmark/results/bench_r4_session1.json, powerlaw rows)."""
import _path_setup  # noqa: F401

import numpy as np
import jax.numpy as jnp
import ginkgo_tpu as gko
from ginkgo_tpu import stop


def powerlaw_graph(n, seed=0):
    rng = np.random.default_rng(seed)
    deg = np.minimum(rng.zipf(2.1, size=n) + 2, 64)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    # targets biased toward low ids: heavy hub columns
    cols = np.minimum((rng.random(rows.size) ** 2.5 * n).astype(np.int64),
                      n - 1)
    return gko.MatrixData.from_coo(
        (n, n),
        np.concatenate([rows, np.arange(n)]),
        np.concatenate([cols, np.arange(n)]),
        np.concatenate([
            rng.random(rows.size).astype(np.float32) * 1e-2,
            np.full(n, 2.0, np.float32),  # diagonal dominance
        ]),
    ).sum_duplicates()


def main():
    data = powerlaw_graph(1 << 12)
    A = gko.choose_format(data)  # -> Well for this pattern
    print(f"chosen format: {type(A).__name__}  "
          f"(inflation {A.inflation:.1f}x, nnz {A.nnz})")

    x = jnp.ones((A.shape[1],), jnp.float32)
    y = A.apply(x)
    ref = gko.Csr.from_matrix_data(data).with_strategy("classical").apply(x)
    print(f"SpMV max abs diff vs gather CSR: "
          f"{float(jnp.max(jnp.abs(y - ref))):.2e}")

    # the format is a first-class solver operand
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    solver = gko.Bicgstab.build(
        criteria=[stop.Iteration(max_iters=200),
                  stop.ResidualNorm(tolerance=1e-6)]
    ).generate(A)
    xs, info = solver.solve(b)
    r = b - A.apply(xs)
    print(f"BiCGSTAB iterations: {int(info.iterations)}, "
          f"residual {float(jnp.linalg.norm(r)):.3e}")


if __name__ == "__main__":
    main()

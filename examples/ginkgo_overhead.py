"""Measure framework dispatch overhead: tiny apply vs raw XLA call.

Reference: examples/ginkgo-overhead.cpp (measures LinOp::apply overhead)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import time

import numpy as np
import jax
import jax.numpy as jnp
import ginkgo_tpu as gko


def main(reps=200):
    data = gko.generators.poisson_1d(8, dtype=np.float32)
    A = gko.Csr.from_matrix_data(data)
    x = jnp.ones((8,), jnp.float32)

    apply_jit = jax.jit(A.apply)
    jax.block_until_ready(apply_jit(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = apply_jit(x)
    jax.block_until_ready(y)
    t_linop = (time.perf_counter() - t0) / reps

    f = jax.jit(lambda v: v * 2.0)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
    jax.block_until_ready(y)
    t_raw = (time.perf_counter() - t0) / reps

    print(f"LinOp.apply dispatch: {t_linop*1e6:.1f} us/call, "
          f"raw jitted op: {t_raw*1e6:.1f} us/call, "
          f"overhead {max(0.0, (t_linop-t_raw))*1e6:.1f} us")


if __name__ == "__main__":
    main()

"""Dense BLAS-1/2 benchmark: dot/norm/axpy/scal/gemv throughput.

Reference: benchmark/blas/blas.cpp (BenchmarkOperation table: copy, axpy,
scal, dot, norm, mm, gemm...).

    python -m ginkgo_tpu.benchmark.blas --size 1048576
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

from . import general


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--size", type=int, default=1 << 20, help="vector length n")
    p.add_argument("--ops", default="axpy,scal,dot,norm2,copy,gemv")
    args = p.parse_args(argv)

    n = args.size
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.dtype(args.dtype)
    rng = np.random.default_rng(args.seed)
    x = jnp.asarray(rng.standard_normal(n)).astype(dtype)
    y = jnp.asarray(rng.standard_normal(n)).astype(dtype)
    itemsize = jnp.dtype(dtype).itemsize
    m = max(16, int(np.sqrt(n)))
    G = jnp.asarray(rng.standard_normal((m, m))).astype(dtype)
    v = jnp.asarray(rng.standard_normal(m)).astype(dtype)

    # each op maps a vector to a vector so it chains inside fori_loop;
    # bytes counts reads+writes like the reference's memory model
    def scaled(a):  # keep chained values bounded
        return a * 0.999

    ops = {
        "axpy": (lambda v_: scaled(v_ + 0.5 * y), 3 * n * itemsize),
        "scal": (lambda v_: v_ * 0.999, 2 * n * itemsize),
        # roll is real data movement XLA cannot fold to identity
        "copy": (lambda v_: jnp.roll(v_, 1), 2 * n * itemsize),
        "dot": (lambda v_: scaled(v_ + jnp.vdot(v_, y).astype(dtype)), 2 * n * itemsize),
        "norm2": (lambda v_: scaled(v_ + jnp.linalg.norm(v_).astype(dtype)), n * itemsize),
        "gemv": (lambda v_: jnp.tanh(G @ v_), m * m * itemsize),
    }

    rows = []
    info = general.device_info()
    for op in args.ops.split(","):
        op = op.strip()
        fn, nbytes = ops[op]
        x0 = v if op == "gemv" else x
        t = general.chain_seconds(fn, x0, args.repetitions, args.trials)
        rows.append({
            "benchmark": "blas",
            "op": op,
            "n": m if op == "gemv" else n,
            "time_s": t,
            "gb_per_s": nbytes / t / 1e9,
            **info,
        })
    general.emit(rows, args)
    return rows


if __name__ == "__main__":
    main()

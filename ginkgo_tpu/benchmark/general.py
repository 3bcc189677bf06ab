"""Shared benchmark protocol + CLI plumbing.

Reference: benchmark/utils/general.hpp:66-117 (gflags: executor, warmup,
repetitions, min_runtime, seed; JSON in/out via RapidJSON) and
benchmark/utils/timer.hpp.  Adapted to the jit/tunnel reality: the hot
measurement chains applies inside one jitted `lax.fori_loop` and uses the
slope between two trip counts, which cancels fixed dispatch/fence overhead.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def add_common_flags(p: argparse.ArgumentParser):
    p.add_argument("--matrix", action="append", default=[],
                   help=".mtx/.gtb file path (repeatable)")
    p.add_argument("--stencil", action="append", default=[],
                   help="generated matrix spec: 5pt:<n>, 9pt:<n>, tri:<n>, "
                        "rand:<n>:<nnz_per_row> (repeatable)")
    p.add_argument("--warmup", type=int, default=1,
                   help="warmup runs (general.hpp:96)")
    p.add_argument("--repetitions", type=int, default=20,
                   help="chained trips per timing (general.hpp:100)")
    p.add_argument("--trials", type=int, default=3, help="outer best-of trials")
    p.add_argument("--seed", type=int, default=42, help="rng seed (general.hpp:116)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64", "bfloat16"])
    p.add_argument("--json", dest="json_out", default=None,
                   help="write JSON array to this path (default: stdout lines)")
    return p


def load_inputs(args):
    """Yield (name, MatrixData) for each requested matrix."""
    from ..io import mtx_io
    from ..utils import generators

    rng = np.random.default_rng(args.seed)
    dtype = np.dtype(args.dtype if args.dtype != "bfloat16" else "float32")
    for path in args.matrix:
        if path.endswith(".gtb"):
            from ..io import native

            data = native.read_binary_native(path)
        elif path.endswith(".npz"):
            data = mtx_io.read_binary_raw(path)
        else:
            data = mtx_io.read_raw(path)
        yield path, data.astype(dtype)
    for spec in args.stencil:
        parts = spec.split(":")
        kind, n = parts[0], int(parts[1])
        if kind == "5pt":
            yield spec, generators.poisson_2d(n, dtype=dtype)
        elif kind == "9pt":
            yield spec, generators.poisson_2d_9pt(n, dtype=dtype)
        elif kind == "tri":
            yield spec, generators.poisson_1d(n, dtype=dtype)
        elif kind == "rand":
            k = int(parts[2]) if len(parts) > 2 else 8
            yield spec, generators.generate_random_matrix(
                n, n, max(1, k // 2), k, rng, dtype=dtype
            )
        else:
            raise ValueError(f"unknown stencil spec {spec}")


def chain_seconds(apply_fn, x0, trips, trials=3):
    """Per-apply seconds via two-point slope on chained applies."""

    def total(n):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, v: apply_fn(v), x)

        jax.block_until_ready(run(x0))
        fence = jnp.sum(jnp.abs(run(x0)))
        float(fence)  # warm + fence
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jnp.sum(jnp.abs(run(x0))))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = total(trips)
    t2 = total(2 * trips)
    return max((t2 - t1) / trips, 1e-12)


def fence(obj):
    """Force completion via a scalar device->host readback on every array
    leaf — `block_until_ready` is unreliable on the tunneled TPU (see
    CLAUDE.md), a readback is a true fence.  Returns obj."""
    for leaf in jax.tree_util.tree_leaves(obj):
        if hasattr(leaf, "ndim") and hasattr(leaf, "dtype") and getattr(
            leaf, "size", 0
        ):
            idx = (0,) * leaf.ndim
            np.asarray(leaf[idx] if leaf.ndim else leaf)
    return obj


def once_seconds(fn, trials=3, warmup=1):
    """Wall time of a single (readback-fenced) call — for generate phases."""
    for _ in range(warmup):
        fence(fn())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def emit(rows, args):
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=2)
    else:
        for row in rows:
            sys.stdout.write(json.dumps(row) + "\n")


def device_info():
    d = jax.devices()[0]
    return {
        "device": str(d),
        "device_kind": getattr(d, "device_kind", "?"),
        "backend": jax.default_backend(),
    }

"""SpMV benchmark driver: formats × strategies → nnz/s.

Reference: benchmark/spmv/spmv.cpp (all formats × CSR strategies, JSON rows
with time and derived throughput).

    python -m ginkgo_tpu.benchmark.spmv --stencil 5pt:256 --formats csr,dia
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

from . import general


ALL_FORMATS = [
    "dense", "csr", "csr-merge_path", "csr-sparselib", "coo", "ell",
    "sellp", "hybrid", "fbcsr", "sparsity_csr", "dia", "bell",
]
DEFAULT_FORMATS = ["csr", "csr-merge_path", "coo", "ell", "sellp", "hybrid", "dia"]


def build_operator(fmt: str, data, index_dtype=np.int32):
    from ..matrix.csr import Csr
    from ..matrix.coo import Coo
    from ..matrix.dense import Dense
    from ..matrix.dia import Dia
    from ..matrix.ell import Ell, Sellp
    from ..matrix.hybrid import Hybrid
    from ..matrix.fbcsr import Fbcsr
    from ..matrix.sparsity_csr import SparsityCsr

    if fmt == "dense":
        return Dense(values=jnp.asarray(data.to_dense()))
    if fmt.startswith("csr"):
        strategy = fmt.split("-", 1)[1] if "-" in fmt else "classical"
        return Csr.from_matrix_data(data, strategy=strategy, index_dtype=index_dtype)
    if fmt == "coo":
        return Coo.from_matrix_data(data, index_dtype=index_dtype)
    if fmt == "ell":
        return Ell.from_matrix_data(data)
    if fmt == "sellp":
        return Sellp.from_matrix_data(data)
    if fmt == "hybrid":
        return Hybrid.from_matrix_data(data)
    if fmt == "fbcsr":
        return Fbcsr.from_matrix_data(data, block_size=2)
    if fmt == "sparsity_csr":
        return SparsityCsr.from_matrix_data(data)
    if fmt == "dia":
        return Dia.from_matrix_data(data)
    if fmt == "bell":
        from ..matrix.bell import Bell

        return Bell.from_matrix_data(data)
    raise ValueError(f"unknown format {fmt}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--formats", default=",".join(DEFAULT_FORMATS),
                   help=f"comma list from {ALL_FORMATS}")
    p.add_argument("--nrhs", type=int, default=1)
    args = p.parse_args(argv)

    rows = []
    info = general.device_info()
    for name, data in general.load_inputs(args):
        n, m = data.shape
        rng = np.random.default_rng(args.seed)
        x_np = rng.standard_normal((m, args.nrhs)).astype(args.dtype if args.dtype != "bfloat16" else "float32")
        for fmt in args.formats.split(","):
            fmt = fmt.strip()
            try:
                A = build_operator(fmt, data)
                if args.dtype == "bfloat16":
                    A = A.astype(jnp.bfloat16)
                x = jnp.asarray(x_np, dtype=A.dtype)
                if args.nrhs == 1:
                    x = x.reshape(-1)
                # normalize so chained applies stay bounded
                sc = 1.0 / max(1.0, float(np.abs(data.values).sum() / max(1, n)))
                A = A.scale(sc) if hasattr(A, "scale") else A
                t = general.chain_seconds(
                    A.apply, x, args.repetitions, args.trials
                )
                row = {
                    "benchmark": "spmv",
                    "matrix": name,
                    "n": n,
                    "nnz": int(data.nnz),
                    "format": fmt,
                    "nrhs": args.nrhs,
                    "time_s": t,
                    "gnnz_per_s": data.nnz * args.nrhs / t / 1e9,
                    **info,
                }
            except Exception as e:  # mirror reference's per-case error capture
                row = {
                    "benchmark": "spmv",
                    "matrix": name,
                    "format": fmt,
                    "error": f"{type(e).__name__}: {e}",
                }
            rows.append(row)
    general.emit(rows, args)
    return rows


if __name__ == "__main__":
    main()

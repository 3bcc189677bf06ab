"""Sparse BLAS benchmark: SpGEMM / SpGEAM / transpose / sort.

Reference: benchmark/sparse_blas/sparse_blas.cpp (operations declared in
sparse_blas.cpp:72-97).

    python -m ginkgo_tpu.benchmark.sparse_blas --stencil 5pt:64
"""

from __future__ import annotations

import argparse

from . import general


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--ops", default="spgemm,spgeam,transpose")
    args = p.parse_args(argv)

    from ..matrix.csr import Csr

    rows = []
    info = general.device_info()
    for name, data in general.load_inputs(args):
        A = Csr.from_matrix_data(data)
        for op in args.ops.split(","):
            op = op.strip()
            try:
                if op == "spgemm":
                    fn = lambda: A.spgemm(A)
                elif op == "spgeam":
                    fn = lambda: A.spgeam(1.0, A.transpose(), 1.0)
                elif op == "transpose":
                    fn = lambda: A.transpose()
                elif op == "sort":
                    fn = lambda: Csr.from_matrix_data(data)
                else:
                    raise ValueError(f"unknown op {op}")
                t = general.once_seconds(fn, args.trials, args.warmup)
                out = fn()
                out_nnz = int(out.nnz) if hasattr(out, "nnz") else None
                rows.append({
                    "benchmark": "sparse_blas",
                    "matrix": name,
                    "n": data.shape[0],
                    "nnz": int(data.nnz),
                    "op": op,
                    "time_s": t,
                    "out_nnz": out_nnz,
                    **info,
                })
            except Exception as e:
                rows.append({
                    "benchmark": "sparse_blas",
                    "matrix": name,
                    "op": op,
                    "error": f"{type(e).__name__}: {e}",
                })
    general.emit(rows, args)
    return rows


if __name__ == "__main__":
    main()

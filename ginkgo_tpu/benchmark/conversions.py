"""Format-conversion benchmark.

Reference: benchmark/conversions/conversions.cpp (all pairwise
ConvertibleTo conversions timed).

    python -m ginkgo_tpu.benchmark.conversions --stencil 5pt:64
"""

from __future__ import annotations

import argparse

from . import general
from .spmv import build_operator


PAIRS = [
    ("csr", "coo"), ("csr", "ell"), ("csr", "sellp"), ("csr", "hybrid"),
    ("csr", "dense"), ("csr", "dia"), ("coo", "csr"), ("ell", "csr"),
    ("dense", "csr"), ("dia", "csr"),
]


def convert(op, to_fmt: str):
    target = {
        "csr": "to_csr", "coo": "to_coo", "ell": "to_ell", "sellp": "to_sellp",
        "hybrid": "to_hybrid", "dense": "to_dense", "dia": "to_dia",
    }[to_fmt]
    if hasattr(op, target):
        return getattr(op, target)()
    # generic path through matrix_data (ConvertibleTo fallback)
    return build_operator(to_fmt, op.to_matrix_data())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--pairs", default=",".join(f"{a}-{b}" for a, b in PAIRS))
    args = p.parse_args(argv)

    rows = []
    info = general.device_info()
    for name, data in general.load_inputs(args):
        built = {}
        for pair in args.pairs.split(","):
            src, dst = pair.strip().split("-")
            try:
                if src not in built:
                    built[src] = build_operator(src, data)
                op = built[src]
                t = general.once_seconds(
                    lambda: convert(op, dst), args.trials, args.warmup
                )
                rows.append({
                    "benchmark": "conversion",
                    "matrix": name,
                    "n": data.shape[0],
                    "nnz": int(data.nnz),
                    "from": src,
                    "to": dst,
                    "time_s": t,
                    **info,
                })
            except Exception as e:
                rows.append({
                    "benchmark": "conversion",
                    "matrix": name,
                    "from": src,
                    "to": dst,
                    "error": f"{type(e).__name__}: {e}",
                })
    general.emit(rows, args)
    return rows


if __name__ == "__main__":
    main()

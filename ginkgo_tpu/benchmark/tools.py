"""mtx_to_binary converter.

Reference: benchmark/tools/mtx_to_binary.cpp — convert MatrixMarket text to
the fast binary format (GTB1 via the native C++ runtime, or .npz fallback).

    python -m ginkgo_tpu.benchmark.tools input.mtx output.gtb
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="input .mtx path")
    p.add_argument("output", help="output .gtb (native binary) or .npz path")
    args = p.parse_args(argv)

    from ..io import mtx_io

    data = mtx_io.read_raw(args.input)
    if args.output.endswith(".npz"):
        mtx_io.write_binary_raw(args.output, data)
    else:
        from ..io import native

        native.write_binary_native(args.output, data)
    print(f"{args.input} ({data.shape[0]}x{data.shape[1]}, nnz {data.nnz}) -> {args.output}")


if __name__ == "__main__":
    main()

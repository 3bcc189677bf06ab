"""Matrix generator tool: emit .mtx (or .gtb binary) test matrices.

Reference: benchmark/matrix_generator/matrix_generator.cpp.

    python -m ginkgo_tpu.benchmark.matrix_generator --stencil 5pt:128 \
        --out poisson128.mtx
"""

from __future__ import annotations

import argparse

from . import general


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--out", required=True, help="output path (.mtx or .gtb)")
    args = p.parse_args(argv)

    from ..io import mtx_io

    inputs = list(general.load_inputs(args))
    if len(inputs) != 1:
        raise SystemExit("need exactly one --stencil/--matrix spec")
    name, data = inputs[0]
    if args.out.endswith(".gtb"):
        from ..io import native

        native.write_binary_native(args.out, data)
    elif args.out.endswith(".npz"):
        mtx_io.write_binary_raw(args.out, data)
    else:
        mtx_io.write_raw(args.out, data)
    print(f"wrote {name} ({data.shape[0]}x{data.shape[1]}, nnz {data.nnz}) -> {args.out}")


if __name__ == "__main__":
    main()

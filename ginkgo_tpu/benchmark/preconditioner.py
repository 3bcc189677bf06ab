"""Preconditioner benchmark: generate + apply timing.

Reference: benchmark/preconditioner/preconditioner.cpp.

    python -m ginkgo_tpu.benchmark.preconditioner --stencil 5pt:64 \
        --preconditioners jacobi,block_jacobi,ilu
"""

from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

from . import general
from .solver import precond_factory


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--preconditioners", default="jacobi,block_jacobi,ilu,isai")
    args = p.parse_args(argv)

    from ..matrix.csr import Csr

    rows = []
    info = general.device_info()
    for name, data in general.load_inputs(args):
        A = Csr.from_matrix_data(data)
        n = data.shape[0]
        rng = np.random.default_rng(args.seed)
        x = jnp.asarray(rng.standard_normal(n)).astype(A.dtype)
        for pname in args.preconditioners.split(","):
            pname = pname.strip()
            try:
                fac = precond_factory(pname)
                t_generate = general.once_seconds(
                    lambda: fac.generate(A), args.trials, args.warmup
                )
                M = fac.generate(A)
                t_apply = general.chain_seconds(
                    lambda v: M.apply(v) * 0.99, x, args.repetitions, args.trials
                )
                rows.append({
                    "benchmark": "preconditioner",
                    "matrix": name,
                    "n": n,
                    "nnz": int(data.nnz),
                    "preconditioner": pname,
                    "generate_s": t_generate,
                    "apply_s": t_apply,
                    **info,
                })
            except Exception as e:
                rows.append({
                    "benchmark": "preconditioner",
                    "matrix": name,
                    "preconditioner": pname,
                    "error": f"{type(e).__name__}: {e}",
                })
    general.emit(rows, args)
    return rows


if __name__ == "__main__":
    main()

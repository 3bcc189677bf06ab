"""Solver benchmark driver: time-to-solution, iterations, residuals.

Reference: benchmark/solver/solver.cpp with the ResidualLogger/
IterationLogger instrumentation (benchmark/utils/loggers.hpp:197-280);
phases (generate vs apply) timed separately like the reference's
per-operation breakdown.

    python -m ginkgo_tpu.benchmark.solver --stencil 5pt:64 \
        --solvers cg,bicgstab --preconditioners none,jacobi
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import general


SOLVERS = ["cg", "fcg", "bicg", "bicgstab", "cgs", "gmres", "cb_gmres", "idr", "ir"]
PRECONDITIONERS = ["none", "jacobi", "block_jacobi", "ilu", "ic", "isai", "parilu"]


def solver_factory(name, criteria, precond_factory, **kw):
    from .. import solver as S

    cls = {
        "cg": S.Cg, "fcg": S.Fcg, "bicg": S.Bicg, "bicgstab": S.Bicgstab,
        "cgs": S.Cgs, "gmres": S.Gmres, "cb_gmres": S.CbGmres, "idr": S.Idr,
        "ir": S.Ir,
    }[name]
    return cls.build(criteria=criteria, preconditioner=precond_factory, **kw)


def precond_factory(name):
    from ..preconditioner import JacobiFactory
    from ..preconditioner.ilu import IluPreconditionerFactory, IcPreconditionerFactory
    from ..preconditioner.isai import IsaiFactory
    from ..factorization.par_ilu import ParIluFactory

    if name == "none":
        return None
    if name == "jacobi":
        return JacobiFactory(max_block_size=1)
    if name == "block_jacobi":
        return JacobiFactory(max_block_size=8)
    if name == "ilu":
        return IluPreconditionerFactory()
    if name == "ic":
        return IcPreconditionerFactory()
    if name == "isai":
        return IsaiFactory()
    if name == "parilu":
        return IluPreconditionerFactory(
            factorization_factory=ParIluFactory(iterations=5)
        )
    if name == "amg":
        from ..solver.multigrid import MultigridFactory
        from ..stop.criterion import Iteration

        return MultigridFactory(criteria=[Iteration(max_iters=1)])
    raise ValueError(f"unknown preconditioner {name}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--solvers", default="cg,bicgstab,gmres")
    p.add_argument("--preconditioners", default="none,jacobi")
    p.add_argument("--max-iters", type=int, default=1000)
    p.add_argument("--tolerance", type=float, default=1e-6)
    p.add_argument("--nrhs", type=int, default=1)
    args = p.parse_args(argv)

    from .. import stop

    rows = []
    info = general.device_info()
    for name, data in general.load_inputs(args):
        from ..matrix.csr import Csr
        from ..matrix.dia import Dia, suitable_for_dia

        A = (
            Dia.from_matrix_data(data)
            if suitable_for_dia(data)
            else Csr.from_matrix_data(data)
        )
        n = data.shape[0]
        rng = np.random.default_rng(args.seed)
        b = jnp.asarray(rng.standard_normal((n, args.nrhs))).astype(A.dtype)
        criteria = [
            stop.Iteration(max_iters=args.max_iters),
            stop.ResidualNorm(tolerance=args.tolerance),
        ]
        for pname in args.preconditioners.split(","):
            pname = pname.strip()
            for sname in args.solvers.split(","):
                sname = sname.strip()
                try:
                    fac = solver_factory(sname, criteria, precond_factory(pname))
                    t0 = time.perf_counter()
                    solver = general.fence(fac.generate(A))
                    t_generate = time.perf_counter() - t0

                    def run():
                        x, info_ = solver.solve(b)
                        return x, info_

                    # warm (compile) once, then time the apply phase;
                    # scalar-readback fence (block_until_ready unreliable)
                    x, sinfo = general.fence(run())
                    t0 = time.perf_counter()
                    x, sinfo = general.fence(run())
                    t_apply = time.perf_counter() - t0

                    r = b - jnp.asarray(A.apply(x))
                    true_res = float(
                        jnp.linalg.norm(r) / jnp.linalg.norm(b)
                    )
                    rows.append({
                        "benchmark": "solver",
                        "matrix": name,
                        "n": n,
                        "nnz": int(data.nnz),
                        "solver": sname,
                        "preconditioner": pname,
                        "generate_s": t_generate,
                        "apply_s": t_apply,
                        "iterations": int(sinfo.iterations),
                        "residual_norm": float(np.max(np.asarray(sinfo.residual_norm))),
                        "true_relative_residual": true_res,
                        "converged": bool(np.all(np.asarray(sinfo.converged))),
                        **info,
                    })
                except Exception as e:
                    rows.append({
                        "benchmark": "solver",
                        "matrix": name,
                        "solver": sname,
                        "preconditioner": pname,
                        "error": f"{type(e).__name__}: {e}",
                    })
    general.emit(rows, args)
    return rows


if __name__ == "__main__":
    main()

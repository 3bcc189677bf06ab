"""Iterative refinement / (relaxed) Richardson iteration.

Reference: core/solver/ir.cpp (364 LoC), include/.../solver/ir.hpp:66-81
(`relaxation_factor`, inner `solver` factory parameter, `default_initial_guess`).
With an inner scalar-Jacobi solver this is the classic damped Jacobi smoother
used by the multigrid layer (mixed-precision-ir example maps to running the
inner solve in reduced precision via .astype on the inner operator).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field
from .solver_base import (
    IterativeSolverMixin,
    SolveInfo,
    extract_max_iters,
    masked_cols,
)


@linop_dataclass
class Ir(IterativeSolverMixin, LinOp):
    A: Any
    preconditioner: Any  # the inner solver ("solver" parameter in ir.hpp)
    criterion: Any
    relaxation_factor: float = 1.0
    axis_name: Any = static_field(default=None)

    @classmethod
    def create(cls, A, preconditioner, criterion, relaxation_factor=1.0, **params):
        return cls(
            A=A,
            preconditioner=preconditioner,
            criterion=criterion,
            relaxation_factor=relaxation_factor,
            **params,
        )

    # alias matching reference naming: the inner op is called "solver"
    @property
    def solver(self):
        return self.preconditioner

    def _solve_impl(self, b, x0):
        A, M = self.A, self.preconditioner
        cap = extract_max_iters(self.criterion)
        k = b.shape[1]
        omega = jnp.asarray(self.relaxation_factor, dtype=b.dtype)

        r0 = b - A.apply(x0)
        baselines = self._baselines(b, r0)

        def cond(st):
            return (st[2] < cap) & ~jnp.all(st[3])

        def body(st):
            x, r, it, stopped, resnorm = st
            d = M.apply(r)  # inner solve (ir.cpp solver->apply(residual, inner))
            x_new = masked_cols(x + omega * d, x, stopped)
            r_new = masked_cols(b - A.apply(x_new), r, stopped)
            stopped_new, rn = self._check_stop(
                it + 1, stopped, r=r_new, rho=None, baselines=baselines
            )
            return (x_new, r_new, it + 1, stopped_new, rn)

        init = (
            x0,
            r0,
            jnp.asarray(0, jnp.int32),
            jnp.zeros((k,), dtype=bool),
            baselines["initial_resnorm"],
        )
        x, r, it, stopped, resnorm = jax.lax.while_loop(cond, body, init)
        return x, SolveInfo(
            iterations=it, residual_norm=resnorm, converged=stopped, history=None
        )


# Richardson is the reference's documented alias for IR (ir.hpp:60)
Richardson = Ir

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
        fast = self._try_vmem_fused(b, x0)
        if fast is not None:
            return fast
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

    def _try_vmem_fused(self, b, x0):
        """Whole-solve-in-VMEM fast path (ops/pallas_ir.py): the entire
        Richardson loop runs inside ONE Pallas kernel when A is a Dia that
        fits VMEM, the inner solver is diagonal (Identity / Diagonal /
        scalar Jacobi), there is a single f32 RHS, and the criterion is a
        plain Iteration/ResidualNorm combination (gate:
        solver/_fused_gate.py; same env flags as the fused CG).  The
        implicit-residual criterion is rejected — IR has no rho.
        Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_dia, tol_sq_eff
        from ..ops.pallas_ir import ir_vmem_fits, ir_vmem_solve

        fast = self._try_vmem_fused_pell(b, x0)
        if fast is not None:
            return fast

        def fits(nd, R, itemsize, use_minv, halo_rows):
            return ir_vmem_fits(nd, R, itemsize, use_minv=use_minv,
                                halo_rows=halo_rows)

        ctx = prepare_fused_dia(self, b, fits)
        if ctx is None or ctx["implicit"]:
            return None
        A, R = ctx["A"], ctx["R"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        minv2 = (
            frame(ctx["minv_flat"][:, None].astype(jnp.float32), R)
            if ctx["minv_flat"] is not None
            else None
        )
        x2, it, rr, conv = ir_vmem_solve(
            A.diags,
            A.offsets,
            frame(b, R),
            frame(x0, R),
            minv2,
            omega=self.relaxation_factor,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"]:
            rn = jnp.sqrt(rr)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )


    def _try_vmem_fused_pell(self, b, x0):
        """Whole-solve Richardson/IR for GENERAL unstructured operators
        (ops/pallas_pell_cg.pell_ir_vmem_solve).  Returns
        (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_pell, tol_sq_eff
        from ..ops.pallas_pell_cg import (
            pell_ir_vmem_fits,
            pell_ir_vmem_solve,
        )

        ctx = prepare_fused_pell(self, b, pell_ir_vmem_fits)
        if ctx is None or ctx["implicit"]:
            return None
        A, Rf = ctx["A"], ctx["Rf"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        minv2 = (
            frame(ctx["minv_flat"][:, None].astype(jnp.float32), Rf)
            if ctx["minv_flat"] is not None
            else None
        )
        x2, it, rr, conv = pell_ir_vmem_solve(
            A,
            frame(b, Rf),
            frame(x0, Rf),
            minv2,
            omega=self.relaxation_factor,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"]:
            rn = jnp.sqrt(rr)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )


# Richardson is the reference's documented alias for IR (ir.hpp:60)
Richardson = Ir

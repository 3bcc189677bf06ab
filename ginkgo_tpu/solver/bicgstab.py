"""Nonsymmetric Krylov solvers: BiCGSTAB, CGS, BiCG.

Reference: core/solver/bicgstab.cpp (318), cgs.cpp (288), bicg.cpp (317) and
their fused per-backend step kernels.  Same TPU re-design as CG (cg.py): one
`lax.while_loop`, per-column convergence masks, psum-aware reductions.
BiCGSTAB folds the reference's half-iteration check (bicgstab.cpp checks s
before the second half) into the same fused criterion evaluation.
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
    safe_div,
    vdot,
    norm2,
)


@linop_dataclass
class Bicgstab(IterativeSolverMixin, LinOp):
    A: Any
    preconditioner: Any
    criterion: Any
    axis_name: Any = static_field(default=None)

    @classmethod
    def create(cls, A, preconditioner, criterion, **params):
        return cls(A=A, preconditioner=preconditioner, criterion=criterion, **params)

    def _try_vmem_fused(self, b, x0):
        """Whole-solve-in-VMEM fast path (ops/pallas_bicgstab.py), same
        gate as Cg's (solver/_fused_gate.py).  Diagonal preconditioning is
        folded into the operator: the kernel runs on A@M (a one-time
        column scaling of the Dia diagonals) and rescales the updates by
        minv.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_dia, tol_sq_eff
        from ..ops.pallas_bicgstab import (
            bicgstab_vmem_fits,
            bicgstab_vmem_solve,
        )

        if b.shape[1] > 1:
            # k-RHS solves ride the per-column-stopping multi kernel
            return self._try_vmem_fused_multi(b, x0)
        fast = self._try_vmem_fused_pell(b, x0)
        if fast is not None:
            return fast
        fast = self._try_vmem_fused_ilu(b, x0)
        if fast is not None:
            return fast
        fast = self._try_vmem_fused_mg(b, x0)
        if fast is not None:
            return fast

        ctx = prepare_fused_dia(self, b, bicgstab_vmem_fits)
        if ctx is None:
            return None
        A, R = ctx["A"], ctx["R"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        if ctx["minv_flat"] is not None:
            minv2 = frame(ctx["minv_flat"][:, None].astype(jnp.float32), R)
            # A@M: scale diagonal d by minv at column index i + off_d.
            # Cast back to A.diags.dtype: the fits-check budgeted
            # A.diags.dtype.itemsize per entry, and bf16 reduce_storage
            # keeps its bandwidth benefit only if the product stays bf16.
            mflat = minv2
            diags = jnp.stack([
                (A.diags[j].astype(jnp.float32) * A._flat_shift(mflat, off))
                .astype(A.diags.dtype)
                for j, off in enumerate(A.offsets)
            ])
        else:
            minv2 = None
            diags = A.diags
        x2, it, mon, conv = bicgstab_vmem_solve(
            diags,
            A.offsets,
            frame(r0, R),
            frame(x0, R),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )

    def _try_vmem_fused_multi(self, b, x0):
        """k-RHS whole-solve BiCGSTAB (ops/pallas_bicgstab.
        bicgstab_vmem_solve_multi): per-column stopping and half-step
        checks run in-kernel (the reference's stopping_status-masked
        step kernels); diagonal preconditioning folded into the operator
        as in the single-RHS path.  Dia operators, k <= 8 f32 columns.
        Returns (x, SolveInfo) or None."""
        from ._fused_gate import (
            frame,
            frame_cols,
            prepare_fused_dia,
            tol_sq_eff_cols,
            unframe_cols,
        )
        from ..ops.pallas_bicgstab import (
            bicgstab_vmem_fits_multi,
            bicgstab_vmem_solve_multi,
        )

        k = b.shape[1]
        if k > 8:
            return None

        def fits(nd, R, itemsize, use_minv, halo_rows):
            return bicgstab_vmem_fits_multi(
                nd, R, itemsize, use_minv=use_minv, halo_rows=halo_rows,
                k=k,
            )

        ctx = prepare_fused_dia(self, b, fits, max_cols=8)
        if ctx is None:
            return None
        A, R = ctx["A"], ctx["R"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff_cols(ctx, b, r0)
        if ctx["minv_flat"] is not None:
            minv2 = frame(ctx["minv_flat"][:, None].astype(jnp.float32), R)
            diags = jnp.stack([
                (A.diags[j].astype(jnp.float32) * A._flat_shift(minv2, off))
                .astype(A.diags.dtype)
                for j, off in enumerate(A.offsets)
            ])
        else:
            minv2 = None
            diags = A.diags
        x3, it, mon, conv = bicgstab_vmem_solve_multi(
            diags,
            A.offsets,
            frame_cols(r0, R),
            frame_cols(x0, R),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = unframe_cols(x3, n)
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon).astype(b.dtype)
        else:
            rn = jnp.full((k,), jnp.inf, dtype=b.dtype)
        conv_mask = conv & ctx["has_res"]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask,
            history=None,
        )

    def _try_vmem_fused_ilu(self, b, x0):
        """Whole-solve-in-VMEM BiCGSTAB with IN-KERNEL ILU/IC
        preconditioning (ops/pallas_cg_ilu.bicgstab_ilu_vmem_solve):
        right preconditioning exactly as the generic loop (y = M p,
        v = A y, z = M s, t = A z), with M's two triangular solves as
        Jacobi-Richardson sweeps over Dia factor triangles in-kernel.
        Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_dia_ilu, tol_sq_eff
        from ..ops.pallas_cg_ilu import (
            bicgstab_ilu_vmem_fits,
            bicgstab_ilu_vmem_solve,
        )

        ctx = prepare_fused_dia_ilu(self, b, bicgstab_ilu_vmem_fits)
        if ctx is None:
            return None
        A, R = ctx["A"], ctx["R"]
        lt, ut = ctx["l_solver"], ctx["u_solver"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        invdl2 = frame((1.0 / lt.diag)[:, None].astype(jnp.float32), R)
        invdu2 = frame((1.0 / ut.diag)[:, None].astype(jnp.float32), R)
        x2, it, mon, conv = bicgstab_ilu_vmem_solve(
            A, lt.off_csr, ut.off_csr, invdl2, invdu2,
            frame(r0, R), frame(x0, R),
            sweeps_l=lt.sweeps, sweeps_u=ut.sweeps,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask,
            history=None,
        )

    def _try_vmem_fused_mg(self, b, x0):
        """Whole-solve-in-VMEM BiCGSTAB with an IN-KERNEL AMG V-cycle
        preconditioner (ops/pallas_mg.mg_bicgstab_vmem_solve): right
        preconditioning exactly as the generic loop (y = M p, v = A y,
        z = M s, t = A z) with M = one multigrid cycle from zero over
        the VMEM-resident hierarchy.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import _common_checks, frame, tol_sq_eff
        from ..matrix.dia import Dia
        from ..ops.pallas_dia import _plan
        from ..ops.pallas_mg import (
            mg_bicgstab_vmem_fits,
            mg_bicgstab_vmem_solve,
        )
        from .multigrid import Multigrid

        A = self.A
        M = self.preconditioner
        if not isinstance(M, Multigrid) or not isinstance(A, Dia):
            return None
        if A.shape[0] != A.shape[1]:
            return None
        nd, R, _ = A.diags.shape
        if nd == 0 or A.diags.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        ctx = _common_checks(self, b)
        if ctx is None:
            return None
        parts = M._fused_vcycle_parts()
        if parts is None or parts["plan"]["lv"][0]["R"] != R:
            return None
        plan = parts["plan"]
        _, _, _, pa_lo, pa_hi = _plan(A.offsets, R)
        if not mg_bicgstab_vmem_fits(plan, nd, R,
                                     a_itemsize=A.diags.dtype.itemsize,
                                     halo_a=pa_lo + pa_hi):
            return None
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        x2, it, mon, conv = mg_bicgstab_vmem_solve(
            A, plan, parts["diags"], parts["dinv2"], parts["minv2"],
            frame(r0, R), frame(x0, R),
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask,
            history=None,
        )

    def _try_vmem_fused_pell(self, b, x0):
        """Whole-solve-in-VMEM BiCGSTAB for GENERAL unstructured operators
        (ops/pallas_pell_cg.pell_bicgstab_vmem_solve): Pell operator whose
        slots + the seven state frames fit VMEM; right preconditioning
        applied explicitly in-kernel.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_pell, tol_sq_eff
        from ..ops.pallas_pell_cg import (
            pell_bicgstab_vmem_fits,
            pell_bicgstab_vmem_solve,
        )

        ctx = prepare_fused_pell(self, b, pell_bicgstab_vmem_fits)
        if ctx is None:
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
        x2, it, mon, conv = pell_bicgstab_vmem_solve(
            A,
            frame(r0, Rf),
            frame(x0, Rf),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )

    def _solve_impl(self, b, x0):
        fast = self._try_vmem_fused(b, x0)
        if fast is not None:
            return fast
        A, M = self.A, self.preconditioner
        cap = extract_max_iters(self.criterion)
        k = b.shape[1]
        ax = self.axis_name

        r0 = b - A.apply(x0)
        rr = r0  # shadow residual (bicgstab.cpp initialize)
        baselines = self._baselines(b, r0)

        def cond(st):
            return (st[8] < cap) & ~jnp.all(st[9])

        def body(st):
            x, r, p, v, rho, alpha, omega, _rn_prev, it, stopped = st
            rho_new = vdot(rr, r, ax)
            beta = safe_div(rho_new * alpha, rho * omega)
            p_new = r + beta[None, :] * (p - omega[None, :] * v)
            y = M.apply(p_new)
            v_new = A.apply(y)
            alpha_new = jnp.where(stopped, 0, safe_div(rho_new, vdot(rr, v_new, ax)))
            s = r - alpha_new[None, :] * v_new
            # half-step convergence on s (bicgstab.cpp:)
            s_norm = norm2(s, ax)
            half_ctx = dict(baselines)
            half_ctx.update(
                iteration=it + 1,
                residual_norm=s_norm,
                implicit_sq_residual_norm=jnp.abs(rho_new),
            )
            half_done = self.criterion.check_converged(half_ctx) & ~stopped
            z = M.apply(s)
            t = A.apply(z)
            tt = vdot(t, t, ax)
            omega_new = jnp.where(stopped | half_done, 0, safe_div(vdot(t, s, ax), tt))
            x_new = (
                x
                + alpha_new[None, :] * y
                + omega_new[None, :] * z
            )
            x_new = masked_cols(x_new, x, stopped)
            r_new = masked_cols(s - omega_new[None, :] * t, r, stopped)
            stopped_half = stopped | half_done
            stopped_new, rn = self._check_stop(
                it + 1, stopped_half, r=r_new, rho=rho_new, baselines=baselines
            )
            return (
                x_new,
                r_new,
                masked_cols(p_new, p, stopped),
                masked_cols(v_new, v, stopped),
                jnp.where(stopped, rho, rho_new),
                jnp.where(stopped, alpha, alpha_new),
                jnp.where(stopped, omega, jnp.where(half_done, 1.0, omega_new)),
                rn,
                it + 1,
                stopped_new,
            )

        ones = jnp.ones((k,), dtype=b.dtype)
        init = (
            x0,
            r0,
            jnp.zeros_like(b),
            jnp.zeros_like(b),
            ones,
            ones,
            ones,
            baselines["initial_resnorm"],
            jnp.asarray(0, jnp.int32),
            jnp.zeros((k,), dtype=bool),
        )
        out = jax.lax.while_loop(cond, body, init)
        x, r, p, v, rho, alpha, omega, rn, it, stopped = out
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=stopped, history=None
        )


@linop_dataclass
class Cgs(IterativeSolverMixin, LinOp):
    A: Any
    preconditioner: Any
    criterion: Any
    axis_name: Any = static_field(default=None)

    @classmethod
    def create(cls, A, preconditioner, criterion, **params):
        return cls(A=A, preconditioner=preconditioner, criterion=criterion, **params)

    def _try_vmem_fused_pell(self, b, x0):
        """Whole-solve-in-VMEM CGS for GENERAL unstructured operators
        (ops/pallas_pell_cg.pell_cgs_vmem_solve): Pell slots + the eight
        state frames VMEM-resident; right preconditioning applied
        explicitly in-kernel.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_pell, tol_sq_eff
        from ..ops.pallas_pell_cg import (
            pell_cgs_vmem_fits,
            pell_cgs_vmem_solve,
        )

        ctx = prepare_fused_pell(self, b, pell_cgs_vmem_fits)
        if ctx is None:
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
        x2, it, mon, conv = pell_cgs_vmem_solve(
            A,
            frame(r0, Rf),
            frame(x0, Rf),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )

    def _try_vmem_fused(self, b, x0):
        """Whole-solve-in-VMEM CGS (ops/pallas_cgs.py), same gate as the
        fused CG/BiCGSTAB (solver/_fused_gate.py): Dia operator, diagonal
        preconditioning folded into the operator as A@M.  Returns
        (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_dia, tol_sq_eff
        from ..ops.pallas_cgs import cgs_vmem_fits, cgs_vmem_solve

        fast = self._try_vmem_fused_pell(b, x0)
        if fast is not None:
            return fast
        ctx = prepare_fused_dia(self, b, cgs_vmem_fits)
        if ctx is None:
            return None
        A, R = ctx["A"], ctx["R"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        if ctx["minv_flat"] is not None:
            minv2 = frame(ctx["minv_flat"][:, None].astype(jnp.float32), R)
            diags = jnp.stack([
                (A.diags[j].astype(jnp.float32) * A._flat_shift(minv2, off))
                .astype(A.diags.dtype)
                for j, off in enumerate(A.offsets)
            ])
        else:
            minv2 = None
            diags = A.diags
        x2, it, mon, conv = cgs_vmem_solve(
            diags,
            A.offsets,
            frame(r0, R),
            frame(x0, R),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )

    def _solve_impl(self, b, x0):
        fast = self._try_vmem_fused(b, x0)
        if fast is not None:
            return fast
        A, M = self.A, self.preconditioner
        cap = extract_max_iters(self.criterion)
        k = b.shape[1]
        ax = self.axis_name

        r0 = b - A.apply(x0)
        rr = r0
        baselines = self._baselines(b, r0)

        def cond(st):
            return (st[6] < cap) & ~jnp.all(st[7])

        def body(st):
            x, r, p, q, u, rho, it, stopped, rn_prev = st
            rho_new = vdot(rr, r, ax)
            beta = safe_div(rho_new, rho)
            u_new = r + beta[None, :] * q
            p_new = u_new + beta[None, :] * (q + beta[None, :] * p)
            y = M.apply(p_new)
            v = A.apply(y)
            sigma = vdot(rr, v, ax)
            alpha = jnp.where(stopped, 0, safe_div(rho_new, sigma))
            q_new = u_new - alpha[None, :] * v
            t = M.apply(u_new + q_new)
            x_new = masked_cols(x + alpha[None, :] * t, x, stopped)
            r_new = masked_cols(r - alpha[None, :] * A.apply(t), r, stopped)
            stopped_new, rn = self._check_stop(
                it + 1, stopped, r=r_new, rho=rho_new, baselines=baselines
            )
            return (
                x_new,
                r_new,
                masked_cols(p_new, p, stopped),
                masked_cols(q_new, q, stopped),
                masked_cols(u_new, u, stopped),
                jnp.where(stopped, rho, rho_new),
                it + 1,
                stopped_new,
                rn,
            )

        init = (
            x0,
            r0,
            jnp.zeros_like(b),
            jnp.zeros_like(b),
            jnp.zeros_like(b),
            jnp.ones((k,), dtype=b.dtype),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((k,), dtype=bool),
            baselines["initial_resnorm"],
        )
        out = jax.lax.while_loop(cond, body, init)
        x, r, p, q, u, rho, it, stopped, rn = out
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=stopped, history=None
        )


@linop_dataclass
class Bicg(IterativeSolverMixin, LinOp):
    """Classic BiCG; uses A^H and M^H applies (bicg.cpp).  The conjugate
    operator is materialized once at generate time (a device transpose) —
    the analog of the reference's conj_transpose kernels."""

    A: Any
    preconditioner: Any
    criterion: Any
    At: Any = None
    Mt: Any = None
    axis_name: Any = static_field(default=None)

    @classmethod
    def create(cls, A, preconditioner, criterion, **params):
        if hasattr(A, "conj_transpose"):
            At = A.conj_transpose()
        else:
            # BiCG needs A^H for the shadow recurrence; falling back to A is
            # only valid for (conjugate-)symmetric operators — warn loudly
            # rather than silently running the wrong algorithm
            import warnings

            warnings.warn(
                "Bicg: operator has no conj_transpose(); using A itself for "
                "the shadow recurrence, which is only correct for Hermitian "
                "operators. Provide conj_transpose() for nonsymmetric A.",
                stacklevel=2,
            )
            At = A
        M = preconditioner
        Mt = M.conj_transpose() if hasattr(M, "conj_transpose") else M
        return cls(
            A=A, preconditioner=M, criterion=criterion, At=At, Mt=Mt, **params
        )

    def _try_vmem_fused(self, b, x0):
        """Whole-solve-in-VMEM BiCG (ops/pallas_cgs.py): both diagonal
        stacks (A and A^H) ride in VMEM so the shadow recurrence's
        conj-transposed SpMV is pure VPU work; z = M r / z2 = M r2 are
        chunk-wise multiplies (real diagonal M, so M^H = M).  Returns
        (x, SolveInfo) or None."""
        from ..matrix.dia import Dia
        from ..ops.pallas_dia import _plan
        from ._fused_gate import frame, prepare_fused_dia, tol_sq_eff
        from ..ops.pallas_cgs import bicg_vmem_fits, bicg_vmem_solve

        At = self.At
        if not isinstance(At, Dia):
            return None
        if At.diags.dtype not in (jnp.float32, jnp.bfloat16):
            return None

        def fits(nd, R, itemsize, use_minv, halo_rows):
            if At.diags.shape[1] != R:
                return False
            _, _, _, lo_t, hi_t = _plan(At.offsets, R)
            return bicg_vmem_fits(
                nd, At.diags.shape[0], R, itemsize, use_minv=use_minv,
                halo_rows=max(halo_rows, lo_t + hi_t),
            )

        ctx = prepare_fused_dia(self, b, fits)
        if ctx is None:
            return None
        A, R = ctx["A"], ctx["R"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        if ctx["minv_flat"] is not None:
            minv2 = frame(ctx["minv_flat"][:, None].astype(jnp.float32), R)
        else:
            minv2 = None
        x2, it, mon, conv = bicg_vmem_solve(
            A.diags,
            A.offsets,
            At.diags,
            At.offsets,
            frame(r0, R),
            frame(x0, R),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )

    def _solve_impl(self, b, x0):
        fast = self._try_vmem_fused(b, x0)
        if fast is not None:
            return fast
        A, M, At, Mt = self.A, self.preconditioner, self.At, self.Mt
        cap = extract_max_iters(self.criterion)
        k = b.shape[1]
        ax = self.axis_name

        r0 = b - A.apply(x0)
        baselines = self._baselines(b, r0)

        def cond(st):
            return (st[6] < cap) & ~jnp.all(st[7])

        def body(st):
            x, r, r2, p, p2, rho, it, stopped, rn_prev = st
            z = M.apply(r)
            z2 = Mt.apply(r2)
            rho_new = vdot(r2, z, ax)
            beta = safe_div(rho_new, rho)
            first = it == 0
            p_new = jnp.where(first, z, z + beta[None, :] * p)
            p2_new = jnp.where(first, z2, z2 + jnp.conj(beta)[None, :] * p2)
            q = A.apply(p_new)
            q2 = At.apply(p2_new)
            alpha = jnp.where(stopped, 0, safe_div(rho_new, vdot(p2_new, q, ax)))
            x_new = masked_cols(x + alpha[None, :] * p_new, x, stopped)
            r_new = masked_cols(r - alpha[None, :] * q, r, stopped)
            r2_new = masked_cols(r2 - jnp.conj(alpha)[None, :] * q2, r2, stopped)
            stopped_new, rn = self._check_stop(
                it + 1, stopped, r=r_new, rho=rho_new, baselines=baselines
            )
            return (
                x_new,
                r_new,
                r2_new,
                masked_cols(p_new, p, stopped),
                masked_cols(p2_new, p2, stopped),
                jnp.where(stopped, rho, rho_new),
                it + 1,
                stopped_new,
                rn,
            )

        init = (
            x0,
            r0,
            jnp.conj(r0),
            jnp.zeros_like(b),
            jnp.zeros_like(b),
            jnp.ones((k,), dtype=b.dtype),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((k,), dtype=bool),
            baselines["initial_resnorm"],
        )
        out = jax.lax.while_loop(cond, body, init)
        x = out[0]
        return x, SolveInfo(
            iterations=out[6], residual_norm=out[8], converged=out[7], history=None
        )

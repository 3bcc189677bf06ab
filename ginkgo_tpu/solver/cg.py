"""Conjugate gradient (and flexible CG).

Reference: core/solver/cg.cpp (driver loop :107-190, 18n/iter memory-traffic
annotation :148-156, step kernels common/unified/solver/cg_kernels.cpp) and
fcg.cpp.  The reference's per-iteration host sync on the stop flag
disappears: the whole loop is one `lax.while_loop`, criteria fused in-graph,
per-column stop masks freezing converged columns exactly like the
stopping-status-masked step_1/step_2 kernels.
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
)


@linop_dataclass
class Cg(IterativeSolverMixin, LinOp):
    A: Any
    preconditioner: Any
    criterion: Any
    axis_name: Any = static_field(default=None)
    track_history: bool = static_field(default=False)

    @classmethod
    def create(cls, A, preconditioner, criterion, **params):
        return cls(A=A, preconditioner=preconditioner, criterion=criterion, **params)

    def _solve_impl(self, b, x0):
        fast = self._try_vmem_fused(b, x0)
        if fast is not None:
            return fast
        x, info, _ = self._solve_with_state(b, x0, None)
        return x, info

    def _try_vmem_fused(self, b, x0, flexible=False):
        """Whole-solve-in-VMEM fast path (ops/pallas_cg.py): the entire CG
        loop runs inside ONE Pallas kernel when A is a Dia whose diagonals
        and the Krylov vectors fit in VMEM, the preconditioner is diagonal
        (Identity / Diagonal / scalar Jacobi), there is a single RHS, and
        the criterion is a plain Iteration/ResidualNorm combination (gate:
        solver/_fused_gate.py).  Default-on for TPU — measured 3.2x/2.9x/
        7.7x over the streaming while_loop at 4.19M(bf16)/1M/65k rows
        (PERF.md); opt out with GINKGO_TPU_NO_FUSED_CG=1.  The reference's
        fusion end-point (cg.cpp:148-156 traffic model) taken to zero
        per-iteration HBM traffic.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_dia, tol_sq_eff
        from ..ops.pallas_cg import cg_vmem_fits, cg_vmem_solve

        if b.shape[1] > 1:
            # k-RHS solves ride the per-column-stopping multi kernel
            return Cg._try_vmem_fused_multi(self, b, x0, flexible=flexible)
        fast = Cg._try_vmem_fused_pell(self, b, x0, flexible=flexible)
        if fast is not None:
            return fast
        if not flexible:  # the ILU in-kernel preconditioner is plain-CG only
            fast = self._try_vmem_fused_ilu(b, x0)
            if fast is not None:
                return fast
        # the in-kernel MG preconditioner serves both: plain CG beta, or
        # FCG's Polak-Ribiere beta (the right pairing for the nonlinear
        # K-cycle — Notay's FCG/K-cycle combination)
        # explicit class call: Fcg reuses this method without subclassing
        fast = Cg._try_vmem_fused_mg(self, b, x0, flexible=flexible)
        if fast is not None:
            return fast

        store_q_pick = []

        def fits(nd, R, itemsize, use_minv, halo_rows):
            if cg_vmem_fits(nd, R, itemsize, use_minv=use_minv,
                            halo_rows=halo_rows):
                store_q_pick.append(True)
                return True
            if cg_vmem_fits(nd, R, itemsize, use_minv=use_minv,
                            store_q=False, halo_rows=halo_rows):
                store_q_pick.append(False)  # recompute A@p in pass 2
                return True
            return False

        ctx = prepare_fused_dia(self, b, fits)
        if ctx is None:
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
        x2, it, mon, conv = cg_vmem_solve(
            A.diags,
            A.offsets,
            frame(r0, R),
            frame(x0, R),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            store_q=store_q_pick[0],
            flexible=flexible,
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            # parity with the generic loop's residual_norm fill when no
            # exact-residual criterion is tracked (solver_base._check_stop)
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        info = SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )
        return x, info

    def _try_vmem_fused_multi(self, b, x0, flexible=False):
        """k-RHS whole-solve-in-VMEM CG (ops/pallas_cg.cg_vmem_solve_multi):
        per-column stopping runs IN-KERNEL — a converged column's updates
        freeze (the reference's stopping_status-masked step kernels,
        stopping_status.hpp:62-145) while the shared diagonal blocks are
        loaded once per chunk for all k columns.  Dia operators, k <= 8
        f32 columns, diagonal preconditioners.  Returns (x, SolveInfo)
        or None."""
        from ._fused_gate import (
            frame,
            frame_cols,
            prepare_fused_dia,
            tol_sq_eff_cols,
            unframe_cols,
        )
        from ..ops.pallas_cg import cg_vmem_fits, cg_vmem_solve_multi

        k = b.shape[1]
        if k > 8:
            return None
        store_q_pick = []

        def fits(nd, R, itemsize, use_minv, halo_rows):
            if cg_vmem_fits(nd, R, itemsize, use_minv=use_minv,
                            halo_rows=halo_rows, k=k):
                store_q_pick.append(True)
                return True
            if cg_vmem_fits(nd, R, itemsize, use_minv=use_minv,
                            store_q=False, halo_rows=halo_rows, k=k):
                store_q_pick.append(False)
                return True
            return False

        ctx = prepare_fused_dia(self, b, fits, max_cols=8)
        if ctx is None:
            return None
        A, R = ctx["A"], ctx["R"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff_cols(ctx, b, r0)
        minv2 = (
            frame(ctx["minv_flat"][:, None].astype(jnp.float32), R)
            if ctx["minv_flat"] is not None
            else None
        )
        x3, it, mon, conv, _itc = cg_vmem_solve_multi(
            A.diags,
            A.offsets,
            frame_cols(r0, R),
            frame_cols(x0, R),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            store_q=store_q_pick[0],
            flexible=flexible,
            interpret=ctx["interpret"],
        )
        x = unframe_cols(x3, n)
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon).astype(b.dtype)
        else:
            rn = jnp.full((k,), jnp.inf, dtype=b.dtype)
        conv_mask = conv & ctx["has_res"]
        info = SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )
        return x, info

    def _try_vmem_fused_pell(self, b, x0, flexible=False):
        """Whole-solve-in-VMEM CG for GENERAL unstructured operators
        (ops/pallas_pell_cg.py): when A is a Pell whose slot arrays +
        vectors fit VMEM, the entire CG loop — including the
        gather-based SpMV — runs inside one Pallas kernel with zero
        per-iteration HBM traffic.  Same gate/criterion/flag rules as
        the Dia path.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_pell, tol_sq_eff
        from ..ops.pallas_pell_cg import pell_cg_vmem_solve

        ctx = prepare_fused_pell(self, b)
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
        x2, it, mon, conv = pell_cg_vmem_solve(
            A,
            frame(r0, Rf),
            frame(x0, Rf),
            minv2,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            flexible=flexible,
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        info = SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )
        return x, info

    def _try_vmem_fused_ilu(self, b, x0):
        """Whole-solve-in-VMEM CG with IN-KERNEL ILU/IC preconditioning
        (ops/pallas_cg_ilu.py): the two triangular solves run as
        Jacobi-Richardson sweeps over Dia-banded factor triangles inside
        the same kernel — the production incomplete-factorization
        workflow (ilu.hpp:114 / ic.hpp:107 + Chow-Patel iterative
        trisolves) with zero per-iteration HBM traffic.  Returns
        (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_dia_ilu, tol_sq_eff
        from ..ops.pallas_cg_ilu import cg_ilu_vmem_solve

        ctx = prepare_fused_dia_ilu(self, b)
        if ctx is None:
            return None
        A, R = ctx["A"], ctx["R"]
        lt, ut = ctx["l_solver"], ctx["u_solver"]
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        invdl2 = frame(
            (1.0 / lt.diag)[:, None].astype(jnp.float32), R
        )
        invdu2 = frame(
            (1.0 / ut.diag)[:, None].astype(jnp.float32), R
        )
        x2, it, mon, conv = cg_ilu_vmem_solve(
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
        info = SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )
        return x, info

    def _try_vmem_fused_mg(self, b, x0, flexible=False):
        """Whole-solve-in-VMEM CG with an IN-KERNEL AMG V-cycle
        preconditioner (ops/pallas_mg.py): per iteration, one A-SpMV +
        one full multigrid cycle over the VMEM-resident hierarchy + the
        CG vector work, with zero per-iteration HBM traffic — the
        multigrid-preconditioned-solver workflow (multigrid.cpp run_cycle
        per apply) taken to a single kernel.  Gate: A is Dia, the
        preconditioner is a Multigrid whose hierarchy passes the fused
        V-cycle structural gate with a level-0 frame matching A's, and
        everything fits VMEM.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import _common_checks, frame, tol_sq_eff
        from ..matrix.dia import Dia
        from ..ops.pallas_dia import _plan
        from ..ops.pallas_mg import mg_cg_vmem_fits, mg_cg_vmem_solve
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
        if not mg_cg_vmem_fits(plan, nd, R,
                               a_itemsize=A.diags.dtype.itemsize,
                               halo_a=pa_lo + pa_hi):
            return None
        n = A.shape[0]
        r0 = b - A.apply(x0)
        tol_sq = tol_sq_eff(ctx, b, r0)
        x2, it, mon, conv = mg_cg_vmem_solve(
            A, plan, parts["diags"], parts["dinv2"], parts["minv2"],
            frame(r0, R), frame(x0, R),
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            use_implicit=ctx["implicit"],
            flexible=flexible,
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        if ctx["has_res"] and not ctx["implicit"]:
            rn = jnp.sqrt(mon)[None].astype(b.dtype)
        else:
            rn = jnp.full((1,), jnp.inf, dtype=b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        info = SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )
        return x, info

    def _solve_with_state(self, b, x0, resume):
        """Body shared by solve() and the chunked driver: `resume` carries
        (r, p, rho_prev, first_flag) across chunk boundaries so chunking
        does NOT restart the Krylov recurrence (solve_chunked)."""
        A, M = self.A, self.preconditioner
        cap = extract_max_iters(self.criterion)
        k = b.shape[1]

        if resume is None:
            r0 = b - A.apply(x0)  # cg.cpp:142
            p_init = jnp.zeros_like(b)
            rho_init = jnp.ones((k,), dtype=b.dtype)
            fresh = jnp.asarray(True)
        else:
            r0, p_init, rho_init, fresh = resume
        baselines = self._baselines(b, r0)
        hist0 = (
            jnp.zeros((cap, k), dtype=jnp.result_type(b.real.dtype))
            if self.track_history
            else None
        )

        def cond(st):
            x, r, p, rho_prev, it, stopped, resnorm, hist = st
            return (it < cap) & ~jnp.all(stopped)

        def body(st):
            x, r, p, rho_prev, it, stopped, resnorm, hist = st
            z = M.apply(r)  # cg.cpp:159
            rho = vdot(r, z, self.axis_name)  # cg.cpp:161
            # step_1: p = z + beta p with beta = rho/rho_prev (cg.cpp:177)
            beta = safe_div(rho, rho_prev)
            first = (it == 0) & fresh
            p_new = jnp.where(first, z, z + beta[None, :] * p)
            p_new = masked_cols(p_new, p, stopped)
            q = A.apply(p_new)  # cg.cpp:181
            pq = vdot(p_new, q, self.axis_name)  # cg.cpp:183
            alpha = jnp.where(stopped, 0, safe_div(rho, pq))
            # step_2: x += alpha p; r -= alpha q (cg.cpp:187)
            x_new = x + alpha[None, :] * p_new
            r_new = r - alpha[None, :] * q
            stopped_new, rn = self._check_stop(
                it + 1, stopped, r=r_new, rho=rho, baselines=baselines
            )
            if hist is not None:
                hist = jax.lax.dynamic_update_slice(
                    hist, rn[None, :].astype(hist.dtype), (it, jnp.zeros_like(it))
                )
            return (x_new, r_new, p_new, rho, it + 1, stopped_new, rn, hist)

        init = (
            x0,
            r0,
            p_init,
            rho_init,
            jnp.asarray(0, jnp.int32),
            jnp.zeros((k,), dtype=bool),
            baselines["initial_resnorm"],
            hist0,
        )
        x, r, p, rho, it, stopped, resnorm, hist = jax.lax.while_loop(
            cond, body, init
        )
        info = SolveInfo(
            iterations=it, residual_norm=resnorm, converged=stopped, history=hist
        )
        return x, info, (r, p, rho, jnp.asarray(False))


@linop_dataclass
class Fcg(IterativeSolverMixin, LinOp):
    """Flexible CG (reference core/solver/fcg.cpp): Polak-Ribiere style
    rho_t = dot(r_new - r_old, z_new) so the preconditioner may vary."""

    A: Any
    preconditioner: Any
    criterion: Any
    axis_name: Any = static_field(default=None)
    track_history: bool = static_field(default=False)

    @classmethod
    def create(cls, A, preconditioner, criterion, **params):
        return cls(A=A, preconditioner=preconditioner, criterion=criterion, **params)

    def _solve_impl(self, b, x0):
        # the fused CG kernels carry the FCG Polak-Ribiere numerator as a
        # third reduction in the update pass (flexible=True) — same gate
        # as Cg's (a frozen diagonal M makes FCG == CG in exact
        # arithmetic, but the recurrences must match the generic FCG
        # loop iteration-for-iteration, which flexible=True does)
        fast = Cg._try_vmem_fused(self, b, x0, flexible=True)
        if fast is not None:
            return fast
        A, M = self.A, self.preconditioner
        cap = extract_max_iters(self.criterion)
        k = b.shape[1]

        r0 = b - A.apply(x0)
        baselines = self._baselines(b, r0)

        def cond(st):
            return (st[5] < cap) & ~jnp.all(st[6])

        def body(st):
            x, r, r_old, p, rho_prev, it, stopped, resnorm = st
            z = M.apply(r)
            rho = vdot(r, z, self.axis_name)
            rho_t = vdot(r - r_old, z, self.axis_name)  # fcg extra t-vector
            beta = safe_div(rho_t, rho_prev)
            first = it == 0
            p_new = jnp.where(first, z, z + beta[None, :] * p)
            p_new = masked_cols(p_new, p, stopped)
            q = A.apply(p_new)
            pq = vdot(p_new, q, self.axis_name)
            alpha = jnp.where(stopped, 0, safe_div(rho, pq))
            x_new = x + alpha[None, :] * p_new
            r_new = r - alpha[None, :] * q
            stopped_new, rn = self._check_stop(
                it + 1, stopped, r=r_new, rho=rho, baselines=baselines
            )
            return (x_new, r_new, r, p_new, rho, it + 1, stopped_new, rn)

        init = (
            x0,
            r0,
            jnp.zeros_like(b),
            jnp.zeros_like(b),
            jnp.ones((k,), dtype=b.dtype),
            jnp.asarray(0, jnp.int32),
            jnp.zeros((k,), dtype=bool),
            baselines["initial_resnorm"],
        )
        x, r, r_old, p, rho, it, stopped, resnorm = jax.lax.while_loop(
            cond, body, init
        )
        return x, SolveInfo(
            iterations=it, residual_norm=resnorm, converged=stopped, history=None
        )

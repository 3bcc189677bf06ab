"""Algebraic multigrid solver (V/W/F cycles).

Reference: core/solver/multigrid.cpp (790) — hierarchy built in generate()
(:491) from `MultigridLevel` factories until max_levels/min_coarse_rows,
cycle recursion in MultigridState::run_cycle (:269-489; the F-cycle calls a
V-cycle on the second visit :452-455), pre/mid/post smoothers
(multigrid.hpp:132-180), coarse solver.

TPU design: the hierarchy is a static Python list of levels (shapes shrink
per level, so each level compiles once); the cycle recursion unrolls at trace
time into one straight-line XLA program — no host involvement inside a cycle.
Used standalone (criteria-driven outer lax.while_loop... realized as the
chunk-free host loop over jitted cycles for simplicity of level closure) or
as a preconditioner (one cycle per apply), like the
multigrid-preconditioned-solver example.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..stop.criterion import combine, Iteration, ResidualNorm
from ..multigrid.pgm import PgmFactory
from .solver_base import SolveInfo, extract_max_iters, norm2


@linop_dataclass
class FixedSmoother(LinOp):
    """Fixed-count damped Jacobi-Richardson smoother.

    Semantics of the reference's default build_smoother(Jacobi, 1, 0.9)
    (multigrid.hpp) — but WITHOUT the full Ir solver machinery (criteria,
    norms, per-column stop masks, while_loop) that a criteria-driven
    smoother drags into every level of every cycle.  A V-cycle instantiates
    2 smoothers x levels; keeping each one a bare fori_loop of
    x += relax * dinv * (b - A x) is what keeps the cycle at streaming cost
    (and the unrolled 10-level XLA graph compilable in seconds)."""

    A: Any
    dinv: Any  # (n,) inverse diagonal
    iters: int = static_field(default=1)
    relax: float = static_field(default=0.9)

    @property
    def shape(self):
        return self.A.shape

    @property
    def dtype(self):
        return self.A.dtype

    def _fused(self, arr, x0_arr, with_residual):
        """Whole-smoother-in-VMEM fast path (ops/pallas_ir.py): all sweeps
        run inside ONE Pallas kernel with x/r/b/dinv VMEM-resident when A
        is a Dia that fits (gate: _fused_gate.smoother_fused_ready).  With
        `with_residual` the kernel also returns r = b - A x — the V-cycle
        uses it to skip its separate per-level residual SpMV.  Gated by
        the same env flags as the fused CG (all in _env_trace_key).
        Returns (x, r_or_None) or None."""
        from ._fused_gate import frame, smoother_fused_ready
        from ..ops.pallas_ir import ir_vmem_smooth

        ctx = smoother_fused_ready(self.A, arr)
        if ctx is None:
            return None
        R = ctx["R"]
        n = self.A.shape[0]
        x2, r2 = ir_vmem_smooth(
            self.A.diags,
            self.A.offsets,
            frame(arr.astype(jnp.float32), R),
            None if x0_arr is None else frame(x0_arr.astype(jnp.float32), R),
            frame(self.dinv[:, None].astype(jnp.float32), R),
            omega=self.relax,
            iters=self.iters,
            with_residual=with_residual,
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n].astype(arr.dtype)
        r = r2.reshape(-1, 1)[:n].astype(arr.dtype) if with_residual else None
        return x, r

    def solve(self, b, x0=None):
        arr, was_1d = as_2d(b)
        x0_arr = None if x0 is None else as_2d(x0)[0]
        fast = self._fused(arr, x0_arr, with_residual=False)
        if fast is not None:
            return restore_1d(fast[0], was_1d), None
        x = jnp.zeros_like(arr) if x0_arr is None else x0_arr
        scale = jnp.asarray(self.relax, arr.dtype) * self.dinv[:, None]

        def step(_, x):
            return x + scale * (arr - as_2d(self.A.apply(x))[0])

        if self.iters == 1:  # unrolled: no loop machinery at all
            x = step(0, x)
        else:
            x = jax.lax.fori_loop(0, self.iters, step, x)
        return restore_1d(x, was_1d), None

    def solve_with_residual(self, b, x0=None):
        """(x, r = b - A x) in one pass; the fused kernel returns r for
        free, the generic path pays one extra SpMV (exactly what the
        V-cycle would otherwise compute itself)."""
        arr, was_1d = as_2d(b)
        x0_arr = None if x0 is None else as_2d(x0)[0]
        fast = self._fused(arr, x0_arr, with_residual=True)
        if fast is not None:
            return restore_1d(fast[0], was_1d), restore_1d(fast[1], was_1d)
        x, _ = self.solve(arr, x0=x0_arr)
        r = arr - as_2d(self.A.apply(x))[0]
        return restore_1d(x, was_1d), restore_1d(r, was_1d)

    def apply(self, b):
        return self.solve(b)[0]


def _fixed_smoother(A, iters=1, relax=0.9):
    # duck-typed diagonal extraction: custom user operators may only
    # expose to_csr (custom-matrix-format contract)
    src = A if hasattr(A, "extract_diagonal") else A.to_csr()
    diag = src.extract_diagonal().values
    dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1), 0)
    return FixedSmoother(A=A, dinv=dinv.astype(A.dtype), iters=iters,
                         relax=relax)


def default_smoother_factory(A):
    """Damped Jacobi-Richardson, 1 iteration (the reference's default
    build_smoother(Jacobi, 1, 0.9), multigrid.hpp)."""
    return _fixed_smoother(A)


def default_coarse_solver_factory(A):
    from .direct import DirectFactory

    return DirectFactory().generate(A)


@linop_dataclass
class Multigrid(LinOp):
    levels: tuple  # tuple of MultigridLevel
    pre_smoothers: tuple
    post_smoothers: tuple
    mid_smoothers: tuple
    coarse_solver: Any
    criterion: Any
    #: (Rc*128, Rc*128) f32 dense inverse of the coarsest operator, built
    #: at generate time when the coarse solver is the default exact Direct
    #: solve — feeds the fused whole-V-cycle kernel (ops/pallas_mg.py)
    coarse_dense_inv: Any = None
    #: 'v' | 'w' | 'f' (multigrid.hpp:79) | 'k' (working K-cycle — the
    #: reference registers kcycle_step_1/2/check_stop kernels and declares
    #: kcycle_base/kcycle_rel_tol (multigrid.hpp:364-380) but never wires
    #: them into run_cycle in v1.5.0; here cycle='k' is a real cycle type)
    cycle: str = static_field(default="v")
    #: enable the FCG acceleration when level % kcycle_base == 0
    kcycle_base: int = static_field(default=1)
    #: second FCG iteration policy: <= 0 always one, +inf always two
    #: (the factory canonicalizes the reference's documented nan sentinel
    #: to +inf — nan != nan would break static-field equality and force
    #: a retrace per solver instance), else two iff some column's updated
    #: residual norm > rel_tol * old (kcycle_check_stop semantics,
    #: reference/solver/multigrid_kernels.cpp:106-121)
    kcycle_rel_tol: float = static_field(default=0.25)
    #: mid_smooth_type (multigrid.hpp:95): which smoother fires on the
    #: non-first/non-end W/F visits — 'both' | 'post_smoother' |
    #: 'pre_smoother' | 'standalone' (default, multigrid.hpp:306)
    mid_case: str = static_field(default="standalone")
    axis_name: Any = static_field(default=None)

    @property
    def shape(self):
        return self.levels[0].fine_op.shape

    @property
    def dtype(self):
        return self.levels[0].fine_op.dtype

    # -- one cycle (trace-time unrolled recursion) ------------------------------

    def _run_cycle(self, lvl: int, b, x, mode: str,
                   first: bool = True, end: bool = True):
        """Faithful to MultigridState::run_mg_cycle (multigrid.cpp:
        403-487): pre-smooth on first-of-cycle visits (or when mid_case
        routes the mid role through the pre smoother), the W/F second
        coarse visit re-enters level lvl+1 with the SAME restricted rhs
        and the current coarse solution (:452-461; F drops to V), one
        prolongation per parent visit, post-smooth on end-of-cycle
        visits (or mid_case 'both'/'post_smoother'), and the standalone
        mid smoother at the end of non-final W/F visits (:478-485)."""
        level = self.levels[lvl]
        A = level.fine_op
        use_pre = first or self.mid_case in ("both", "pre_smoother")
        if use_pre:
            pre = self.pre_smoothers[lvl]
            if hasattr(pre, "solve_with_residual"):
                # fused smoother returns r = b - A x for free (pallas_ir)
                x, r = pre.solve_with_residual(b, x0=x)
            else:
                x = pre.solve(b, x0=x)[0]
                r = b - A.apply(x)
        else:
            if x is None:
                x = jnp.zeros_like(b)
            r = b - A.apply(x)
        rc = level.restrict_op.apply(r)
        if lvl + 1 == len(self.levels):
            ec = self.coarse_solver.apply(rc)
        elif mode == "k":
            if lvl % max(self.kcycle_base, 1) == 0:
                ec = self._kcycle_correction(lvl, rc)
            else:
                ec = self._run_cycle(
                    lvl + 1, rc, None, "k", first=True, end=True
                )
        else:
            # x=None marks a zero initial guess: the fused smoother then
            # skips its initial residual SpMV entirely (r0 = b)
            ec = self._run_cycle(
                lvl + 1, rc, None, mode, first=True, end=(mode == "v")
            )
            if mode in ("w", "f"):
                # second coarse visit continues from the first visit's
                # solution with the same rhs (multigrid.cpp:452-461)
                ec = self._run_cycle(
                    lvl + 1, rc, ec, "v" if mode == "f" else mode,
                    first=False, end=True,
                )
        x = x + level.prolong_op.apply(ec)
        if end or self.mid_case in ("both", "post_smoother"):
            x = self.post_smoothers[lvl].solve(b, x0=x)[0]
        if mode in ("w", "f") and not end and self.mid_case == "standalone":
            x = self.mid_smoothers[lvl].solve(b, x0=x)[0]
        return x

    def _kcycle_correction(self, lvl, rc):
        """FCG(2)-accelerated coarse correction — the K-cycle (Notay's
        aggregation AMG).  The scalar formulas are EXACTLY the reference's
        kcycle kernels (reference/solver/multigrid_kernels.cpp:55-104:
        temp = alpha/rho with per-column finite guards in step_1;
        scalar_d = zeta/(beta - gamma^2/rho), scalar_e = 1 - gamma/alpha
        * scalar_d in step_2; kcycle_check_stop :106-121), with the
        driver reconstructed around them: v1.5.0 registers the kernels
        and declares kcycle_base/kcycle_rel_tol (multigrid.hpp:364-380)
        but never invokes them from run_cycle.

        One inner K-cycle at the next level plays the (nonlinear) FCG
        preconditioner B: c1 = B(rc); the correction is the A_c-optimal
        combination over span{c1, c2} with c2 = B of the updated
        residual, run only when the first step did not reduce the
        residual below kcycle_rel_tol * ||rc|| (column-wise ANY, the
        check_stop kernel's all-columns-stop test)."""
        import math

        Ac = self.levels[lvl].coarse_op

        def col(a, b):
            s = jnp.sum(a * b, axis=0)
            if self.axis_name is not None:
                s = jax.lax.psum(s, self.axis_name)
            return s

        c1 = self._run_cycle(lvl + 1, rc, None, "k", first=True, end=True)
        v = Ac.apply(c1)
        rho = col(c1, v)
        alpha = col(c1, rc)
        temp = alpha / rho  # raw: step_1 guards on is_finite(result)
        fin = jnp.isfinite(temp)
        tempe = jnp.where(fin, temp, 1.0)
        g2 = jnp.where(fin[None, :], rc - tempe[None, :] * v, rc)
        e1 = jnp.where(fin[None, :], tempe[None, :] * c1, c1)

        def second(_):
            c2 = self._run_cycle(
                lvl + 1, g2, None, "k", first=True, end=True
            )
            w = Ac.apply(c2)
            gamma = col(c1, w)
            beta = col(c2, w)
            zeta = col(c2, g2)
            scalar_d = zeta / (beta - gamma * gamma / rho)
            scalar_e = 1.0 - gamma / alpha * scalar_d
            ok = jnp.isfinite(scalar_d) & jnp.isfinite(scalar_e)
            return jnp.where(
                ok[None, :],
                scalar_e[None, :] * e1 + scalar_d[None, :] * c2,
                e1,
            )

        rt = self.kcycle_rel_tol
        if math.isnan(rt) or (math.isinf(rt) and rt > 0):
            return second(None)  # always two iterations
        if rt <= 0:
            return e1  # always one iteration
        old_n = jnp.sqrt(col(rc, rc))
        new_n = jnp.sqrt(col(g2, g2))
        need2 = jnp.any(new_n > rt * old_n)
        return jax.lax.cond(need2, second, lambda _: e1, None)

    def _try_fused_vcycle(self, arr, x_arr):
        """Whole-V-cycle-in-one-kernel fast path (ops/pallas_mg.py): every
        level's smoothers, residual, banded transfers and the dense coarse
        solve run inside ONE Pallas kernel with the full hierarchy
        VMEM-resident (the reference launches separate kernels per step,
        multigrid.cpp:269-489).  Gate: cycle 'v', single f32 RHS, all-Dia
        hierarchy with pure-stride banded transfers, FixedSmoothers with
        shared pre/post objects, default Direct coarse solver (replaced by
        the generate-time dense inverse), VMEM fits.  Consults only env
        flags already in solver_base._env_trace_key.  x_arr None means a
        zero initial guess (skips the initial-residual work).  Returns the
        cycle result or None."""
        import os

        if arr.ndim != 2 or arr.shape[1] != 1 or arr.dtype != jnp.float32:
            return None
        if os.environ.get("GINKGO_TPU_NO_PALLAS"):
            return None
        force = bool(os.environ.get("GINKGO_TPU_FORCE_VMEM_CG"))
        on_tpu = jax.default_backend() == "tpu"
        if os.environ.get("GINKGO_TPU_NO_FUSED_CG") and not force:
            return None
        if not (force or on_tpu):
            return None
        parts = self._fused_vcycle_parts()
        if parts is None:
            return None
        from ..ops.pallas_mg import mg_vmem_vcycle, vcycle_vmem_fits
        from ._fused_gate import frame

        plan = parts["plan"]
        if not vcycle_vmem_fits(plan):
            return None
        n = self.shape[0]
        R0 = plan["lv"][0]["R"]
        x2 = mg_vmem_vcycle(
            plan,
            parts["diags"],
            parts["dinv2"],
            parts["minv2"],
            frame(arr.astype(jnp.float32), R0),
            None if x_arr is None else frame(
                x_arr.astype(jnp.float32), R0
            ),
            interpret=not on_tpu,
        )
        return x2.reshape(-1, 1)[:n].astype(arr.dtype)

    def _fused_vcycle_parts(self):
        """Structural half of the fused-V-cycle gate: all-Dia hierarchy,
        pure-stride banded transfers, FixedSmoothers, generate-time coarse
        dense inverse.  No env / RHS / VMEM checks (callers do those).
        Returns None or {plan, diags, dinv2, minv2}."""
        from ..matrix.dia import Dia
        from ..multigrid.pgm import BandedProlongation, BandedRestriction
        from .direct import Direct

        if self.cycle not in ("v", "w", "f", "k"):
            return None
        if self.coarse_dense_inv is None or not isinstance(
            self.coarse_solver, Direct
        ):
            return None
        meta = []
        for l, level in enumerate(self.levels):
            A = level.fine_op
            pre = self.pre_smoothers[l]
            post = self.post_smoothers[l]
            mid = self.mid_smoothers[l]
            if not (isinstance(A, Dia) and isinstance(pre, FixedSmoother)):
                return None
            if post is not pre and not (
                isinstance(post, FixedSmoother)
                and post.iters == pre.iters
                and post.relax == pre.relax
            ):
                return None
            mid_used = self.cycle in ("w", "f") and (
                self.mid_case == "standalone"
            )
            if mid_used and mid is not pre and not (
                isinstance(mid, FixedSmoother)
                and mid.iters == pre.iters
                and mid.relax == pre.relax
            ):
                return None
            if self.mid_case not in (
                "both", "post_smoother", "pre_smoother", "standalone"
            ):
                return None
            if A.diags.dtype not in (jnp.float32, jnp.bfloat16):
                return None
            R_ = level.restrict_op
            P_ = level.prolong_op
            if not (
                isinstance(R_, BandedRestriction)
                and isinstance(P_, BandedProlongation)
                and R_.deltas == (0,)
                and P_.deltas == (0,)
                and R_.stride == P_.stride
                and (128 % (2 * R_.stride) == 0 or R_.stride % 128 == 0)
            ):
                return None
            nd, Rl, _ = A.diags.shape
            if nd == 0:
                return None
            meta.append(
                dict(
                    nd=nd,
                    R=Rl,
                    offsets=A.offsets,
                    itemsize=A.diags.dtype.itemsize,
                    iters_pre=pre.iters,
                    relax_pre=pre.relax,
                    iters_post=pre.iters,
                    relax_post=pre.relax,
                    iters_mid=pre.iters,
                    relax_mid=pre.relax,
                    stride=R_.stride,
                )
            )
        from ..ops.pallas_mg import build_vcycle_plan
        from ._fused_gate import frame

        nc = self.levels[-1].coarse_op.shape[0]
        Rc = -(-nc // 128)
        if self.coarse_dense_inv.shape != (Rc * 128, Rc * 128):
            return None
        meta.append(dict(Rc=Rc))
        plan = build_vcycle_plan(
            meta, mode=self.cycle, mid_case=self.mid_case,
            kcycle_base=self.kcycle_base,
            kcycle_rel_tol=self.kcycle_rel_tol,
        )
        if plan["visits"] > 96:  # W-cycle unroll is exponential in depth
            return None
        dinv2 = [
            frame(
                self.pre_smoothers[l].dinv[:, None].astype(jnp.float32),
                meta[l]["R"],
            )
            for l in range(len(self.levels))
        ]
        return dict(
            plan=plan,
            diags=[lv.fine_op.diags for lv in self.levels],
            dinv2=dinv2,
            minv2=self.coarse_dense_inv.astype(jnp.float32),
        )

    def cycle_apply(self, b, x, x_is_zero=False):
        """One full multigrid cycle from initial guess x."""
        fast = self._try_fused_vcycle(b, None if x_is_zero else x)
        if fast is not None:
            return fast
        return self._run_cycle(0, b, x, self.cycle)

    # -- LinOp / solver surface ---------------------------------------------------

    def apply(self, b):
        """Preconditioner-style apply: one cycle from zero."""
        arr, was_1d = as_2d(b)
        out = self.cycle_apply(arr, jnp.zeros_like(arr), x_is_zero=True)
        return restore_1d(out, was_1d)

    def solve(self, b, x0=None):
        from .solver_base import _env_trace_key, _jittable, _jitted_solve

        arr, was_1d = as_2d(b)
        x = jnp.zeros_like(arr) if x0 is None else as_2d(x0)[0]
        if _jittable(self):
            xr, info = _jitted_solve(self, arr, x, _env_trace_key())
            return restore_1d(xr, was_1d), info
        xr, info = self._solve_impl(arr, x)
        return restore_1d(xr, was_1d), info

    def _try_fused_solve(self, arr, x):
        """Whole-solve fused multigrid (ops/pallas_mg.mg_vmem_solve): the
        criteria-driven lax.while_loop of V-cycles runs INSIDE one Pallas
        kernel, true-residual stop test included — vs one cycle kernel +
        an XLA residual SpMV per iteration on the generic path.  Same
        structural gate as the fused V-cycle, plus a simple
        Iteration/ResidualNorm criterion.  Returns (x, SolveInfo) or
        None."""
        import os

        from ..stop.criterion import analyze_simple_residual
        from ._fused_gate import frame, tol_sq_eff

        if self.axis_name is not None:
            return None
        if arr.ndim != 2 or arr.shape[1] != 1 or arr.dtype != jnp.float32:
            return None
        if os.environ.get("GINKGO_TPU_NO_PALLAS"):
            return None
        force = bool(os.environ.get("GINKGO_TPU_FORCE_VMEM_CG"))
        on_tpu = jax.default_backend() == "tpu"
        if os.environ.get("GINKGO_TPU_NO_FUSED_CG") and not force:
            return None
        if not (force or on_tpu):
            return None
        simple = analyze_simple_residual(self.criterion)
        if simple is None:
            return None
        tol, baseline, implicit, has_res = simple
        parts = self._fused_vcycle_parts()
        if parts is None:
            return None
        from ..ops.pallas_mg import mg_solve_vmem_fits, mg_vmem_solve

        plan = parts["plan"]
        if not mg_solve_vmem_fits(plan):
            return None
        A = self.levels[0].fine_op
        n = self.shape[0]
        R0 = plan["lv"][0]["R"]
        r0 = arr - as_2d(A.apply(x))[0]
        tol_sq = tol_sq_eff(
            {"has_res": has_res, "baseline": baseline, "tol": tol}, arr, r0
        )
        x2, it, mon, conv = mg_vmem_solve(
            plan, parts["diags"], parts["dinv2"], parts["minv2"],
            frame(arr.astype(jnp.float32), R0),
            frame(x.astype(jnp.float32), R0),
            tol_sq_eff=tol_sq,
            max_iters=extract_max_iters(self.criterion),
            interpret=not on_tpu,
        )
        xr = x2.reshape(-1, 1)[:n].astype(arr.dtype)
        rn = jnp.sqrt(mon)[None].astype(arr.dtype)
        conv_mask = jnp.asarray(conv & has_res)[None]
        return xr, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask,
            history=None,
        )

    def _solve_impl(self, arr, x):
        fast = self._try_fused_solve(arr, x)
        if fast is not None:
            return fast
        cap = extract_max_iters(self.criterion)
        A = self.levels[0].fine_op
        k = arr.shape[1]
        bn = norm2(arr, self.axis_name)
        r0 = arr - A.apply(x)
        baselines = {
            "num_cols": k,
            "rhs_norm": bn,
            "initial_resnorm": norm2(r0, self.axis_name),
        }

        def cond(st):
            return (st[1] < cap) & ~jnp.all(st[2])

        def body(st):
            x, it, stopped, rn = st
            x_new = self.cycle_apply(arr, x)
            x_new = jnp.where(stopped[None, :], x, x_new)
            r = arr - A.apply(x_new)
            rn = norm2(r, self.axis_name)
            ctx = dict(baselines)
            ctx.update(
                iteration=it + 1,
                residual_norm=rn,
                implicit_sq_residual_norm=rn**2,
            )
            stopped = stopped | self.criterion.check_converged(ctx)
            return (x_new, it + 1, stopped, rn)

        init = (
            x,
            jnp.asarray(0, jnp.int32),
            jnp.zeros((k,), bool),
            baselines["initial_resnorm"],
        )
        x, it, stopped, rn = jax.lax.while_loop(cond, body, init)
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=stopped, history=None
        )

    @staticmethod
    def build(**kw):
        return MultigridFactory(**kw)


class MultigridFactory:
    """multigrid.hpp factory: mg_level (level factory), max_levels (:default
    10), min_coarse_rows (:default 64), cycle, smoother/coarse-solver
    factories, smoother_iters, smoother_relax."""

    def __init__(
        self,
        criteria=None,
        mg_level=None,
        max_levels: int = 10,
        min_coarse_rows: int = 64,
        cycle: str = "v",  # 'v' | 'w' | 'f' | 'k' (K-cycle, see Multigrid)
        mid_case: str = "standalone",  # mid_smooth_type (multigrid.hpp:95)
        kcycle_base: int = 1,  # multigrid.hpp:371
        kcycle_rel_tol: float = 0.25,  # multigrid.hpp:380
        pre_smoother=None,  # callable A -> solver
        post_smoother=None,
        mid_smoother=None,
        coarse_solver=None,  # callable A -> solver
        smoother_iters: int = 1,
        smoother_relax: float = 0.9,
    ):
        self.criteria = criteria
        self.mg_level = mg_level or PgmFactory()
        self.max_levels = max_levels
        self.min_coarse_rows = min_coarse_rows
        self.cycle = cycle
        self.mid_case = mid_case
        self.kcycle_base = kcycle_base
        # canonicalize the documented nan sentinel ("always two") to +inf:
        # nan in a static pytree field breaks treedef equality (nan != nan)
        # and would force a jit retrace per generated solver
        import math as _math

        self.kcycle_rel_tol = (
            float("inf") if _math.isnan(kcycle_rel_tol)
            else float(kcycle_rel_tol)
        )
        self.smoother_iters = smoother_iters
        self.smoother_relax = smoother_relax
        self.pre_smoother = pre_smoother
        self.post_smoother = post_smoother
        self.mid_smoother = mid_smoother
        self.coarse_solver = coarse_solver

    def _make_smoother(self, A):
        return _fixed_smoother(
            A, iters=self.smoother_iters, relax=self.smoother_relax
        )

    def generate(self, A) -> Multigrid:
        levels = []
        # keep the caller's operator (fast TPU formats included) at the
        # finest level; coarse levels come out of the triple product as CSR
        op = A
        while (
            len(levels) < self.max_levels
            and op.shape[0] > self.min_coarse_rows
        ):
            level = self.mg_level.generate(op)
            if level.coarse_op.shape[0] >= op.shape[0]:
                break  # no coarsening progress
            levels.append(level)
            op = level.coarse_op
        if not levels:
            level = self.mg_level.generate(op)
            levels.append(level)
            op = level.coarse_op
        mk_pre = self.pre_smoother or self._make_smoother
        mk_post = self.post_smoother or mk_pre
        mk_mid = self.mid_smoother or mk_post
        pre = tuple(mk_pre(l.fine_op) for l in levels)
        # identical factories produce identical (stateless pytree) smoothers:
        # reuse instead of re-generating per role — generate at 10^6 rows
        # costs seconds per sweep of the hierarchy
        post = pre if mk_post is mk_pre else tuple(
            mk_post(l.fine_op) for l in levels
        )
        mid = post if mk_mid is mk_post else tuple(
            mk_mid(l.fine_op) for l in levels
        )
        mk_coarse = self.coarse_solver or default_coarse_solver_factory
        coarse = mk_coarse(op)
        crit = combine(self.criteria) if self.criteria is not None else combine(
            [Iteration(max_iters=100), ResidualNorm(tolerance=1e-8)]
        )
        return Multigrid(
            levels=tuple(levels),
            pre_smoothers=pre,
            post_smoothers=post,
            mid_smoothers=mid,
            coarse_solver=coarse,
            criterion=crit,
            coarse_dense_inv=self._coarse_inverse(op, coarse),
            cycle=self.cycle,
            mid_case=self.mid_case,
            kcycle_base=self.kcycle_base,
            kcycle_rel_tol=self.kcycle_rel_tol,
        )

    @staticmethod
    def _coarse_inverse(op, coarse):
        """(Rc*128, Rc*128) f32 padded dense inverse of the coarsest
        operator when the coarse solver is the default exact Direct solve
        — the fused V-cycle kernel (ops/pallas_mg.py) applies it as one
        MXU matmul instead of the LU trisolves."""
        from .direct import Direct

        nc = op.shape[0]
        if not isinstance(coarse, Direct) or nc > 1536:
            return None
        try:
            if hasattr(op, "to_scipy"):
                dense = np.asarray(op.to_scipy().todense())
            else:
                dense = np.asarray(op.to_dense())
            inv = np.linalg.inv(dense.astype(np.float64))
        except Exception:
            return None
        Rc = -(-nc // 128)
        M = np.zeros((Rc * 128, Rc * 128), np.float32)
        # transposed: the kernel computes x_j = sum_i b_i M[i, j]
        M[:nc, :nc] = inv.T
        return jnp.asarray(M)

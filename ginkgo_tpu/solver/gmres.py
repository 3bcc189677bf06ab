"""Restarted GMRES and compressed-basis GMRES (CB-GMRES).

Reference: core/solver/gmres.cpp (460; Krylov basis (krylov_dim+1)·n +
Hessenberg + givens sin/cos per RHS, gmres.cpp:153-165), the shared
common_gmres kernels (initialize / hessenberg_qr / solve_krylov,
core/solver/common_gmres_kernels.hpp:52-70), and cb_gmres.cpp (519) with its
`storage_precision` accessor modes {keep, reduce1, reduce2, integer,
ireduce1, ireduce2} (cb_gmres.hpp:88-95, cb_gmres_accessor.hpp:87-97).

TPU design: the whole restart cycle is in-graph — the inner Arnoldi `fori`
runs exactly krylov_dim steps with converged columns frozen by masks, the
Givens QR is applied on the fly, and restarts are an outer `lax.while_loop`
that re-evaluates the TRUE residual (one extra SpMV per restart, instead of
the reference's per-iteration host sync).  Multi-RHS = `jax.vmap` of the
single-RHS core over columns; vmap lifts the while_loop into a run-until-all-
done masked loop, which reproduces the per-column stopping semantics.

Orthogonalization is two-pass classical Gram-Schmidt (CGS2) — same stability
class as the reference's MGS but expressed as two dense matvecs against the
basis, which run on the MXU instead of a sequential dot chain.

CB-GMRES stores the basis through a dtype-converting accessor (§2.12): bf16 /
int16 / int8 with one scale per basis vector; arithmetic stays in the solve
dtype.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field
from .solver_base import IterativeSolverMixin, SolveInfo, extract_max_iters

# -- basis storage accessors (cb_gmres_accessor.hpp analog) --------------------

_INT_MODES = {"integer": jnp.int16, "ireduce1": jnp.int16, "ireduce2": jnp.int8}


def _storage_dtype(mode: str, arith_dtype):
    ad = np.dtype(arith_dtype)
    if mode == "keep":
        return ad
    if mode == "reduce1":
        return np.dtype(np.float32) if ad == np.float64 else np.dtype(jnp.bfloat16)
    if mode == "reduce2":
        return np.dtype(jnp.bfloat16)
    if mode in _INT_MODES:
        return np.dtype(_INT_MODES[mode])
    raise ValueError(mode)


def _encode(w, mode: str, sdtype):
    """vector -> (stored, scale)."""
    if mode == "keep":
        return w, jnp.ones((), w.dtype)
    if mode in _INT_MODES:
        imax = 32767.0 if sdtype == np.dtype(jnp.int16) else 127.0
        amax = jnp.max(jnp.abs(w))
        scale = jnp.where(amax > 0, amax / imax, 1.0)
        q = jnp.clip(jnp.round(w / scale), -imax, imax).astype(sdtype)
        return q, scale.astype(w.dtype)
    return w.astype(sdtype), jnp.ones((), w.dtype)


def _decode(stored, scale, arith_dtype):
    return stored.astype(arith_dtype) * scale


def _decode_basis(Vs, sc, mode: str, dt):
    """Decoded (m+1, n) basis view.  Float storage modes carry unit scales,
    so the basis is returned AS STORED — the MXU consumes bf16 operands
    directly in mixed-precision matmuls (f32 accumulate), which is the
    entire point of the compressed basis: matvec traffic at storage width.
    An astype/scale here would materialize a full arithmetic-precision
    basis copy EVERY Arnoldi step (measured: it makes reduce1 SLOWER than
    keep).  Only the integer modes pay for the per-vector dequant."""
    if mode in _INT_MODES:
        return Vs.astype(dt) * sc[:, None]
    return Vs


@linop_dataclass
class Gmres(IterativeSolverMixin, LinOp):
    A: Any
    preconditioner: Any
    criterion: Any
    krylov_dim: int = static_field(default=30)  # gmres.hpp default 100; 30 typical
    storage_precision: str = static_field(default="keep")
    axis_name: Any = static_field(default=None)

    @classmethod
    def create(cls, A, preconditioner, criterion, **params):
        return cls(A=A, preconditioner=preconditioner, criterion=criterion, **params)

    # -- single-RHS core -------------------------------------------------------

    def _solve_single(self, b, x0):
        """b, x0: (n,).  Left-preconditioned restarted GMRES."""
        A, M = self.A, self.preconditioner
        m = self.krylov_dim
        cap = extract_max_iters(self.criterion)
        ax = self.axis_name
        n = b.shape[0]
        dt = b.dtype
        mode = self.storage_precision
        sdtype = _storage_dtype(mode, dt)

        def pnorm(v):
            s = jnp.sum(jnp.abs(v) ** 2)
            if ax is not None:
                s = jax.lax.psum(s, ax)
            return jnp.sqrt(s.real)

        def pdot_mat(V, w):
            s = jnp.conj(V) @ w  # (m+1,)
            if ax is not None:
                s = jax.lax.psum(s, ax)
            return s

        r0 = b - A.apply(x0)
        b_norm = pnorm(b)
        r0_norm = pnorm(r0)
        baselines = {
            "num_cols": 1,
            "rhs_norm": b_norm[None],
            "initial_resnorm": r0_norm[None],
        }

        def crit_check(it, rnorm, rho):
            ctx = dict(baselines)
            ctx.update(
                iteration=it,
                residual_norm=rnorm[None],
                implicit_sq_residual_norm=jnp.abs(rho)[None],
            )
            return self.criterion.check_converged(ctx)[0]

        def cycle(x, it0, stopped0):
            """One restart cycle; returns (x_new, iters_done, stopped)."""
            r = b - A.apply(x)
            z = M.apply(r)
            beta = pnorm(z)
            v0 = jnp.where(beta > 0, z / jnp.where(beta > 0, beta, 1), z)
            Vs0 = jnp.zeros((m + 1, n), dtype=sdtype)
            sc0 = jnp.ones((m + 1,), dtype=dt)
            e0, s0 = _encode(v0, mode, sdtype)
            Vs0 = Vs0.at[0].set(e0)
            sc0 = sc0.at[0].set(s0)
            H = jnp.zeros((m + 1, m), dtype=dt)  # rotated Hessenberg (R factor)
            g = jnp.zeros((m + 1,), dtype=dt).at[0].set(beta.astype(dt))
            cs = jnp.zeros((m,), dtype=dt)
            sn = jnp.zeros((m,), dtype=dt)

            def arnoldi(j, carry):
                Vs, sc, H, g, cs, sn, it, stopped, steps = carry
                active = ~stopped & (it < cap)
                vj = _decode(Vs[j], sc[j], dt)
                w = M.apply(A.apply(vj))
                # CGS2 against rows 0..j (mask rows > j)
                rowmask = (jnp.arange(m + 1) <= j).astype(dt)
                Vd = _decode_basis(Vs, sc, mode, dt)
                h1 = pdot_mat(Vd, w) * rowmask
                w = w - Vd.T @ h1
                h2 = pdot_mat(Vd, w) * rowmask
                w = w - Vd.T @ h2
                h = h1 + h2
                hnext = pnorm(w).astype(dt)
                wnorm = jnp.where(hnext > 0, w / jnp.where(hnext > 0, hnext, 1), w)
                enc, s_enc = _encode(wnorm, mode, sdtype)
                # row-level masked update (NOT a whole-basis jnp.where — that
                # copies (m+1)·n values per step and kills VMEM residency)
                Vs = Vs.at[j + 1].set(jnp.where(active, enc, Vs[j + 1]))
                sc = sc.at[j + 1].set(jnp.where(active, s_enc, sc[j + 1]))
                # apply existing Givens rotations to h
                def rot(i, hv):
                    hi, hi1 = hv[i], hv[i + 1]
                    use = i < j
                    c, s = cs[i], sn[i]
                    new_i = jnp.where(use, c * hi + s * hi1, hi)
                    new_i1 = jnp.where(use, -jnp.conj(s) * hi + c * hi1, hi1)
                    return hv.at[i].set(new_i).at[i + 1].set(new_i1)

                h = jax.lax.fori_loop(0, m, rot, h.at[j + 1].set(hnext))
                # new rotation zeroing h[j+1]
                a_, b_ = h[j], h[j + 1]
                denom = jnp.sqrt(jnp.abs(a_) ** 2 + jnp.abs(b_) ** 2)
                c_new = jnp.where(denom > 0, jnp.abs(a_) / jnp.where(denom > 0, denom, 1), 1.0).astype(dt)
                phase = jnp.where(jnp.abs(a_) > 0, a_ / jnp.where(jnp.abs(a_) > 0, jnp.abs(a_), 1), 1.0)
                s_new = jnp.where(denom > 0, phase * jnp.conj(b_) / jnp.where(denom > 0, denom, 1), 0.0).astype(dt)
                h_rot = h.at[j].set(c_new * h[j] + s_new * h[j + 1]).at[j + 1].set(0)
                g_new = g.at[j + 1].set(-jnp.conj(s_new) * g[j]).at[j].set(c_new * g[j])
                H = jnp.where(active, H.at[:, j].set(h_rot), H)
                g = jnp.where(active, g_new, g)
                cs = jnp.where(active, cs.at[j].set(c_new), cs)
                sn = jnp.where(active, sn.at[j].set(s_new), sn)
                it = jnp.where(active, it + 1, it)
                steps = jnp.where(active, steps + 1, steps)
                rnorm_est = jnp.abs(g[j + 1])
                stopped = stopped | (active & crit_check(it, rnorm_est, rnorm_est**2))
                return (Vs, sc, H, g, cs, sn, it, stopped, steps)

            carry = (
                Vs0,
                sc0,
                H,
                g,
                cs,
                sn,
                it0,
                stopped0 | crit_check(it0, r0_cycle_norm := pnorm(r), r0_cycle_norm**2),
                jnp.asarray(0, jnp.int32),
            )
            Vs, sc, H, g, cs, sn, it, stopped, steps = jax.lax.fori_loop(
                0, m, arnoldi, carry
            )
            # solve R y = g on the first `steps` columns; pad diag with 1
            taken = jnp.arange(m) < steps
            R = H[:m, :] + jnp.diag(jnp.where(taken, 0, 1).astype(dt))
            gy = jnp.where(taken, g[:m], 0)
            y = jax.scipy.linalg.solve_triangular(R, gy, lower=False)
            Vd = _decode_basis(Vs, sc, mode, dt)
            dx = Vd[:m].T @ y
            x_new = x + dx
            return x_new, it, stopped

        def outer_cond(st):
            x, it, stopped, rn = st
            return (~stopped) & (it < cap)

        def outer_body(st):
            x, it, stopped, _ = st
            x, it, stopped = cycle(x, it, stopped)
            r_true = b - A.apply(x)
            rn = pnorm(r_true)
            # honest convergence: the in-cycle estimate |g[j+1]| is the
            # PRECONDITIONED residual norm and may under-report (badly
            # scaled M, reduced-precision basis drift in CB-GMRES); the
            # outer check re-evaluates the criterion on the TRUE residual
            # and can retract a premature in-cycle stop (triggering another
            # restart) instead of latching it.
            stopped = crit_check(it, rn, rn**2)
            return (x, it, stopped, rn)

        init = (
            x0,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            r0_norm,
        )
        x, it, stopped, rn = jax.lax.while_loop(outer_cond, outer_body, init)
        return x, it, stopped, rn

    def _solve_impl(self, b, x0):
        fast = self._try_vmem_fused(b, x0)
        if fast is not None:
            return fast
        solve1 = lambda bc, xc: self._solve_single(bc, xc)
        x, it, stopped, rn = jax.vmap(solve1, in_axes=1, out_axes=(1, 0, 0, 0))(
            b, x0
        )
        return x, SolveInfo(
            iterations=jnp.max(it),
            residual_norm=rn,
            converged=stopped,
            history=None,
        )

    def _fused_basis_dtype(self):
        """Basis storage dtype for the fused kernel, or None when the
        storage mode needs the generic path.  Float CB-GMRES modes map
        to bf16 VMEM storage with f32 arithmetic — exactly the
        _decode_basis float-mode semantics (unit scales, convert on
        read); integer modes (per-vector scales) stay generic."""
        mode = self.storage_precision
        if mode == "keep":
            return jnp.float32
        if mode in ("reduce1", "reduce2"):
            return jnp.bfloat16
        return None

    def _try_vmem_fused(self, b, x0):
        """Whole-solve-in-VMEM fast path (ops/pallas_gmres.py): the full
        restarted GMRES(m) — Arnoldi, CGS2, Givens QR, back-substitution,
        restarts — runs inside ONE Pallas kernel when A is a Dia whose
        diagonals and the (m+1)-vector Krylov basis fit in VMEM, the
        preconditioner is diagonal, there is a single f32 RHS, the basis
        storage is "keep", and the criterion is plain Iteration /
        ResidualNorm (gate: solver/_fused_gate.py).  Convergence
        semantics mirror the generic loop: in-cycle |g[j+1]| estimate,
        honest outer re-check on the TRUE residual.  Converged is
        reported under the fused-family convention (residual criteria
        only).  Returns (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_dia, tol_sq_eff
        from ..ops.pallas_gmres import gmres_vmem_fits, gmres_vmem_solve

        basis_dtype = self._fused_basis_dtype()
        if basis_dtype is None:
            return None
        m = int(self.krylov_dim)
        if b.shape[1] > 1:
            # 2-4 columns ride the k-RHS per-column-stopping kernel
            return self._try_vmem_fused_multi(b, x0)
        fast = self._try_vmem_fused_pell(b, x0)
        if fast is not None:
            return fast

        def fits(nd, R, itemsize, use_minv, halo_rows):
            return gmres_vmem_fits(
                nd, R, m, itemsize, use_minv=use_minv,
                halo_rows=halo_rows,
                basis_itemsize=jnp.dtype(basis_dtype).itemsize,
            )

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
        x2, it, rr, conv = gmres_vmem_solve(
            A.diags,
            A.offsets,
            frame(b, R),
            frame(x0, R),
            minv2,
            m=m,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            basis_dtype=basis_dtype,
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        rn = jnp.sqrt(rr)[None].astype(b.dtype)  # true residual, always
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        info = SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask,
            history=None,
        )
        return x, info

    def _try_vmem_fused_multi(self, b, x0):
        """k-RHS whole-solve GMRES(m) (ops/pallas_gmres.
        gmres_vmem_solve_multi): the reference's per-column
        givens_sin/cos/residual state and stopping_status masking
        (gmres.cpp:153-165) run in-kernel — columns share the Arnoldi
        step counter, each carries its own QR factors, converged columns
        freeze.  Dia operators, k <= 4 f32 columns.  Returns
        (x, SolveInfo) or None."""
        from ._fused_gate import (
            frame,
            frame_cols,
            prepare_fused_dia,
            tol_sq_eff_cols,
            unframe_cols,
        )
        from ..ops.pallas_gmres import (
            gmres_multi_vmem_fits,
            gmres_vmem_solve_multi,
        )

        basis_dtype = self._fused_basis_dtype()
        if basis_dtype is None:
            return None
        k = b.shape[1]
        if k > 4:
            return None
        m = int(self.krylov_dim)

        def fits(nd, R, itemsize, use_minv, halo_rows):
            return gmres_multi_vmem_fits(
                nd, R, m, k, itemsize, use_minv=use_minv,
                halo_rows=halo_rows,
                basis_itemsize=jnp.dtype(basis_dtype).itemsize,
            )

        ctx = prepare_fused_dia(self, b, fits, max_cols=4)
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
        x3, it, rr, conv = gmres_vmem_solve_multi(
            A.diags,
            A.offsets,
            frame_cols(b, R),
            frame_cols(x0, R),
            minv2,
            m=m,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            basis_dtype=basis_dtype,
            interpret=ctx["interpret"],
        )
        x = unframe_cols(x3, n)
        rn = jnp.sqrt(rr).astype(b.dtype)  # true residuals, always
        conv_mask = conv & ctx["has_res"]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask,
            history=None,
        )

    def _try_vmem_fused_pell(self, b, x0):
        """Whole-solve-in-VMEM GMRES for GENERAL unstructured operators
        (ops/pallas_gmres.pell_gmres_vmem_solve): Pell slots + the
        Krylov basis VMEM-resident, scalar maps in SMEM.  Returns
        (x, SolveInfo) or None."""
        from ._fused_gate import frame, prepare_fused_pell, tol_sq_eff
        from ..ops.pallas_gmres import (
            pell_gmres_vmem_fits, pell_gmres_vmem_solve,
        )

        basis_dtype = self._fused_basis_dtype()
        if basis_dtype is None:
            return None
        m = int(self.krylov_dim)

        def fits(n_slots, NT, val_itemsize, q_itemsize, n_steps, use_minv):
            return pell_gmres_vmem_fits(
                n_slots, NT, m, val_itemsize, q_itemsize=q_itemsize,
                n_steps=n_steps, use_minv=use_minv,
                basis_itemsize=jnp.dtype(basis_dtype).itemsize,
            )

        ctx = prepare_fused_pell(self, b, fits)
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
        x2, it, rr, conv = pell_gmres_vmem_solve(
            A,
            frame(b, Rf),
            frame(x0, Rf),
            minv2,
            m=m,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            basis_dtype=basis_dtype,
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        rn = jnp.sqrt(rr)[None].astype(b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        info = SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask,
            history=None,
        )
        return x, info


@linop_dataclass
class CbGmres(IterativeSolverMixin, LinOp):
    """CB-GMRES: GMRES with a reduced-precision basis accessor
    (cb_gmres.hpp:88-95).  storage_precision in {auto, keep, reduce1,
    reduce2, integer, ireduce1, ireduce2}.

    "auto" (the default) resolves per problem size from the measured
    on-chip crossover (benchmark/results/cb_gmres_crossover_r4.jsonl,
    v5e): below ~0.5M rows the full-precision basis stays VMEM-fused
    and wins (47.6 vs 52.3 us/iter at 262k); at >= 2**19 rows the basis
    spills to HBM-streaming and the compressed reduce1 basis wins on
    bandwidth (172 vs 1229 us/iter at 1M, 2422 vs 4352 at 4.19M)."""

    A: Any
    preconditioner: Any
    criterion: Any
    krylov_dim: int = static_field(default=30)
    storage_precision: str = static_field(default="auto")
    axis_name: Any = static_field(default=None)

    #: measured v5e crossover: compression pays once the basis no longer
    #: fits the fused kernel's VMEM budget (~0.5M rows at m=30, f32)
    _AUTO_REDUCE_ROWS = 1 << 19

    @classmethod
    def create(cls, A, preconditioner, criterion, **params):
        return cls(A=A, preconditioner=preconditioner, criterion=criterion, **params)

    def _resolved_mode(self) -> str:
        if self.storage_precision != "auto":
            return self.storage_precision
        return (
            "keep" if self.shape[0] < self._AUTO_REDUCE_ROWS else "reduce1"
        )

    def _solve_impl(self, b, x0):
        inner = Gmres(
            A=self.A,
            preconditioner=self.preconditioner,
            criterion=self.criterion,
            krylov_dim=self.krylov_dim,
            storage_precision=self._resolved_mode(),
            axis_name=self.axis_name,
        )
        return inner._solve_impl(b, x0)

"""IDR(s) — induced dimension reduction.

Reference: core/solver/idr.cpp (406; `subspace_dim` idr.hpp:109,
`deterministic` option, `complex_subspace`).  Implements the biorthogonal
IDR(s) variant the reference uses.  The shadow space P is generated from a
fixed PRNG key and orthonormalized at generate time, so runs are always
deterministic (the reference's `deterministic=true` behavior; its
nondeterminism came from curand, which has no analog here).

The inner s-step loop is unrolled (s is a static factory parameter, typically
2-8), giving XLA a straight-line body inside the outer `lax.while_loop`.
Multi-RHS via vmap like GMRES.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field
from .solver_base import IterativeSolverMixin, SolveInfo, extract_max_iters


@linop_dataclass
class Idr(IterativeSolverMixin, LinOp):
    A: Any
    preconditioner: Any
    criterion: Any
    P: Any = None  # (s, n) orthonormal shadow space
    subspace_dim: int = static_field(default=2)
    kappa: float = static_field(default=0.7)  # omega safeguard (idr.hpp kappa)
    deterministic: bool = static_field(default=True)
    axis_name: Any = static_field(default=None)

    @classmethod
    def create(
        cls,
        A,
        preconditioner,
        criterion,
        subspace_dim=2,
        kappa=0.7,
        deterministic=True,
        seed=42,
        **params,
    ):
        n = A.shape[0]
        s = int(subspace_dim)
        rng = np.random.default_rng(seed)
        if np.issubdtype(np.dtype(A.dtype), np.complexfloating):
            # complex shadow space for complex problems (the reference's
            # complex_subspace behavior, idr.hpp)
            P = rng.standard_normal((s, n)) + 1j * rng.standard_normal((s, n))
        else:
            P = rng.standard_normal((s, n))
        # orthonormalize rows (host QR at generate time)
        q, _ = np.linalg.qr(P.T)
        P = jnp.asarray(q.T[:s], dtype=np.dtype(A.dtype))
        return cls(
            A=A,
            preconditioner=preconditioner,
            criterion=criterion,
            P=P,
            subspace_dim=s,
            kappa=kappa,
            deterministic=deterministic,
            **params,
        )

    def _pnorm(self, v):
        s = jnp.sum(jnp.abs(v) ** 2)
        if self.axis_name is not None:
            s = jax.lax.psum(s, self.axis_name)
        return jnp.sqrt(s.real)

    def _pdot(self, a, b):
        s = jnp.sum(jnp.conj(a) * b)
        if self.axis_name is not None:
            s = jax.lax.psum(s, self.axis_name)
        return s

    def _solve_single(self, b, x0):
        A, M, P = self.A, self.preconditioner, self.P
        s = self.subspace_dim
        cap = extract_max_iters(self.criterion)
        dt = b.dtype
        n = b.shape[0]

        def pdotP(v):  # (s,) projections  P conj @ v
            out = jnp.conj(P) @ v
            if self.axis_name is not None:
                out = jax.lax.psum(out, self.axis_name)
            return out

        r0 = b - A.apply(x0)
        b_norm = self._pnorm(b)
        r0_norm = self._pnorm(r0)
        baselines = {
            "num_cols": 1,
            "rhs_norm": b_norm[None],
            "initial_resnorm": r0_norm[None],
        }

        def crit_check(it, rnorm):
            ctx = dict(baselines)
            ctx.update(
                iteration=it,
                residual_norm=rnorm[None],
                implicit_sq_residual_norm=(rnorm**2)[None],
            )
            return self.criterion.check_converged(ctx)[0]

        def safe(x, d):
            ok = jnp.abs(d) > 0
            return jnp.where(ok, x / jnp.where(ok, d, 1), 0)

        def body(st):
            x, r, G, U, Mm, om, it, stopped = st
            f = pdotP(r)
            for kk in range(s):  # unrolled: s is static
                # c = solve lower-right block Mm[kk:, kk:] c = f[kk:]
                Msub = Mm[kk:, kk:] + jnp.eye(s - kk, dtype=dt) * 0
                csol = jax.scipy.linalg.solve_triangular(
                    Msub, f[kk:], lower=True
                )
                c = jnp.zeros((s,), dt).at[kk:].set(csol)
                v = r - c @ G  # (n,)
                v = M.apply(v)
                u_new = om * v + c @ U
                g_new = A.apply(u_new)
                # biorthogonalize against P[0..kk-1]
                for i in range(kk):
                    alpha = safe(self._pdot(P[i], g_new), Mm[i, i])
                    g_new = g_new - alpha * G[i]
                    u_new = u_new - alpha * U[i]
                mcol = pdotP(g_new)  # (s,)
                Mm = Mm.at[:, kk].set(
                    jnp.where(jnp.arange(s) >= kk, mcol, Mm[:, kk])
                )
                beta = jnp.where(stopped, 0, safe(f[kk], Mm[kk, kk]))
                r = r - beta * g_new
                x = x + beta * u_new
                f = f - beta * Mm[:, kk]
                f = f.at[kk].set(0)
                G = G.at[kk].set(g_new)
                U = U.at[kk].set(u_new)
            # dimension-reduction step: r in new space
            v = M.apply(r)
            t = A.apply(v)
            tt = self._pdot(t, t)
            tr = self._pdot(t, r)
            om_raw = safe(tr, tt)
            # kappa safeguard (idr omega computation)
            rho = jnp.abs(safe(tr, jnp.sqrt(tt.real) * self._pnorm(r)))
            om_new = jnp.where(
                rho < self.kappa, om_raw * safe(self.kappa, rho), om_raw
            )
            om_new = jnp.where(stopped, om, om_new)
            beta_om = jnp.where(stopped, 0, om_new)
            x = x + beta_om * v
            # residual replacement: the IDR(s) recurrence for r drifts from
            # b - A x within a few outer iterations in f32 (the squared-ish
            # update polynomials), which made the solver REPORT convergence
            # at 1e-6 while the true residual sat at 1e-3.  Recomputing r
            # once per outer iteration (1 extra SpMV per s+1) keeps the
            # criterion honest and stabilizes the recurrence.
            r = b - A.apply(x)
            it = it + 1
            rn = self._pnorm(r)
            stopped = stopped | crit_check(it, rn)
            return (x, r, G, U, Mm, om_new, it, stopped)

        def cond(st):
            return (st[6] < cap) & ~st[7]

        init = (
            x0,
            r0,
            jnp.zeros((s, n), dt),
            jnp.zeros((s, n), dt),
            jnp.eye(s, dtype=dt),
            jnp.ones((), dt),
            jnp.asarray(0, jnp.int32),
            crit_check(0, r0_norm),
        )
        x, r, G, U, Mm, om, it, stopped = jax.lax.while_loop(cond, body, init)
        return x, it, stopped, self._pnorm(r)

    def _try_vmem_fused(self, b, x0):
        """Whole-solve-in-VMEM IDR(s) (ops/pallas_idr.py), same gate as
        the fused CG family (solver/_fused_gate.py): Dia operator,
        diagonal (Identity/Diagonal/scalar-Jacobi) preconditioner applied
        chunk-wise in-kernel, s <= MAX_FUSED_IDR_S so the small M system
        stays register-resident.  Returns (x, SolveInfo) or None."""
        from ._fused_gate import (
            frame,
            frame_cols,
            prepare_fused_dia,
            tol_sq_eff,
        )
        from ..ops.pallas_idr import (
            MAX_FUSED_IDR_S,
            idr_vmem_fits,
            idr_vmem_solve,
        )

        s = self.subspace_dim
        if s > MAX_FUSED_IDR_S or self.P is None:
            return None

        def fits(nd, R, itemsize, use_minv, halo_rows):
            return idr_vmem_fits(
                nd, R, s, itemsize, use_minv=use_minv, halo_rows=halo_rows
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
        P3 = frame_cols(self.P.T.astype(jnp.float32), R)  # (s, R, 128)
        x2, it, mon, conv = idr_vmem_solve(
            A.diags,
            A.offsets,
            P3,
            frame(r0, R),
            frame(x0, R),
            frame(b, R),
            minv2,
            s=s,
            kappa=self.kappa,
            tol_sq_eff=tol_sq,
            max_iters=ctx["cap"],
            interpret=ctx["interpret"],
        )
        x = x2.reshape(-1, 1)[:n]
        # the IDR stop monitor is the true (replaced) residual in both
        # exact and implicit modes — mirror the generic loop's finite
        # residual_norm report
        rn = jnp.sqrt(mon)[None].astype(b.dtype)
        conv_mask = jnp.asarray(conv & ctx["has_res"])[None]
        return x, SolveInfo(
            iterations=it, residual_norm=rn, converged=conv_mask, history=None
        )

    def _solve_impl(self, b, x0):
        if b.shape[1] == 1:
            fast = self._try_vmem_fused(b, x0)
            if fast is not None:
                return fast
        x, it, stopped, rn = jax.vmap(
            self._solve_single, in_axes=1, out_axes=(1, 0, 0, 0)
        )(b, x0)
        return x, SolveInfo(
            iterations=jnp.max(it),
            residual_norm=rn,
            converged=stopped,
            history=None,
        )

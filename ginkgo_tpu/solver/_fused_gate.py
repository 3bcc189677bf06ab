"""Shared gate for whole-solve fused Pallas solver paths (CG, BiCGSTAB).

Decides — statically, at trace time — whether a solve can route to a
single-kernel VMEM-resident implementation: Dia operator, diagonal
(Identity/Diagonal/scalar-Jacobi) preconditioner, single f32 RHS, plain
Iteration/ResidualNorm criteria, state fits the VMEM budget.  The env
flags consulted here are part of the jit cache key
(solver_base._env_trace_key)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

LANES = 128


def _flags_allow_fused():
    """Env/backend gate shared by every fused path.  All flags consulted
    here are in solver_base._env_trace_key.  Returns None or dict with
    interpret."""
    if os.environ.get("GINKGO_TPU_NO_PALLAS"):
        return None
    force = bool(os.environ.get("GINKGO_TPU_FORCE_VMEM_CG"))
    on_tpu = jax.default_backend() == "tpu"
    if os.environ.get("GINKGO_TPU_NO_FUSED_CG") and not force:
        return None
    if not (force or on_tpu):
        return None
    return {"interpret": not on_tpu}


def _common_checks(solver, b, max_cols=1):
    """Preconditioner-independent checks shared by every fused path:
    f32 RHS with at most max_cols columns (1 for the single-RHS kernels;
    the k-RHS CG kernel passes 8), no SPMD axis / history tracking, env
    flags, plain Iteration/ResidualNorm criterion.  Returns None or a
    partial ctx (no preconditioner fields)."""
    from ..stop.criterion import analyze_simple_residual
    from .solver_base import extract_max_iters

    if solver.axis_name is not None or getattr(solver, "track_history", False):
        return None
    if not (1 <= b.shape[1] <= max_cols) or b.dtype != jnp.float32:
        return None
    flags = _flags_allow_fused()
    if flags is None:
        return None
    simple = analyze_simple_residual(solver.criterion)
    if simple is None:
        return None
    tol, baseline, implicit, has_res = simple
    return {
        "A": solver.A,
        "tol": tol,
        "baseline": baseline,
        "implicit": implicit,
        "has_res": has_res,
        "cap": extract_max_iters(solver.criterion),
        "interpret": flags["interpret"],
    }


def _prepare_fused_common(solver, b, max_cols=1):
    """Operator-independent checks shared by the Dia and Pell fused
    paths: _common_checks + diagonal (Identity/Diagonal/scalar-Jacobi)
    preconditioner.  Returns None or a partial ctx."""
    from ..matrix.diagonal import Diagonal, Identity
    from ..preconditioner.jacobi import Jacobi

    ctx = _common_checks(solver, b, max_cols=max_cols)
    if ctx is None:
        return None
    M = solver.preconditioner
    if isinstance(M, Identity):
        minv_flat = None
    elif isinstance(M, Diagonal):
        minv_flat = M.values
    elif isinstance(M, Jacobi) and M.inv_diag is not None:
        minv_flat = M.inv_diag
    else:
        return None
    ctx["minv_flat"] = minv_flat
    return ctx


def prepare_fused_dia(solver, b, fits_fn, max_cols=1):
    """Return None (fall back to the generic loop) or a dict with
    everything a fused kernel needs: A, frames for r0/x0 conversion,
    minv2, tol_sq, cap, implicit/has_res flags, interpret."""
    from ..matrix.dia import Dia
    from ..ops.pallas_dia import _plan

    A = solver.A
    if not isinstance(A, Dia) or A.shape[0] != A.shape[1]:
        return None
    nd, R, _ = A.diags.shape
    if nd == 0 or A.diags.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    ctx = _prepare_fused_common(solver, b, max_cols=max_cols)
    if ctx is None:
        return None
    _, _, _, pad_lo, pad_hi = _plan(A.offsets, R)
    if not fits_fn(
        nd, R, A.diags.dtype.itemsize,
        use_minv=ctx["minv_flat"] is not None, halo_rows=pad_lo + pad_hi,
    ):
        return None
    ctx.update(nd=nd, R=R)
    return ctx


def prepare_fused_pell(solver, b, fits_fn=None):
    """Gate for the fused general-sparse solvers on Pell operators
    (ops/pallas_pell_cg.py, ops/pallas_gmres.py): slot arrays + Krylov
    vectors fit VMEM, scalar maps fit SMEM.  fits_fn(n_slots, NT,
    val_itemsize, q_itemsize, n_steps, use_minv) overrides the default
    CG working-set check (GMRES adds basis frames)."""
    from ..matrix.pell import Pell
    from ..ops.pallas_pell_cg import pell_cg_vmem_fits

    A = solver.A
    if not isinstance(A, Pell) or A.shape[0] != A.shape[1]:
        return None
    if A.values.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    if A.values.shape[0] == 0 or A.values.shape[1] != 8:
        return None  # fused kernels implement the S=8 tile layout
    ctx = _prepare_fused_common(solver, b)
    if ctx is None:
        return None
    fits = fits_fn if fits_fn is not None else pell_cg_vmem_fits
    if not fits(
        A.values.shape[0], A.NT, A.values.dtype.itemsize,
        q_itemsize=A.qidx.dtype.itemsize,
        n_steps=A.n_steps,
        use_minv=ctx["minv_flat"] is not None,
    ):
        return None
    ctx.update(Rf=A.NT * 8)
    return ctx


_MAX_FUSED_TRI_SWEEPS = 8


def prepare_fused_dia_ilu(solver, b, fits_fn=None):
    """Gate for the ILU/IC-preconditioned fused CG
    (ops/pallas_cg_ilu.py): Dia operator + IluPreconditioner whose two
    TriangularSolvers use the 'sweeps' algorithm with small static
    sweep counts and Dia strict triangles (banded factors of banded
    operators — the choose_format path in solver/triangular._build).
    Returns None or a ctx with A / l_solver / u_solver / Rf."""
    from ..matrix.dia import Dia
    from ..ops.pallas_dia import _plan
    from ..ops.pallas_cg_ilu import cg_ilu_vmem_fits
    from ..preconditioner.ilu import IluPreconditioner
    from ..solver.triangular import TriangularSolver

    A = solver.A
    if not isinstance(A, Dia) or A.shape[0] != A.shape[1]:
        return None
    nd, R, _ = A.diags.shape
    if nd == 0 or A.diags.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    M = solver.preconditioner
    if not isinstance(M, IluPreconditioner) or M.reverse_apply:
        return None
    lt, ut = M.l_solver, M.u_solver
    for t in (lt, ut):
        if not isinstance(t, TriangularSolver):
            return None
        if t.algorithm != "sweeps" or not isinstance(t.off_csr, Dia):
            return None
        if not (0 <= t.sweeps <= _MAX_FUSED_TRI_SWEEPS):
            return None
        if t.off_csr.diags.shape[1] != R:
            return None
        if t.off_csr.diags.dtype not in (jnp.float32, jnp.bfloat16):
            return None
    ctx = _common_checks(solver, b)
    if ctx is None:
        return None
    halo = 0
    for op in (A, lt.off_csr, ut.off_csr):
        _, _, _, lo, hi = _plan(op.offsets, R)
        halo = max(halo, lo + hi)
    nd_l = lt.off_csr.diags.shape[0]
    nd_u = ut.off_csr.diags.shape[0]
    fits = fits_fn if fits_fn is not None else cg_ilu_vmem_fits
    lu_itemsize = max(
        lt.off_csr.diags.dtype.itemsize, ut.off_csr.diags.dtype.itemsize
    )
    if not fits(nd, nd_l, nd_u, R,
                a_itemsize=A.diags.dtype.itemsize,
                lu_itemsize=lu_itemsize, halo_rows=halo):
        return None
    ctx.update(l_solver=lt, u_solver=ut, R=R)
    return ctx


def smoother_fused_ready(A, arr):
    """Gate for the fused fixed-count smoother (ops/pallas_ir.py): Dia
    operator, single f32 RHS, Pallas enabled, VMEM fits.  Consults only
    env flags already in solver_base._env_trace_key.  Returns None or a
    dict with R/interpret."""
    from ..matrix.dia import Dia
    from ..ops.pallas_dia import _plan
    from ..ops.pallas_ir import ir_vmem_fits

    if arr.ndim != 2 or arr.shape[1] != 1 or arr.dtype != jnp.float32:
        return None
    if not isinstance(A, Dia) or A.shape[0] != A.shape[1]:
        return None
    if os.environ.get("GINKGO_TPU_NO_PALLAS"):
        return None
    force = bool(os.environ.get("GINKGO_TPU_FORCE_VMEM_CG"))
    on_tpu = jax.default_backend() == "tpu"
    if os.environ.get("GINKGO_TPU_NO_FUSED_CG") and not force:
        return None
    if not (force or on_tpu):
        return None
    nd, R, _ = A.diags.shape
    if nd == 0 or A.diags.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    _, _, _, pad_lo, pad_hi = _plan(A.offsets, R)
    if not ir_vmem_fits(nd, R, A.diags.dtype.itemsize, use_minv=True,
                        halo_rows=pad_lo + pad_hi):
        return None
    return {"R": R, "interpret": not on_tpu}


def frame(v, R):
    """(n, 1) column -> zero-padded (R, 128) frame."""
    F = R * LANES
    pad = F - v.shape[0]
    vp = jnp.pad(v, ((0, pad), (0, 0))) if pad > 0 else v[:F]
    return vp.reshape(R, LANES)


def frame_cols(v, R):
    """(n, k) multivector -> zero-padded (k, R, 128) per-column frames."""
    F = R * LANES
    pad = F - v.shape[0]
    vp = jnp.pad(v, ((0, pad), (0, 0))) if pad > 0 else v[:F]
    return vp.T.reshape(v.shape[1], R, LANES)


def unframe_cols(x3, n):
    """(k, R, 128) frames -> (n, k) multivector."""
    k = x3.shape[0]
    return x3.reshape(k, -1)[:, :n].T


def tol_sq_eff(ctx, b, r0):
    """Squared absolute stop threshold from the criterion decomposition."""
    from .solver_base import norm2

    if not ctx["has_res"]:
        return jnp.asarray(-1.0, jnp.float32)
    if ctx["baseline"] == "absolute":
        base = jnp.asarray(1.0, jnp.float32)
    elif ctx["baseline"] == "initial_resnorm":
        base = norm2(r0)[0].astype(jnp.float32)
    else:
        base = norm2(b)[0].astype(jnp.float32)
    return (jnp.float32(ctx["tol"]) * base) ** 2


def tol_sq_eff_cols(ctx, b, r0):
    """(k,) per-column squared absolute stop thresholds (the per-column
    baselines the reference's ResidualNorm criterion computes,
    residual_norm.hpp:65,137)."""
    from .solver_base import norm2

    k = b.shape[1]
    if not ctx["has_res"]:
        return jnp.full((k,), -1.0, jnp.float32)
    if ctx["baseline"] == "absolute":
        base = jnp.ones((k,), jnp.float32)
    elif ctx["baseline"] == "initial_resnorm":
        base = norm2(r0).astype(jnp.float32)
    else:
        base = norm2(b).astype(jnp.float32)
    return (jnp.float32(ctx["tol"]) * base) ** 2

"""Whole-solve fused CG with in-kernel ILU/IC preconditioning.

The fused CG family (ops/pallas_cg.py) requires a DIAGONAL
preconditioner; production Ginkgo workloads overwhelmingly run CG with
incomplete-factorization preconditioners (ilu.hpp:114, ic.hpp:107) whose
apply is two triangular solves.  The TPU-native triangular solve for
banded factors is the Jacobi-Richardson sweep (solver/triangular.py
'sweeps': x^{m+1} = D^{-1}(b - (T - D) x^m) — Chow & Patel's iterative
triangular solve), and each sweep is a banded SpMV — exactly the
gather-free shift SpMV the fused CG kernel already performs for A.  So
the whole ILU-preconditioned solve fuses: per iteration, one A-SpMV +
(sweeps_l + sweeps_u) triangle-SpMVs + the CG vector work, ALL from
VMEM with zero HBM traffic and no dispatch round-trips.

Gate (solver/_fused_gate.prepare_fused_dia_ilu): A is Dia; M is an
IluPreconditioner whose two TriangularSolvers use the 'sweeps'
algorithm with small static sweep counts and whose strict triangles
choose_format-ed to Dia (banded factors of banded operators do).

Parity: matches the generic CG + IluPreconditioner(sweeps) composition
to f32 round-off (tests/test_pallas_cg_ilu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

from .pallas_dia import _plan
from .pallas_cg import LANES, _chunk_rows, _spmv_chunk, cg_vmem_budget_bytes
from .pallas_bicgstab import _sdiv


def cg_ilu_vmem_fits(nd_a: int, nd_l: int, nd_u: int, R: int,
                     a_itemsize: int = 4, lu_itemsize: int = 4,
                     halo_rows: int = 0) -> bool:
    """Working set: A + L + U diagonal frames (at their own storage
    widths), x/r/z/q vector frames, the halo-padded p frame, the shared
    trisolve staging frame, and the two inverse-diagonal frames."""
    frame = R * LANES * 4
    vec_frames = 8.25 + 2 * halo_rows / max(R, 1)
    diag_bytes = (nd_a * a_itemsize + (nd_l + nd_u) * lu_itemsize) * (
        R * LANES
    )
    return diag_bytes + vec_frames * frame <= cg_vmem_budget_bytes()


def _tri_sweeps(rhs_read, diags, invd, qs, sweeps, out_s, w_s, w_lo, C,
                n_chunks):
    """out = approx T^{-1} rhs via Jacobi-Richardson sweeps.

    rhs_read(c0) yields the (C,128) rhs chunk; out_s holds the iterate;
    w_s stages the previous iterate for the banded SpMV (frame row 0 at
    buffer row w_lo; halo rows zeroed by the caller).  x0 = D^{-1} rhs,
    then `sweeps` corrections (triangular.py _solve_sweeps semantics,
    diag folded as inverse)."""

    def init_chunk(c, _):
        c0 = c * C
        out_s[pl.ds(c0, C), :] = (
            rhs_read(c0) * invd[pl.ds(c0, C), :].astype(jnp.float32)
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, init_chunk, 0)

    def sweep(s, _):
        def stage_chunk(c, _):
            c0 = c * C
            w_s[pl.ds(w_lo + c0, C), :] = out_s[pl.ds(c0, C), :]
            return 0

        jax.lax.fori_loop(0, n_chunks, stage_chunk, 0)

        def upd_chunk(c, _):
            c0 = c * C
            tv = _spmv_chunk(diags, w_s, c0, C, qs=qs, pad_lo=w_lo)
            out_s[pl.ds(c0, C), :] = (
                (rhs_read(c0) - tv)
                * invd[pl.ds(c0, C), :].astype(jnp.float32)
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, upd_chunk, 0)
        return 0

    jax.lax.fori_loop(0, sweeps, sweep, 0)


def _cg_ilu_kernel(scal, iscal, a_diags, l_diags, u_diags, invdl, invdu,
                   r0_hbm, x0_hbm, x_hbm, r_hbm, stats, x_s, r_s, z_s,
                   q_s, p_s, w_s, sems, *, qs_a, pad_a, qs_l, pad_l,
                   qs_u, pad_u, R, sweeps_l, sweeps_u, use_implicit):
    """pad_* = (pad_lo, pad_hi) per operator; w_s is the shared trisolve
    staging buffer sized for max(pad_l, pad_u); p_s is halo-padded for A.
    stats out: [iterations, monitored_sq, converged]."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    C = _chunk_rows(R)
    n_chunks = R // C
    pa_lo, pa_hi = pad_a
    plo_l, phi_l = pad_l
    plo_u, phi_u = pad_u
    w_lo = max(plo_l, plo_u)
    w_hi = max(phi_l, phi_u)
    Rw = R + w_lo + w_hi
    Rp = R + pa_lo + pa_hi

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    if pa_lo:
        p_s[0:pa_lo] = jnp.zeros((pa_lo, LANES), jnp.float32)
    if pa_hi:
        p_s[Rp - pa_hi:Rp] = jnp.zeros((pa_hi, LANES), jnp.float32)
    if w_lo:
        w_s[0:w_lo] = jnp.zeros((w_lo, LANES), jnp.float32)
    if w_hi:
        w_s[Rw - w_hi:Rw] = jnp.zeros((w_hi, LANES), jnp.float32)

    def precondition():
        """z_s = U^{-1} L^{-1} r_s (q_s holds the intermediate y)."""
        _tri_sweeps(
            lambda c0: r_s[pl.ds(c0, C), :], l_diags, invdl, qs_l,
            sweeps_l, q_s, w_s, w_lo, C, n_chunks,
        )
        _tri_sweeps(
            lambda c0: q_s[pl.ds(c0, C), :], u_diags, invdu, qs_u,
            sweeps_u, z_s, w_s, w_lo, C, n_chunks,
        )

    # ---- init: z = M r0; p = z; rho = r.z; rr = r.r -------------------
    precondition()

    def init_chunk(c, carry):
        rho, rr = carry
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        z_c = z_s[pl.ds(c0, C), :]
        p_s[pl.ds(pa_lo + c0, C), :] = z_c
        return (rho + jnp.sum(r_c * z_c), rr + jnp.sum(r_c * r_c))

    rho0, rr0 = jax.lax.fori_loop(
        0, n_chunks, init_chunk, (jnp.float32(0), jnp.float32(0))
    )

    def cond(st):
        it, rho, rr, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho, rr, _ = st

        # pass 1: q = A p, pq
        def spmv_chunk_fn(c, pq):
            c0 = c * C
            q_c = _spmv_chunk(a_diags, p_s, c0, C, qs=qs_a, pad_lo=pa_lo)
            q_s[pl.ds(c0, C), :] = q_c
            p_c = p_s[pl.ds(pa_lo + c0, C), :]
            return pq + jnp.sum(p_c * q_c)

        pq = jax.lax.fori_loop(0, n_chunks, spmv_chunk_fn, jnp.float32(0))
        alpha = jnp.where(pq != 0, rho / jnp.where(pq != 0, pq, 1.0), 0.0)

        # pass 2: x += alpha p, r -= alpha q, rr_new
        def update_chunk(c, rr_n):
            c0 = c * C
            p_c = p_s[pl.ds(pa_lo + c0, C), :]
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + alpha * p_c
            r_c = r_s[pl.ds(c0, C), :] - alpha * q_s[pl.ds(c0, C), :]
            r_s[pl.ds(c0, C), :] = r_c
            return rr_n + jnp.sum(r_c * r_c)

        rr_new = jax.lax.fori_loop(0, n_chunks, update_chunk,
                                   jnp.float32(0))

        # z = M r (q_s free after pass 2 — reused as trisolve scratch)
        precondition()

        def rho_chunk(c, acc):
            c0 = c * C
            return acc + jnp.sum(
                r_s[pl.ds(c0, C), :] * z_s[pl.ds(c0, C), :]
            )

        rho_new = jax.lax.fori_loop(0, n_chunks, rho_chunk,
                                    jnp.float32(0))
        beta = jnp.where(rho != 0, rho_new / jnp.where(rho != 0, rho, 1.0),
                         0.0)

        def pdir_chunk(c, _):
            c0 = c * C
            p_s[pl.ds(pa_lo + c0, C), :] = (
                z_s[pl.ds(c0, C), :]
                + beta * p_s[pl.ds(pa_lo + c0, C), :]
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, pdir_chunk, 0)
        stop_mon = jnp.abs(rho) if use_implicit else rr_new
        return (it + 1, rho_new, rr_new, stop_mon)

    it, rho, rr, stop_mon = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), rho0, rr0, jnp.float32(jnp.inf)),
    )

    cp_xo = pltpu.make_async_copy(x_s, x_hbm, sems.at[0])
    cp_ro = pltpu.make_async_copy(r_s, r_hbm, sems.at[1])
    cp_xo.start()
    cp_ro.start()
    cp_xo.wait()
    cp_ro.wait()
    stats[0] = it.astype(jnp.float32)
    stats[1] = stop_mon
    stats[2] = (stop_mon <= tol_sq).astype(jnp.float32)


@logged_kernel
def cg_ilu_vmem_solve(A_dia, Tl_dia, Tu_dia, invdl2, invdu2, r0_2, x0_2,
                      *, sweeps_l, sweeps_u, tol_sq_eff, max_iters,
                      use_implicit=False, interpret=False):
    """Run ILU-preconditioned CG to convergence in one Pallas kernel.

    A_dia / Tl_dia / Tu_dia: matrix.dia.Dia operators (A, strict lower
    triangle of L, strict upper triangle of U); invdl2/invdu2: (R, 128)
    inverse-diagonal frames of the factors; r0_2/x0_2: (R, 128) f32
    frames.  Returns (x2, iterations, monitored_sq, converged)."""
    a_diags = A_dia.diags
    nd, R, lanes = a_diags.shape
    assert lanes == LANES
    qs_a, _, _, pa_lo, pa_hi = _plan(A_dia.offsets, R)
    qs_l, _, _, pl_lo, pl_hi = _plan(Tl_dia.offsets, R)
    qs_u, _, _, pu_lo, pu_hi = _plan(Tu_dia.offsets, R)
    kernel = functools.partial(
        _cg_ilu_kernel, qs_a=qs_a, pad_a=(pa_lo, pa_hi), qs_l=qs_l,
        pad_l=(pl_lo, pl_hi), qs_u=qs_u, pad_u=(pu_lo, pu_hi), R=R,
        sweeps_l=int(sweeps_l), sweeps_u=int(sweeps_u),
        use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, a_diags, Tl_dia.diags, Tu_dia.diags, invdl2,
            invdu2, r0_2, x0_2]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    Rp = R + pa_lo + pa_hi
    Rw = R + max(pl_lo, pu_lo) + max(pl_hi, pu_hi)
    x2, _r2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((R, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.float32),   # x
            pltpu.VMEM((R, LANES), jnp.float32),   # r
            pltpu.VMEM((R, LANES), jnp.float32),   # z
            pltpu.VMEM((R, LANES), jnp.float32),   # q / trisolve y
            pltpu.VMEM((Rp, LANES), jnp.float32),  # p (A-halo-padded)
            pltpu.VMEM((Rw, LANES), jnp.float32),  # trisolve staging
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nd + 8) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 6) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


# -- fused ILU-preconditioned BiCGSTAB ----------------------------------------


def bicgstab_ilu_vmem_fits(nd_a: int, nd_l: int, nd_u: int, R: int,
                           a_itemsize: int = 4, lu_itemsize: int = 4,
                           halo_rows: int = 0) -> bool:
    """x, r, rr, p, v, t, s, u1 frames (8) + the shared staging frame +
    the two inverse-diagonal frames + A/L/U diagonal frames at their own
    storage widths."""
    frame = R * LANES * 4
    vec_frames = 11.25 + halo_rows / max(R, 1)
    diag_bytes = (nd_a * a_itemsize + (nd_l + nd_u) * lu_itemsize) * (
        R * LANES
    )
    return diag_bytes + vec_frames * frame <= cg_vmem_budget_bytes()


def _bicgstab_ilu_kernel(scal, iscal, a_diags, l_diags, u_diags, invdl,
                         invdu, r0_hbm, x0_hbm, x_hbm, r_hbm, stats, x_s,
                         r_s, rr_s, p_s, v_s, t_s, s_s, u1_s, w_s, sems,
                         *, qs_a, qs_l, qs_u, pads, R, sweeps_l,
                         sweeps_u, use_implicit):
    """Right-preconditioned BiCGSTAB (solver/bicgstab.py semantics:
    y = M p, v = A y, half-step check on s, z = M s, t = A z,
    x += alpha y + omega z) with M = ILU sweep trisolves, all in-kernel.
    All frames unpadded; SpMV sources stage through the shared w_s at
    offset w_lo (pads = (w_lo, w_hi) covering A, L and U halos)."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    C = _chunk_rows(R)
    n_chunks = R // C
    w_lo, w_hi = pads
    Rw = R + w_lo + w_hi

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    if w_lo:
        w_s[0:w_lo] = jnp.zeros((w_lo, LANES), jnp.float32)
    if w_hi:
        w_s[Rw - w_hi:Rw] = jnp.zeros((w_hi, LANES), jnp.float32)

    def stage(src_s):
        def cp(c, _):
            c0 = c * C
            w_s[pl.ds(w_lo + c0, C), :] = src_s[pl.ds(c0, C), :]
            return 0

        jax.lax.fori_loop(0, n_chunks, cp, 0)

    def m_apply(rhs_s, out_s):
        """out = U^{-1} L^{-1} rhs (t_s holds the L intermediate)."""
        _tri_sweeps(
            lambda c0: rhs_s[pl.ds(c0, C), :], l_diags, invdl, qs_l,
            sweeps_l, t_s, w_s, w_lo, C, n_chunks,
        )
        _tri_sweeps(
            lambda c0: t_s[pl.ds(c0, C), :], u_diags, invdu, qs_u,
            sweeps_u, out_s, w_s, w_lo, C, n_chunks,
        )

    def init_chunk(c, rho):
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        rr_s[pl.ds(c0, C), :] = r_c
        v_s[pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        p_s[pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        return rho + jnp.sum(r_c * r_c)

    rho0 = jax.lax.fori_loop(0, n_chunks, init_chunk, jnp.float32(0))

    def cond(st):
        it, rho_old, alpha, omega, rho_new, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho_old, alpha, omega, rho_new, _ = st
        beta = _sdiv(rho_new * alpha, rho_old * omega)

        # p = r + beta (p - omega v)
        def p_chunk(c, _):
            c0 = c * C
            p_s[pl.ds(c0, C), :] = (
                r_s[pl.ds(c0, C), :]
                + beta * (p_s[pl.ds(c0, C), :]
                          - omega * v_s[pl.ds(c0, C), :])
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, p_chunk, 0)

        # y = M p (u1); v = A y; <rr, v>
        m_apply(p_s, u1_s)
        stage(u1_s)

        def v_chunk(c, rv):
            c0 = c * C
            v_c = _spmv_chunk(a_diags, w_s, c0, C, qs=qs_a, pad_lo=w_lo)
            v_s[pl.ds(c0, C), :] = v_c
            return rv + jnp.sum(rr_s[pl.ds(c0, C), :] * v_c)

        rv = jax.lax.fori_loop(0, n_chunks, v_chunk, jnp.float32(0))
        alpha_new = _sdiv(rho_new, rv)

        # x += alpha y; s = r - alpha v; s.s (half-step check)
        def s_chunk(c, ss):
            c0 = c * C
            x_s[pl.ds(c0, C), :] = (
                x_s[pl.ds(c0, C), :] + alpha_new * u1_s[pl.ds(c0, C), :]
            )
            s_c = r_s[pl.ds(c0, C), :] - alpha_new * v_s[pl.ds(c0, C), :]
            s_s[pl.ds(c0, C), :] = s_c
            return ss + jnp.sum(s_c * s_c)

        ss = jax.lax.fori_loop(0, n_chunks, s_chunk, jnp.float32(0))
        mon_half = jnp.abs(rho_new) if use_implicit else ss
        half_done = mon_half <= tol_sq

        # z = M s (u1); t = A z; <t, s>, <t, t>
        m_apply(s_s, u1_s)
        stage(u1_s)

        def t_chunk(c, carry):
            ts, tt = carry
            c0 = c * C
            t_c = _spmv_chunk(a_diags, w_s, c0, C, qs=qs_a, pad_lo=w_lo)
            t_s[pl.ds(c0, C), :] = t_c
            s_c = s_s[pl.ds(c0, C), :]
            return (ts + jnp.sum(t_c * s_c), tt + jnp.sum(t_c * t_c))

        ts, tt = jax.lax.fori_loop(
            0, n_chunks, t_chunk, (jnp.float32(0), jnp.float32(0))
        )
        omega_new = jnp.where(half_done, 0.0, _sdiv(ts, tt))

        # x += omega z; r = s - omega t; rho_next, r.r
        def upd_chunk(c, carry):
            rr_dot, rnorm = carry
            c0 = c * C
            x_s[pl.ds(c0, C), :] = (
                x_s[pl.ds(c0, C), :] + omega_new * u1_s[pl.ds(c0, C), :]
            )
            r_c = s_s[pl.ds(c0, C), :] - omega_new * t_s[pl.ds(c0, C), :]
            r_s[pl.ds(c0, C), :] = r_c
            return (
                rr_dot + jnp.sum(rr_s[pl.ds(c0, C), :] * r_c),
                rnorm + jnp.sum(r_c * r_c),
            )

        rho_next, rr_new = jax.lax.fori_loop(
            0, n_chunks, upd_chunk, (jnp.float32(0), jnp.float32(0))
        )
        stop_mon = jnp.abs(rho_new) if use_implicit else rr_new
        omega_carry = jnp.where(half_done, 1.0, omega_new)
        return (it + 1, rho_new, alpha_new, omega_carry, rho_next,
                stop_mon)

    it, rho_old, alpha, omega, rho_new, stop_mon = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.float32(1), jnp.float32(1),
         jnp.float32(1), rho0, jnp.float32(jnp.inf)),
    )

    cp_xo = pltpu.make_async_copy(x_s, x_hbm, sems.at[0])
    cp_ro = pltpu.make_async_copy(r_s, r_hbm, sems.at[1])
    cp_xo.start()
    cp_ro.start()
    cp_xo.wait()
    cp_ro.wait()
    stats[0] = it.astype(jnp.float32)
    stats[1] = stop_mon
    stats[2] = (stop_mon <= tol_sq).astype(jnp.float32)


@logged_kernel
def bicgstab_ilu_vmem_solve(A_dia, Tl_dia, Tu_dia, invdl2, invdu2, r0_2,
                            x0_2, *, sweeps_l, sweeps_u, tol_sq_eff,
                            max_iters, use_implicit=False,
                            interpret=False):
    """Run ILU-preconditioned BiCGSTAB to convergence in one Pallas
    kernel (operands as cg_ilu_vmem_solve)."""
    a_diags = A_dia.diags
    nd, R, lanes = a_diags.shape
    assert lanes == LANES
    qs_a, _, _, pa_lo, pa_hi = _plan(A_dia.offsets, R)
    qs_l, _, _, pl_lo, pl_hi = _plan(Tl_dia.offsets, R)
    qs_u, _, _, pu_lo, pu_hi = _plan(Tu_dia.offsets, R)
    w_lo = max(pa_lo, pl_lo, pu_lo)
    w_hi = max(pa_hi, pl_hi, pu_hi)
    kernel = functools.partial(
        _bicgstab_ilu_kernel, qs_a=qs_a, qs_l=qs_l,
        qs_u=qs_u, pads=(w_lo, w_hi), R=R, sweeps_l=int(sweeps_l),
        sweeps_u=int(sweeps_u), use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, a_diags, Tl_dia.diags, Tu_dia.diags, invdl2,
            invdu2, r0_2, x0_2]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    Rw = R + w_lo + w_hi
    x2, _r2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((R, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.float32),   # x
            pltpu.VMEM((R, LANES), jnp.float32),   # r
            pltpu.VMEM((R, LANES), jnp.float32),   # rr (shadow)
            pltpu.VMEM((R, LANES), jnp.float32),   # p
            pltpu.VMEM((R, LANES), jnp.float32),   # v
            pltpu.VMEM((R, LANES), jnp.float32),   # t / tri intermediate
            pltpu.VMEM((R, LANES), jnp.float32),   # s
            pltpu.VMEM((R, LANES), jnp.float32),   # u1 (M-apply result)
            pltpu.VMEM((Rw, LANES), jnp.float32),  # shared staging
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (nd + 10) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 8) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

"""Whole-solve fused CGS and BiCG: the entire Krylov loop in ONE kernel.

Completes the fused Dia solver family (CG/FCG ops/pallas_cg.py,
BiCGSTAB ops/pallas_bicgstab.py, IR ops/pallas_ir.py, GMRES
ops/pallas_gmres.py): the two remaining classic nonsymmetric Krylov
methods run VMEM-resident with zero per-iteration HBM traffic.

Reference semantics mirror solver/bicgstab.py's streaming Cgs and Bicg
loops (themselves core/solver/cgs.cpp:288 / bicg.cpp:317 with the
fused per-backend step kernels of common/unified/solver/cgs_kernels.cpp
and bicg_kernels.cpp).

CGS is transpose-free; diagonal (scalar-Jacobi) preconditioning is
FOLDED INTO THE OPERATOR exactly as in the fused BiCGSTAB: the kernel
streams A@M (a one-time column scaling of the Dia diagonals) and the x
update applies t = minv*(u+q) chunk-wise.

BiCG needs A^H for the shadow recurrence: the kernel carries BOTH
diagonal stacks (A and A^H = the Dia conj_transpose, offsets negated)
in VMEM and runs the two SpMVs in one chunked pass.  The reference
launches a separate conj-transposed SpMV per iteration
(core/solver/bicg.cpp); here both directions read their diagonals from
VMEM so the extra direction is pure VPU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

from .pallas_cg import (
    _chunk_rows, _sdiv, _spmv_chunk, cg_vmem_budget_bytes,
)
from .pallas_dia import _plan

LANES = 128


# --------------------------------------------------------------------------
# CGS
# --------------------------------------------------------------------------

def cgs_vmem_fits(nd: int, R: int, diag_itemsize: int = 4,
                  use_minv: bool = False, halo_rows: int = 0) -> bool:
    """x, r, rr, q, u, v frames + halo-padded p and w (+ minv)."""
    frame = R * LANES * 4
    vec_frames = (
        8.5 + 2 * halo_rows / max(R, 1) + (1 if use_minv else 0)
    )
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _cgs_kernel(scal, iscal, diags, r0_hbm, x0_hbm, minv, x_hbm, r_hbm,
                stats, x_s, r_s, rr_s, q_s, u_s, v_s, p_s, w_s, sems, *,
                qs, pad_lo, pad_hi, R, use_minv, use_implicit):
    """scal: SMEM (1,) [tol_sq_eff]; iscal: SMEM int32 (1,) [max_iters].
    stats out: SMEM (3,) [iterations, monitored_sq, converged]."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    Rp = R + pad_lo + pad_hi
    C = _chunk_rows(R)
    n_chunks = R // C

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    for ref in (p_s, w_s):
        if pad_lo:
            ref[0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
        if pad_hi:
            ref[Rp - pad_hi:Rp] = jnp.zeros((pad_hi, LANES), jnp.float32)

    def init_chunk(c, rho):
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        rr_s[pl.ds(c0, C), :] = r_c  # shadow residual = r0
        q_s[pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        p_s[pl.ds(pad_lo + c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        return rho + jnp.sum(r_c * r_c)  # <rr, r0>

    rho0 = jax.lax.fori_loop(0, n_chunks, init_chunk, jnp.float32(0))

    def cond(st):
        it, rho_old, rho_new, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho_old, rho_new, _ = st
        beta = _sdiv(rho_new, rho_old)

        # pass 1: u = r + beta q; p = u + beta (q + beta p)
        def up_chunk(c, _):
            c0 = c * C
            r_c = r_s[pl.ds(c0, C), :]
            q_c = q_s[pl.ds(c0, C), :]
            u_c = r_c + beta * q_c
            u_s[pl.ds(c0, C), :] = u_c
            p_old = p_s[pl.ds(pad_lo + c0, C), :]
            p_s[pl.ds(pad_lo + c0, C), :] = (
                u_c + beta * (q_c + beta * p_old)
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, up_chunk, 0)

        # pass 2: v = (A M) p, accumulate sigma = <rr, v>
        def v_chunk(c, sg):
            c0 = c * C
            v_c = _spmv_chunk(diags, p_s, c0, C, qs=qs, pad_lo=pad_lo)
            v_s[pl.ds(c0, C), :] = v_c
            return sg + jnp.sum(rr_s[pl.ds(c0, C), :] * v_c)

        sigma = jax.lax.fori_loop(0, n_chunks, v_chunk, jnp.float32(0))
        alpha = _sdiv(rho_new, sigma)

        # pass 3: q_new = u - alpha v;  w = u + q_new
        def qw_chunk(c, _):
            c0 = c * C
            u_c = u_s[pl.ds(c0, C), :]
            q_new = u_c - alpha * v_s[pl.ds(c0, C), :]
            q_s[pl.ds(c0, C), :] = q_new
            w_s[pl.ds(pad_lo + c0, C), :] = u_c + q_new
            return 0

        jax.lax.fori_loop(0, n_chunks, qw_chunk, 0)

        # pass 4: t = (A M) w;  x += alpha (M w);  r -= alpha t;
        # accumulate r.r and the NEXT iteration's rho = <rr, r_new>
        def upd_chunk(c, carry):
            rho_nxt, rnorm = carry
            c0 = c * C
            t_c = _spmv_chunk(diags, w_s, c0, C, qs=qs, pad_lo=pad_lo)
            w_c = w_s[pl.ds(pad_lo + c0, C), :]
            mw_c = mchunk(c0) * w_c if use_minv else w_c
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + alpha * mw_c
            r_c = r_s[pl.ds(c0, C), :] - alpha * t_c
            r_s[pl.ds(c0, C), :] = r_c
            return (
                rho_nxt + jnp.sum(rr_s[pl.ds(c0, C), :] * r_c),
                rnorm + jnp.sum(r_c * r_c),
            )

        rho_next, rr_new = jax.lax.fori_loop(
            0, n_chunks, upd_chunk, (jnp.float32(0), jnp.float32(0))
        )
        stop_mon = jnp.abs(rho_new) if use_implicit else rr_new
        return (it + 1, rho_new, rho_next, stop_mon)

    it, _rho_old, _rho_new, stop_mon = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.float32(1), rho0,
         jnp.float32(jnp.inf)),
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
def cgs_vmem_solve(diags, offsets, r0_2, x0_2, minv2=None, *,
                   tol_sq_eff, max_iters, use_implicit=False,
                   interpret=False):
    """Run CGS to convergence in one Pallas kernel.

    diags: (nd, R, 128) — already minv-column-scaled when preconditioned
    (A@M); minv2: optional (R, 128) inverse diagonal for the x update.
    Returns (x2, iterations, monitored_sq, converged)."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    qs, _qmin, _halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _cgs_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R,
        use_minv=use_minv, use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, diags, r0_2, x0_2]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args.append(minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    Rp = R + pad_lo + pad_hi
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
            pltpu.VMEM((R, LANES), jnp.float32),   # q
            pltpu.VMEM((R, LANES), jnp.float32),   # u
            pltpu.VMEM((R, LANES), jnp.float32),   # v
            pltpu.VMEM((Rp, LANES), jnp.float32),  # p (halo-padded)
            pltpu.VMEM((Rp, LANES), jnp.float32),  # w = u+q (halo-padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * nd + 14) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 4) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


# --------------------------------------------------------------------------
# BiCG
# --------------------------------------------------------------------------

def bicg_vmem_fits(nd: int, nd_t: int, R: int, diag_itemsize: int = 4,
                   use_minv: bool = False, halo_rows: int = 0) -> bool:
    """Two diagonal stacks (A and A^H) + x, r, r2, q, q2 frames +
    halo-padded p and p2 (+ minv)."""
    frame = R * LANES * 4
    vec_frames = (
        7.5 + 2 * halo_rows / max(R, 1) + (1 if use_minv else 0)
    )
    return (nd + nd_t) * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _bicg_kernel(scal, iscal, diags, diags_t, r0_hbm, x0_hbm, minv, x_hbm,
                 r_hbm, stats, x_s, r_s, r2_s, q_s, q2_s, p_s, p2_s, sems,
                 *, qs, qs_t, pad_lo, pad_hi, pad_lo_t, pad_hi_t, R,
                 use_minv, use_implicit):
    """Real f32 BiCG (conj = identity): z = M r, z2 = M r2 computed
    chunk-wise (one multiply each — cheaper than two more frames)."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    Rp = R + pad_lo + pad_hi
    Rp_t = R + pad_lo_t + pad_hi_t
    C = _chunk_rows(R)
    n_chunks = R // C

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    if pad_lo:
        p_s[0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
    if pad_hi:
        p_s[Rp - pad_hi:Rp] = jnp.zeros((pad_hi, LANES), jnp.float32)
    if pad_lo_t:
        p2_s[0:pad_lo_t] = jnp.zeros((pad_lo_t, LANES), jnp.float32)
    if pad_hi_t:
        p2_s[Rp_t - pad_hi_t:Rp_t] = jnp.zeros(
            (pad_hi_t, LANES), jnp.float32
        )

    def init_chunk(c, rho):
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        r2_s[pl.ds(c0, C), :] = r_c  # r2_0 = conj(r0) = r0 (real)
        p_s[pl.ds(pad_lo + c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        p2_s[pl.ds(pad_lo_t + c0, C), :] = jnp.zeros(
            (C, LANES), jnp.float32
        )
        z_c = mchunk(c0) * r_c if use_minv else r_c
        return rho + jnp.sum(r_c * z_c)  # <r2, z> with r2 = r0

    rho0 = jax.lax.fori_loop(0, n_chunks, init_chunk, jnp.float32(0))

    def cond(st):
        it, rho_old, rho_new, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho_old, rho_new, _ = st
        beta = _sdiv(rho_new, rho_old)

        # pass 1: p = M r + beta p;  p2 = M r2 + beta p2
        def p_chunk(c, _):
            c0 = c * C
            r_c = r_s[pl.ds(c0, C), :]
            r2_c = r2_s[pl.ds(c0, C), :]
            z_c = mchunk(c0) * r_c if use_minv else r_c
            z2_c = mchunk(c0) * r2_c if use_minv else r2_c
            p_s[pl.ds(pad_lo + c0, C), :] = (
                z_c + beta * p_s[pl.ds(pad_lo + c0, C), :]
            )
            p2_s[pl.ds(pad_lo_t + c0, C), :] = (
                z2_c + beta * p2_s[pl.ds(pad_lo_t + c0, C), :]
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, p_chunk, 0)

        # pass 2: q = A p, q2 = A^H p2, accumulate <p2, q>
        def q_chunk(c, pq):
            c0 = c * C
            q_c = _spmv_chunk(diags, p_s, c0, C, qs=qs, pad_lo=pad_lo)
            q_s[pl.ds(c0, C), :] = q_c
            q2_c = _spmv_chunk(
                diags_t, p2_s, c0, C, qs=qs_t, pad_lo=pad_lo_t
            )
            q2_s[pl.ds(c0, C), :] = q2_c
            p2_c = p2_s[pl.ds(pad_lo_t + c0, C), :]
            return pq + jnp.sum(p2_c * q_c)

        pq = jax.lax.fori_loop(0, n_chunks, q_chunk, jnp.float32(0))
        alpha = _sdiv(rho_new, pq)

        # pass 3: x += alpha p; r -= alpha q; r2 -= alpha q2;
        # accumulate r.r and the NEXT rho = <r2_new, M r_new>
        def upd_chunk(c, carry):
            rho_nxt, rnorm = carry
            c0 = c * C
            p_c = p_s[pl.ds(pad_lo + c0, C), :]
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + alpha * p_c
            r_c = r_s[pl.ds(c0, C), :] - alpha * q_s[pl.ds(c0, C), :]
            r_s[pl.ds(c0, C), :] = r_c
            r2_c = r2_s[pl.ds(c0, C), :] - alpha * q2_s[pl.ds(c0, C), :]
            r2_s[pl.ds(c0, C), :] = r2_c
            z_c = mchunk(c0) * r_c if use_minv else r_c
            return (
                rho_nxt + jnp.sum(r2_c * z_c),
                rnorm + jnp.sum(r_c * r_c),
            )

        rho_next, rr_new = jax.lax.fori_loop(
            0, n_chunks, upd_chunk, (jnp.float32(0), jnp.float32(0))
        )
        stop_mon = jnp.abs(rho_new) if use_implicit else rr_new
        return (it + 1, rho_new, rho_next, stop_mon)

    it, _rho_old, _rho_new, stop_mon = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.float32(1), rho0,
         jnp.float32(jnp.inf)),
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
def bicg_vmem_solve(diags, offsets, diags_t, offsets_t, r0_2, x0_2,
                    minv2=None, *, tol_sq_eff, max_iters,
                    use_implicit=False, interpret=False):
    """Run BiCG to convergence in one Pallas kernel.

    diags/offsets: the operator A; diags_t/offsets_t: A^H (the Dia
    conj_transpose); minv2: optional (R, 128) inverse diagonal (real, so
    M^H = M).  Returns (x2, iterations, monitored_sq, converged)."""
    nd, R, lanes = diags.shape
    nd_t = diags_t.shape[0]
    assert lanes == LANES
    qs, _q, _h, pad_lo, pad_hi = _plan(offsets, R)
    qs_t, _q2, _h2, pad_lo_t, pad_hi_t = _plan(offsets_t, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _bicg_kernel, qs=qs, qs_t=qs_t, pad_lo=pad_lo, pad_hi=pad_hi,
        pad_lo_t=pad_lo_t, pad_hi_t=pad_hi_t, R=R, use_minv=use_minv,
        use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, diags, diags_t, r0_2, x0_2]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args.append(minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    Rp = R + pad_lo + pad_hi
    Rp_t = R + pad_lo_t + pad_hi_t
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
            pltpu.VMEM((R, LANES), jnp.float32),     # x
            pltpu.VMEM((R, LANES), jnp.float32),     # r
            pltpu.VMEM((R, LANES), jnp.float32),     # r2 (shadow)
            pltpu.VMEM((R, LANES), jnp.float32),     # q
            pltpu.VMEM((R, LANES), jnp.float32),     # q2
            pltpu.VMEM((Rp, LANES), jnp.float32),    # p (halo-padded)
            pltpu.VMEM((Rp_t, LANES), jnp.float32),  # p2 (halo-padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nd + nd_t + 10) * R * LANES * int(max_iters),
            bytes_accessed=(nd + nd_t + 4) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

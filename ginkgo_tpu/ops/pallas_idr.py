"""Whole-solve fused IDR(s): the complete induced-dimension-reduction
solve inside ONE Pallas kernel.

With this, EVERY Krylov solver in the zoo (CG/FCG ops/pallas_cg.py,
BiCGSTAB ops/pallas_bicgstab.py, CGS/BiCG ops/pallas_cgs.py, GMRES
ops/pallas_gmres.py, IR ops/pallas_ir.py) has a VMEM-resident
single-kernel path on Dia operators.

Reference semantics mirror solver/idr.py's streaming loop (itself
core/solver/idr.cpp:406 biorthogonal IDR(s) with the kappa omega
safeguard and the deterministic orthonormal shadow space): the
subspace dimension s is a STATIC factory parameter, so the inner
s-step loop and every s×s small solve unroll into straight-line
scalar code — the s×s lower-triangular solve is forward substitution
on while-carry register scalars, and the shadow-space projections
f = P^T r are s chunked frame reductions.

State: x, r, b frames + s-frame stacks G, U (VMEM scratch) + the
orthonormal shadow space P as an (s, R, 128) VMEM input + one
halo-padded SpMV staging frame.  The s×s M matrix and the s-vector f
live in the lax.while_loop carry (pure registers).  Per outer
iteration: s+2 SpMVs (s inner, 1 omega step, 1 residual replacement —
the same replacement the streaming loop needs for f32 honesty).
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

MAX_FUSED_IDR_S = 4  # carry holds s^2 + s scalars; keep it register-sized


def idr_vmem_fits(nd: int, R: int, s: int, diag_itemsize: int = 4,
                  use_minv: bool = False, halo_rows: int = 0) -> bool:
    """x, r, b frames + G/U/P (3s frames) + halo-padded staging frame
    (+ minv)."""
    frame = R * LANES * 4
    vec_frames = (
        3.5 + 3 * s + (1 + halo_rows / max(R, 1)) + (1 if use_minv else 0)
    )
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _idr_kernel(scal, iscal, diags, P3, r0_hbm, x0_hbm, b_hbm, minv,
                x_hbm, r_hbm, stats, x_s, r_s, b_s, G_s, U_s, w_s, sems,
                *, qs, pad_lo, pad_hi, R, s, kappa, use_minv):
    """scal: SMEM (1,) [tol_sq_eff]; iscal: SMEM int32 (1,) [max_iters].
    stats out: SMEM (3,) [iterations, monitored_sq, converged].

    Carry layout: (it, om, stop_mon, f[0..s-1], Mm[0..s*s-1]) — all
    f32 scalars (Mm row-major)."""
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
    cp_b = pltpu.make_async_copy(b_hbm, b_s, sems.at[0])
    cp_b.start()
    cp_b.wait()

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    if pad_lo:
        w_s[0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
    if pad_hi:
        w_s[Rp - pad_hi:Rp] = jnp.zeros((pad_hi, LANES), jnp.float32)

    # init: G = U = 0, f = P r0, rr0 = <r0, r0>
    def init_chunk(c, carry):
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        for j in range(s):
            G_s[j, pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
            U_s[j, pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        f_new = tuple(
            carry[j] + jnp.sum(P3[j, pl.ds(c0, C), :] * r_c)
            for j in range(s)
        )
        return f_new + (carry[s] + jnp.sum(r_c * r_c),)

    init0 = jax.lax.fori_loop(
        0, n_chunks, init_chunk,
        tuple(jnp.float32(0) for _ in range(s + 1)),
    )
    f0 = init0[:s]
    rr0 = init0[s]

    eye = tuple(
        jnp.float32(1.0 if i == j else 0.0)
        for i in range(s) for j in range(s)
    )

    def cond(st):
        it, om, stop_mon = st[0], st[1], st[2]
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, om = st[0], st[1]
        f = list(st[3:3 + s])
        Mm = list(st[3 + s:3 + s + s * s])

        for kk in range(s):
            # c = forward substitution on Mm[kk:, kk:] (lower tri)
            csol = [None] * s
            for i in range(kk, s):
                acc = f[i]
                for j in range(kk, i):
                    acc = acc - Mm[i * s + j] * csol[j]
                csol[i] = _sdiv(acc, Mm[i * s + i])

            # pass B: w = om * M (r - sum_j c_j G_j) + sum_j c_j U_j
            # (u_new) into the padded staging frame
            def uB_chunk(c, _):
                c0 = c * C
                v_c = r_s[pl.ds(c0, C), :]
                for j in range(kk, s):
                    v_c = v_c - csol[j] * G_s[j, pl.ds(c0, C), :]
                if use_minv:
                    v_c = mchunk(c0) * v_c
                u_c = om * v_c
                for j in range(kk, s):
                    u_c = u_c + csol[j] * U_s[j, pl.ds(c0, C), :]
                w_s[pl.ds(pad_lo + c0, C), :] = u_c
                return 0

            jax.lax.fori_loop(0, n_chunks, uB_chunk, 0)

            # pass C: g_new = A u_new -> G[kk]
            def gC_chunk(c, _):
                c0 = c * C
                G_s[kk, pl.ds(c0, C), :] = _spmv_chunk(
                    diags, w_s, c0, C, qs=qs, pad_lo=pad_lo
                )
                return 0

            jax.lax.fori_loop(0, n_chunks, gC_chunk, 0)

            # biorthogonalize against P[0..kk-1]: sequential alpha_i
            for i in range(kk):
                def dot_chunk(c, d):
                    c0 = c * C
                    return d + jnp.sum(
                        P3[i, pl.ds(c0, C), :] * G_s[kk, pl.ds(c0, C), :]
                    )

                pg = jax.lax.fori_loop(
                    0, n_chunks, dot_chunk, jnp.float32(0)
                )
                alpha = _sdiv(pg, Mm[i * s + i])

                def sub_chunk(c, _):
                    c0 = c * C
                    G_s[kk, pl.ds(c0, C), :] = (
                        G_s[kk, pl.ds(c0, C), :]
                        - alpha * G_s[i, pl.ds(c0, C), :]
                    )
                    w_s[pl.ds(pad_lo + c0, C), :] = (
                        w_s[pl.ds(pad_lo + c0, C), :]
                        - alpha * U_s[i, pl.ds(c0, C), :]
                    )
                    return 0

                jax.lax.fori_loop(0, n_chunks, sub_chunk, 0)

            # pass D: U[kk] = u_new; mcol = P @ g_new
            def mcol_chunk(c, acc):
                c0 = c * C
                U_s[kk, pl.ds(c0, C), :] = w_s[pl.ds(pad_lo + c0, C), :]
                g_c = G_s[kk, pl.ds(c0, C), :]
                return tuple(
                    acc[j] + jnp.sum(P3[j, pl.ds(c0, C), :] * g_c)
                    for j in range(s)
                )

            mcol = jax.lax.fori_loop(
                0, n_chunks, mcol_chunk,
                tuple(jnp.float32(0) for _ in range(s)),
            )
            for i in range(kk, s):  # rows >= kk take the new column
                Mm[i * s + kk] = mcol[i]
            beta = _sdiv(f[kk], Mm[kk * s + kk])

            # pass E: r -= beta g_new; x += beta u_new
            def rx_chunk(c, _):
                c0 = c * C
                r_s[pl.ds(c0, C), :] = (
                    r_s[pl.ds(c0, C), :]
                    - beta * G_s[kk, pl.ds(c0, C), :]
                )
                x_s[pl.ds(c0, C), :] = (
                    x_s[pl.ds(c0, C), :]
                    + beta * U_s[kk, pl.ds(c0, C), :]
                )
                return 0

            jax.lax.fori_loop(0, n_chunks, rx_chunk, 0)
            for j in range(s):
                f[j] = f[j] - beta * Mm[j * s + kk] if j > kk else (
                    jnp.float32(0) if j == kk else f[j]
                )

        # dimension-reduction step: v = M r; t = A v
        def vF_chunk(c, _):
            c0 = c * C
            r_c = r_s[pl.ds(c0, C), :]
            w_s[pl.ds(pad_lo + c0, C), :] = (
                mchunk(c0) * r_c if use_minv else r_c
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, vF_chunk, 0)

        def tG_chunk(c, carry):
            tt, tr, rr = carry
            c0 = c * C
            t_c = _spmv_chunk(diags, w_s, c0, C, qs=qs, pad_lo=pad_lo)
            r_c = r_s[pl.ds(c0, C), :]
            return (tt + jnp.sum(t_c * t_c), tr + jnp.sum(t_c * r_c),
                    rr + jnp.sum(r_c * r_c))

        tt, tr, rr = jax.lax.fori_loop(
            0, n_chunks, tG_chunk,
            (jnp.float32(0), jnp.float32(0), jnp.float32(0)),
        )
        om_raw = _sdiv(tr, tt)
        rho = jnp.abs(_sdiv(tr, jnp.sqrt(tt) * jnp.sqrt(rr)))
        om_new = jnp.where(
            rho < kappa, om_raw * _sdiv(jnp.float32(kappa), rho), om_raw
        )

        # pass H: x += om * v; restage x (padded) for the replacement SpMV
        def xH_chunk(c, _):
            c0 = c * C
            v_c = w_s[pl.ds(pad_lo + c0, C), :]
            x_c = x_s[pl.ds(c0, C), :] + om_new * v_c
            x_s[pl.ds(c0, C), :] = x_c
            w_s[pl.ds(pad_lo + c0, C), :] = x_c
            return 0

        jax.lax.fori_loop(0, n_chunks, xH_chunk, 0)

        # pass I: residual replacement r = b - A x (keeps the f32
        # criterion honest — same as the streaming loop); fuse the next
        # iteration's f = P r and the stop monitor <r, r>
        def rI_chunk(c, carry):
            c0 = c * C
            ax_c = _spmv_chunk(diags, w_s, c0, C, qs=qs, pad_lo=pad_lo)
            r_c = b_s[pl.ds(c0, C), :] - ax_c
            r_s[pl.ds(c0, C), :] = r_c
            out = tuple(
                carry[j] + jnp.sum(P3[j, pl.ds(c0, C), :] * r_c)
                for j in range(s)
            )
            return out + (carry[s] + jnp.sum(r_c * r_c),)

        out = jax.lax.fori_loop(
            0, n_chunks, rI_chunk,
            tuple(jnp.float32(0) for _ in range(s + 1)),
        )
        f_next = out[:s]
        rn_sq = out[s]
        return (it + 1, om_new, rn_sq) + f_next + tuple(Mm)

    st = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.float32(1),
         jnp.where(~(rr0 <= tol_sq), jnp.float32(jnp.inf), rr0)) + f0 + eye,
    )
    it, stop_mon = st[0], st[2]

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
def idr_vmem_solve(diags, offsets, P3, r0_2, x0_2, b_2, minv2=None, *,
                   s, kappa, tol_sq_eff, max_iters, interpret=False):
    """Run biorthogonal IDR(s) to convergence in one Pallas kernel.

    P3: (s, R, 128) orthonormal shadow frames; b_2: (R, 128) RHS frame
    (needed for the per-outer-iteration residual replacement).
    Returns (x2, iterations, monitored_sq, converged)."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    assert P3.shape[0] == s
    qs, _qmin, _halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _idr_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R, s=s,
        kappa=float(kappa), use_minv=use_minv,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, diags, P3.astype(jnp.float32), r0_2, x0_2, b_2]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((R, LANES), jnp.float32),      # x
            pltpu.VMEM((R, LANES), jnp.float32),      # r
            pltpu.VMEM((R, LANES), jnp.float32),      # b
            pltpu.VMEM((s, R, LANES), jnp.float32),   # G
            pltpu.VMEM((s, R, LANES), jnp.float32),   # U
            pltpu.VMEM((Rp, LANES), jnp.float32),     # SpMV staging
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ((s + 2) * nd + 8 * s + 10) * R * LANES
            * int(max_iters),
            bytes_accessed=(nd + 3 * s + 4) * R * LANES * 4,
            transcendentals=2 * int(max_iters),
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

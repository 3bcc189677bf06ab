"""Whole-solve fused BiCGSTAB: the entire loop inside ONE Pallas kernel.

Same design as ops/pallas_cg.py (which see): all state VMEM-resident,
chunked passes keep Mosaic temporaries register-sized, scalar-only
while_loop carries, stop test in-kernel.  Reference semantics mirror
solver/bicgstab.py (itself core/solver/bicgstab.cpp): shadow residual
rr = r0, the half-step convergence check on s before the second SpMV,
and the same masked scalar updates.

Diagonal (scalar-Jacobi) preconditioning is FOLDED INTO THE OPERATOR:
right-preconditioned BiCGSTAB applies A@M to the search directions, and
for diagonal M that is just a one-time column scaling of the Dia
diagonals — so only p and s need halo-padded frames, and the x update
uses y = minv*p, z = minv*s computed chunk-wise.

State frames: x, r, rr, v, t (+ minv) + halo-padded p, s + diagonals.
Five chunked passes per iteration (2 SpMVs + 3 axpy/dot passes); the
next iteration's rho = <rr, r_new> is fused into the update pass.
"""

from __future__ import annotations

import functools
import os

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


def bicgstab_vmem_fits(nd: int, R: int, diag_itemsize: int = 4,
                       use_minv: bool = False, halo_rows: int = 0) -> bool:
    """x, r, rr, v, t frames + halo-padded p and s + diags (+ minv)."""
    frame = R * LANES * 4
    vec_frames = (
        7.5 + 2 * halo_rows / max(R, 1) + (1 if use_minv else 0)
    )
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _bicgstab_kernel(scal, iscal, diags, r0_hbm, x0_hbm, minv, x_hbm, r_hbm,
                     stats, x_s, r_s, rr_s, v_s, t_s, p_s, s_s, sems, *, qs,
                     pad_lo, pad_hi, R, use_minv, use_implicit):
    tol_sq = scal[0]
    max_iters = iscal[0]  # int32 SMEM: exact above 2^24, unlike an f32 ride
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

    for ref in (p_s, s_s):
        if pad_lo:
            ref[0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
        if pad_hi:
            ref[Rp - pad_hi:Rp] = jnp.zeros((pad_hi, LANES), jnp.float32)

    def init_chunk(c, rho):
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        rr_s[pl.ds(c0, C), :] = r_c  # shadow residual = r0
        v_s[pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        p_s[pl.ds(pad_lo + c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        return rho + jnp.sum(r_c * r_c)  # <rr, r0> = <r0, r0>

    rho0 = jax.lax.fori_loop(0, n_chunks, init_chunk, jnp.float32(0))

    def cond(st):
        it, rho_old, alpha, omega, rho_new, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho_old, alpha, omega, rho_new, _ = st
        beta = _sdiv(rho_new * alpha, rho_old * omega)

        # pass 1: p = r + beta (p - omega v)
        def p_chunk(c, _):
            c0 = c * C
            p_c = p_s[pl.ds(pad_lo + c0, C), :]
            p_s[pl.ds(pad_lo + c0, C), :] = (
                r_s[pl.ds(c0, C), :]
                + beta * (p_c - omega * v_s[pl.ds(c0, C), :])
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, p_chunk, 0)

        # pass 2: v = (A M) p, accumulate <rr, v>
        def v_chunk(c, rv):
            c0 = c * C
            v_c = _spmv_chunk(diags, p_s, c0, C, qs=qs, pad_lo=pad_lo)
            v_s[pl.ds(c0, C), :] = v_c
            return rv + jnp.sum(rr_s[pl.ds(c0, C), :] * v_c)

        rv = jax.lax.fori_loop(0, n_chunks, v_chunk, jnp.float32(0))
        alpha_new = _sdiv(rho_new, rv)

        # pass 3: s = r - alpha v, accumulate s.s (half-step check)
        def s_chunk(c, ss):
            c0 = c * C
            s_c = r_s[pl.ds(c0, C), :] - alpha_new * v_s[pl.ds(c0, C), :]
            s_s[pl.ds(pad_lo + c0, C), :] = s_c
            return ss + jnp.sum(s_c * s_c)

        ss = jax.lax.fori_loop(0, n_chunks, s_chunk, jnp.float32(0))
        mon_half = jnp.abs(rho_new) if use_implicit else ss
        half_done = mon_half <= tol_sq

        # pass 4: t = (A M) s, accumulate <t, s>, <t, t>
        def t_chunk(c, carry):
            ts, tt = carry
            c0 = c * C
            t_c = _spmv_chunk(diags, s_s, c0, C, qs=qs, pad_lo=pad_lo)
            t_s[pl.ds(c0, C), :] = t_c
            s_c = s_s[pl.ds(pad_lo + c0, C), :]
            return (ts + jnp.sum(t_c * s_c), tt + jnp.sum(t_c * t_c))

        ts, tt = jax.lax.fori_loop(
            0, n_chunks, t_chunk, (jnp.float32(0), jnp.float32(0))
        )
        # bicgstab.py: omega = 0 for half-converged columns (skips the
        # second half-update so r = s)
        omega_new = jnp.where(half_done, 0.0, _sdiv(ts, tt))

        # pass 5: x += alpha (M p) + omega (M s); r = s - omega t;
        # accumulate r.r and the NEXT iteration's rho = <rr, r_new>
        def upd_chunk(c, carry):
            rr_dot, rnorm = carry
            c0 = c * C
            p_c = p_s[pl.ds(pad_lo + c0, C), :]
            s_c = s_s[pl.ds(pad_lo + c0, C), :]
            y_c = mchunk(c0) * p_c if use_minv else p_c
            z_c = mchunk(c0) * s_c if use_minv else s_c
            x_s[pl.ds(c0, C), :] = (
                x_s[pl.ds(c0, C), :] + alpha_new * y_c + omega_new * z_c
            )
            r_c = s_c - omega_new * t_s[pl.ds(c0, C), :]
            r_s[pl.ds(c0, C), :] = r_c
            return (
                rr_dot + jnp.sum(rr_s[pl.ds(c0, C), :] * r_c),
                rnorm + jnp.sum(r_c * r_c),
            )

        rho_next, rr_new = jax.lax.fori_loop(
            0, n_chunks, upd_chunk, (jnp.float32(0), jnp.float32(0))
        )
        stop_mon = jnp.abs(rho_new) if use_implicit else rr_new
        # a half-done iteration reports omega carried as 1 (bicgstab.py)
        omega_carry = jnp.where(half_done, 1.0, omega_new)
        return (it + 1, rho_new, alpha_new, omega_carry, rho_next, stop_mon)

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


def bicgstab_vmem_fits_multi(nd: int, R: int, diag_itemsize: int = 4,
                             use_minv: bool = False, halo_rows: int = 0,
                             k: int = 1) -> bool:
    """k-RHS variant: per-column x/r/rr/v/t + halo-padded p/s frames."""
    frame = R * LANES * 4
    vec_frames = k * (5.0 + 2 * halo_rows / max(R, 1) + 2) + 0.5 + (
        1 if use_minv else 0
    )
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _bicgstab_multi_kernel(scal, iscal, diags, r0_hbm, x0_hbm, minv, x_hbm,
                           r_hbm, stats, x_s, r_s, rr_s, v_s, t_s, p_s, s_s,
                           sems, *, qs, pad_lo, pad_hi, R, k, use_minv,
                           use_implicit):
    """k-RHS whole-solve BiCGSTAB with PER-COLUMN stopping — the
    reference's stopping_status-masked step kernels
    (stopping_status.hpp:62-145, bicgstab.cpp step_1..3) in-kernel: a
    stopped column's p/v/x/r writes are bypassed and its scalars freeze;
    the half-step check on s fires per column.  scal: SMEM (k,) squared
    tolerances; stats out: SMEM (1+3k,)."""
    from .pallas_cg import _chunk_rows_multi, _spmv_chunk_multi

    max_iters = iscal[0]
    Rp = R + pad_lo + pad_hi
    C = _chunk_rows_multi(R, k)
    n_chunks = R // C

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    for ref in (p_s, s_s):
        for j in range(k):
            if pad_lo:
                ref[j, 0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
            if pad_hi:
                ref[j, Rp - pad_hi:Rp] = jnp.zeros(
                    (pad_hi, LANES), jnp.float32
                )

    def init_chunk(c, rho):
        c0 = c * C
        out = []
        for j in range(k):
            r_c = r_s[j, pl.ds(c0, C), :]
            rr_s[j, pl.ds(c0, C), :] = r_c
            v_s[j, pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
            p_s[j, pl.ds(pad_lo + c0, C), :] = jnp.zeros(
                (C, LANES), jnp.float32
            )
            out.append(rho[j] + jnp.sum(r_c * r_c))
        return tuple(out)

    zk = tuple(jnp.float32(0) for _ in range(k))
    ones = tuple(jnp.float32(1) for _ in range(k))
    rho0 = jax.lax.fori_loop(0, n_chunks, init_chunk, zk)

    def cond(st):
        it = st[0]
        act = st[5]
        any_act = act[0]
        for j in range(1, k):
            any_act = any_act | act[j]
        return (it < max_iters) & any_act

    def body(st):
        it, rho_old, alpha, omega, rho_new, act, itc, _mon = st
        beta = [
            _sdiv(rho_new[j] * alpha[j], rho_old[j] * omega[j])
            for j in range(k)
        ]

        # pass 1: p = r + beta (p - omega v) — stopped columns keep p
        def p_chunk(c, _):
            c0 = c * C
            for j in range(k):
                p_c = p_s[j, pl.ds(pad_lo + c0, C), :]
                new = (
                    r_s[j, pl.ds(c0, C), :]
                    + beta[j] * (p_c - omega[j] * v_s[j, pl.ds(c0, C), :])
                )
                p_s[j, pl.ds(pad_lo + c0, C), :] = jnp.where(
                    act[j], new, p_c
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, p_chunk, 0)

        # pass 2: v = (A M) p, accumulate <rr, v> — stopped columns keep v
        def v_chunk(c, rv):
            c0 = c * C
            v_cs = _spmv_chunk_multi(diags, p_s, c0, C, qs=qs,
                                     pad_lo=pad_lo, k=k)
            out = []
            for j in range(k):
                v_c = jnp.where(act[j], v_cs[j], v_s[j, pl.ds(c0, C), :])
                v_s[j, pl.ds(c0, C), :] = v_c
                out.append(rv[j] + jnp.sum(rr_s[j, pl.ds(c0, C), :] * v_c))
            return tuple(out)

        rv = jax.lax.fori_loop(0, n_chunks, v_chunk, zk)
        alpha_new = [
            jnp.where(act[j], _sdiv(rho_new[j], rv[j]), alpha[j])
            for j in range(k)
        ]
        alpha_eff = [
            jnp.where(act[j], alpha_new[j], 0.0) for j in range(k)
        ]

        # pass 3: s = r - alpha v, accumulate s.s (half-step check)
        def s_chunk(c, ss):
            c0 = c * C
            out = []
            for j in range(k):
                s_c = (
                    r_s[j, pl.ds(c0, C), :]
                    - alpha_eff[j] * v_s[j, pl.ds(c0, C), :]
                )
                s_s[j, pl.ds(pad_lo + c0, C), :] = s_c
                out.append(ss[j] + jnp.sum(s_c * s_c))
            return tuple(out)

        ss = jax.lax.fori_loop(0, n_chunks, s_chunk, zk)
        half_done = []
        for j in range(k):
            mon_half = jnp.abs(rho_new[j]) if use_implicit else ss[j]
            half_done.append(act[j] & (mon_half <= scal[j]))

        # pass 4: t = (A M) s, accumulate <t, s>, <t, t>
        def t_chunk(c, carry):
            ts, tt = carry
            ts2, tt2 = [], []
            c0 = c * C
            t_cs = _spmv_chunk_multi(diags, s_s, c0, C, qs=qs,
                                     pad_lo=pad_lo, k=k)
            for j in range(k):
                t_s[j, pl.ds(c0, C), :] = t_cs[j]
                s_c = s_s[j, pl.ds(pad_lo + c0, C), :]
                ts2.append(ts[j] + jnp.sum(t_cs[j] * s_c))
                tt2.append(tt[j] + jnp.sum(t_cs[j] * t_cs[j]))
            return (tuple(ts2), tuple(tt2))

        ts, tt = jax.lax.fori_loop(0, n_chunks, t_chunk, (zk, zk))
        omega_eff = [
            jnp.where(
                act[j] & ~half_done[j], _sdiv(ts[j], tt[j]), 0.0
            )
            for j in range(k)
        ]

        # pass 5: x += alpha (M p) + omega (M s); r = s - omega t;
        # next rho = <rr, r_new> — stopped columns keep x and r
        def upd_chunk(c, carry):
            rr_dot, rnorm = carry
            rr2, rn2 = [], []
            c0 = c * C
            for j in range(k):
                p_c = p_s[j, pl.ds(pad_lo + c0, C), :]
                s_c = s_s[j, pl.ds(pad_lo + c0, C), :]
                y_c = mchunk(c0) * p_c if use_minv else p_c
                z_c = mchunk(c0) * s_c if use_minv else s_c
                x_old = x_s[j, pl.ds(c0, C), :]
                x_s[j, pl.ds(c0, C), :] = jnp.where(
                    act[j],
                    x_old + alpha_eff[j] * y_c + omega_eff[j] * z_c,
                    x_old,
                )
                r_old = r_s[j, pl.ds(c0, C), :]
                r_c = jnp.where(
                    act[j], s_c - omega_eff[j] * t_s[j, pl.ds(c0, C), :],
                    r_old,
                )
                r_s[j, pl.ds(c0, C), :] = r_c
                rr2.append(
                    rr_dot[j] + jnp.sum(rr_s[j, pl.ds(c0, C), :] * r_c)
                )
                rn2.append(rnorm[j] + jnp.sum(r_c * r_c))
            return (tuple(rr2), tuple(rn2))

        rho_next, rr_new = jax.lax.fori_loop(
            0, n_chunks, upd_chunk, (zk, zk)
        )
        mon = tuple(
            jnp.abs(rho_new[j]) if use_implicit else rr_new[j]
            for j in range(k)
        )
        act_new = tuple(act[j] & ~(mon[j] <= scal[j]) for j in range(k))  # NaN: stay active
        itc_new = tuple(
            jnp.where(act[j], it + 1, itc[j]) for j in range(k)
        )
        omega_carry = tuple(
            jnp.where(
                act[j],
                jnp.where(half_done[j], 1.0, omega_eff[j]),
                omega[j],
            )
            for j in range(k)
        )
        rho_carry = tuple(
            jnp.where(act[j], rho_next[j], rho_new[j]) for j in range(k)
        )
        return (it + 1, tuple(rho_new), tuple(alpha_new), omega_carry,
                rho_carry, act_new, itc_new, mon)

    it, _ro, _al, _om, _rn, act, itc, mon = jax.lax.while_loop(
        cond, body,
        (
            jnp.asarray(0, jnp.int32),
            ones,
            ones,
            ones,
            rho0,
            tuple(jnp.asarray(True) for _ in range(k)),
            tuple(jnp.asarray(0, jnp.int32) for _ in range(k)),
            tuple(jnp.float32(jnp.inf) for _ in range(k)),
        ),
    )

    cp_xo = pltpu.make_async_copy(x_s, x_hbm, sems.at[0])
    cp_ro = pltpu.make_async_copy(r_s, r_hbm, sems.at[1])
    cp_xo.start()
    cp_ro.start()
    cp_xo.wait()
    cp_ro.wait()
    stats[0] = it.astype(jnp.float32)
    for j in range(k):
        stats[1 + j] = mon[j]
        stats[1 + k + j] = (mon[j] <= scal[j]).astype(jnp.float32)
        stats[1 + 2 * k + j] = itc[j].astype(jnp.float32)


@logged_kernel
def bicgstab_vmem_solve_multi(diags, offsets, r0_3, x0_3, minv2=None, *,
                              tol_sq_eff, max_iters, use_implicit=False,
                              interpret=False):
    """k-RHS whole-solve BiCGSTAB with per-column stopping.

    r0_3/x0_3: (k, R, 128); tol_sq_eff: (k,).  Returns (x3, iterations,
    monitored_sq (k,), converged (k,))."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    k = r0_3.shape[0]
    qs, _qmin, _halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _bicgstab_multi_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R,
        k=k, use_minv=use_minv, use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((k,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, diags, r0_3, x0_3]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if use_minv:
        args.append(minv2)
    else:
        args.append(jnp.zeros((8, LANES), jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    Rp = R + pad_lo + pad_hi
    x3, _r3, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, R, LANES), r0_3.dtype),
            jax.ShapeDtypeStruct((k, R, LANES), r0_3.dtype),
            jax.ShapeDtypeStruct((1 + 3 * k,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, R, LANES), jnp.float32),   # x
            pltpu.VMEM((k, R, LANES), jnp.float32),   # r
            pltpu.VMEM((k, R, LANES), jnp.float32),   # rr (shadow)
            pltpu.VMEM((k, R, LANES), jnp.float32),   # v
            pltpu.VMEM((k, R, LANES), jnp.float32),   # t
            pltpu.VMEM((k, Rp, LANES), jnp.float32),  # p (halo-padded)
            pltpu.VMEM((k, Rp, LANES), jnp.float32),  # s (halo-padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * (2 * nd + 12) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 4 * k) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    mon = stats[1:1 + k]
    conv = stats[1 + k:1 + 2 * k] > 0
    return x3, it, mon, conv


@logged_kernel
def bicgstab_vmem_solve(diags, offsets, r0_2, x0_2, minv2=None, *,
                        tol_sq_eff, max_iters, use_implicit=False,
                        interpret=False):
    """Run BiCGSTAB to convergence in one Pallas kernel.

    diags: (nd, R, 128) — already minv-column-scaled when preconditioned
    (A@M); r0_2/x0_2: (R, 128) f32; minv2: optional (R, 128) inverse
    diagonal used only for the x update.  Returns
    (x2, iterations, monitored_sq, converged)."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _bicgstab_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R,
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
    if use_minv:
        args.append(minv2)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    else:
        args.append(jnp.zeros((8, LANES), jnp.float32))
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
            pltpu.VMEM((R, LANES), jnp.float32),   # v
            pltpu.VMEM((R, LANES), jnp.float32),   # t
            pltpu.VMEM((Rp, LANES), jnp.float32),  # p (halo-padded)
            pltpu.VMEM((Rp, LANES), jnp.float32),  # s (halo-padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (2 * nd + 12) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 4) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

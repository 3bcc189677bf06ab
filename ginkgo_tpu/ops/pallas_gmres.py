"""Whole-solve fused restarted GMRES(m): every restart cycle inside ONE
Pallas kernel, Krylov basis VMEM-resident.

Reference analog: core/solver/gmres.cpp keeps the (krylov_dim+1)xn basis
in device memory and launches per-iteration kernel sequences
(common_gmres initialize / hessenberg_qr / solve_krylov,
core/solver/common_gmres_kernels.hpp:52-70) with a host-synced stop
check.  The TPU end point of that fusion arc mirrors ops/pallas_cg.py
and ops/pallas_pell_cg.py: when the operator AND the (m+1)-vector basis
fit in VMEM, the entire solve — Arnoldi, CGS2 orthogonalization,
on-the-fly Givens QR, back-substitution, restart — runs on-chip with
zero per-iteration HBM traffic and no dispatch round-trips.

Two operator backends share one core loop (`_gmres_core`):
- Dia: banded diagonals, gather-free shift SpMV (ops/pallas_cg._spmv_chunk)
- Pell: general unstructured slots, in-VMEM dynamic-gather SpMV
  (ops/pallas_pell_cg._make_pell_spmv)

Semantics match solver/gmres.py exactly (left-preconditioned, CGS2, the
in-cycle |g[j+1]| preconditioned-residual check, and the honest outer
re-check on the TRUE residual that can retract a premature stop):
parity-tested against it in tests/test_pallas_gmres.py.

Small state (Hessenberg R factor, Givens cos/sin, g) rides the inner
while_loop carry as (m,)-sized vectors — register/VMEM-resident values,
no SMEM scatter; only tol/cap/stats cross through SMEM.
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
from .pallas_pell_cg import _MAX_SMEM_INTS, _make_pell_spmv
from .spmv_pallas import PAD_PANELS, SUBLANES


# Mosaic TC (probed on the real chip, BENCH r3) implements NEITHER
# scatter NOR value-level dynamic_slice, and ANY 1-D iota-masked select
# SIGABRTs its layout pass — so every small GMRES state vector lives as
# a 2-D (1, n) row (or (n, 1) column) register value, and all dynamic
# indexing is 2-D iota-masked select/reduce (one VREG op at m ~ 30).


def _viota(shape2):
    """Index grid along the non-singleton axis of a 2-D vector."""
    dim = 1 if shape2[0] == 1 else 0
    return jax.lax.broadcasted_iota(jnp.int32, shape2, dim)


def _vset(v2, i, val):
    """v2.at[i].set(val) on a 2-D (1, n)/(n, 1) vector, scatter-free."""
    return jnp.where(_viota(v2.shape) == i, val, v2)


def _vget(v2, i):
    """v2[i] for traced i on a 2-D vector: masked reduction to scalar."""
    return jnp.sum(jnp.where(_viota(v2.shape) == i, v2, 0.0))


def _set2(mat, r, c, val):
    """mat.at[r, c].set(val) without scatter (2-D iota-masked select)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 1)
    return jnp.where((ri == r) & (ci == c), val, mat)


def gmres_vmem_fits(nd: int, R: int, m: int, diag_itemsize: int = 4,
                    use_minv: bool = False, halo_rows: int = 0,
                    basis_itemsize: int = 4) -> bool:
    """Dia working set: diags + (m+1) basis frames (at the CB-GMRES
    storage width) + x/b/u frames + the halo-padded SpMV source frame +
    minv when present."""
    frame = R * LANES * 4
    vec_frames = (
        (m + 1) * basis_itemsize / 4 + 3.25 + halo_rows / max(R, 1)
        + (1 if use_minv else 0)
    )
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def pell_gmres_vmem_fits(n_slots: int, NT: int, m: int,
                         val_itemsize: int, q_itemsize: int = 4,
                         n_steps: int = 0, use_minv: bool = False,
                         basis_itemsize: int = 4) -> bool:
    """Pell working set: slot values + lane indices + (m+1) basis frames
    + x/b/u frames + the panel-padded SpMV source + SMEM scalar maps."""
    if n_steps + n_slots > _MAX_SMEM_INTS:
        return False
    Rf = NT * SUBLANES
    slot_bytes = n_slots * SUBLANES * LANES * (val_itemsize + q_itemsize)
    frame = Rf * LANES * 4
    vec_frames = (
        (m + 1) * basis_itemsize / 4 + 3.25
        + (2 * PAD_PANELS + 1) / max(Rf, 1) + (1 if use_minv else 0)
    )
    return slot_bytes + vec_frames * frame <= cg_vmem_budget_bytes()


def _gmres_core(tol_sq, max_iters, b_hbm, x0_hbm, x_hbm, stats, x_s, b_s,
                u_s, src_pad, V_s, minv, sems, *, R, m, use_minv,
                stage_off, pad_rows, spmv_into):
    """Shared GMRES loop over an opaque SpMV.

    src_pad: (R + pad_rows, 128) staging buffer — frame row c lives at
    src_pad[stage_off + c]; spmv_into(dst_ref) computes A @ staged into
    the (R, 128) dst ref.  All other state is operator-independent."""
    C = _chunk_rows(R)
    n_chunks = R // C
    Rp = R + pad_rows

    cp_b = pltpu.make_async_copy(b_hbm, b_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_b.start()
    cp_x.start()
    cp_b.wait()
    cp_x.wait()

    if stage_off:
        src_pad[0:stage_off] = jnp.zeros((stage_off, LANES), jnp.float32)
    if pad_rows - stage_off:
        src_pad[stage_off + R:Rp] = jnp.zeros(
            (pad_rows - stage_off, LANES), jnp.float32
        )

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    def stage_x(_=None):
        def cp(c, _):
            c0 = c * C
            src_pad[pl.ds(stage_off + c0, C), :] = x_s[pl.ds(c0, C), :]
            return 0
        jax.lax.fori_loop(0, n_chunks, cp, 0)

    def residual_into_u(_=None):
        """u = b - A x (x staged); returns true r.r."""
        spmv_into(u_s)

        def rchunk(c, rr):
            c0 = c * C
            r_c = b_s[pl.ds(c0, C), :] - u_s[pl.ds(c0, C), :]
            u_s[pl.ds(c0, C), :] = r_c
            return rr + jnp.sum(r_c * r_c)

        return jax.lax.fori_loop(0, n_chunks, rchunk, jnp.float32(0))

    def basis_row_chunk(i, c0):
        # bf16 basis storage (CB-GMRES reduce1/reduce2 float modes,
        # cb_gmres_accessor.hpp:87-97): stored at V_s.dtype, arithmetic
        # in f32 — the astype is a free VPU convert on read
        return V_s[pl.ds(i, 1), pl.ds(c0, C), :][0].astype(jnp.float32)

    stage_x()
    rr0 = residual_into_u()

    def cycle_cond(st):
        it, rr, done = st
        return (~done) & (it < max_iters)

    def cycle_body(st):
        it, rr, _ = st

        # ---- initialize: z = M u (u holds the true residual), V0 = z/beta
        def znorm_chunk(c, acc):
            c0 = c * C
            z_c = mchunk(c0) * u_s[pl.ds(c0, C), :] if use_minv else (
                u_s[pl.ds(c0, C), :]
            )
            return acc + jnp.sum(z_c * z_c)

        beta_sq = jax.lax.fori_loop(0, n_chunks, znorm_chunk,
                                    jnp.float32(0))
        beta = jnp.sqrt(beta_sq)
        inv_beta = jnp.where(beta > 0, 1.0 / jnp.where(beta > 0, beta, 1.0),
                             1.0)

        def v0_chunk(c, _):
            c0 = c * C
            z_c = mchunk(c0) * u_s[pl.ds(c0, C), :] if use_minv else (
                u_s[pl.ds(c0, C), :]
            )
            V_s[pl.ds(0, 1), pl.ds(c0, C), :] = (
                (z_c * inv_beta)[None].astype(V_s.dtype)
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, v0_chunk, 0)

        g0 = _vset(jnp.zeros((1, m + 1), jnp.float32), 0, beta)
        cs0 = jnp.zeros((1, m), jnp.float32)
        sn0 = jnp.zeros((1, m), jnp.float32)
        # R factor stored TRANSPOSED (m, m+1): column j of R is row j
        # here, so the per-step write is a broadcast row-masked select
        Rm0 = jnp.zeros((m, m + 1), jnp.float32)

        # ---- inner Arnoldi loop (early exit on the |g[j+1]| estimate) --
        def arnoldi_cond(ast):
            j, it_a, g, cs, sn, Rm, active = ast
            return active & (j < m)

        def arnoldi_body(ast):
            j, it_a, g, cs, sn, Rm, _ = ast

            # stage V[j], u <- M (A V[j])
            def stage_vj(c, _):
                c0 = c * C
                src_pad[pl.ds(stage_off + c0, C), :] = basis_row_chunk(
                    j, c0
                )
                return 0

            jax.lax.fori_loop(0, n_chunks, stage_vj, 0)
            spmv_into(u_s)
            if use_minv:
                def prec_chunk(c, _):
                    c0 = c * C
                    u_s[pl.ds(c0, C), :] = mchunk(c0) * u_s[pl.ds(c0, C), :]
                    return 0

                jax.lax.fori_loop(0, n_chunks, prec_chunk, 0)

            # CGS2: two (dot-all, subtract-all) passes against rows 0..j
            def gs_pass(h_acc):
                def dot_i(i, h):
                    def dchunk(c, s):
                        c0 = c * C
                        return s + jnp.sum(
                            basis_row_chunk(i, c0) * u_s[pl.ds(c0, C), :]
                        )
                    s = jax.lax.fori_loop(0, n_chunks, dchunk,
                                          jnp.float32(0))
                    return _vset(h, i, s)

                h = jax.lax.fori_loop(0, j + 1, dot_i,
                                      jnp.zeros((1, m + 1), jnp.float32))

                def sub_i(i, _):
                    hi = _vget(h, i)

                    def schunk(c, _):
                        c0 = c * C
                        u_s[pl.ds(c0, C), :] = (
                            u_s[pl.ds(c0, C), :]
                            - hi * basis_row_chunk(i, c0)
                        )
                        return 0

                    jax.lax.fori_loop(0, n_chunks, schunk, 0)
                    return 0

                jax.lax.fori_loop(0, j + 1, sub_i, 0)
                return h_acc + h

            h = gs_pass(jnp.zeros((1, m + 1), jnp.float32))
            h = gs_pass(h)

            def unorm_chunk(c, s):
                c0 = c * C
                u_c = u_s[pl.ds(c0, C), :]
                return s + jnp.sum(u_c * u_c)

            hnext = jnp.sqrt(
                jax.lax.fori_loop(0, n_chunks, unorm_chunk, jnp.float32(0))
            )
            inv_h = jnp.where(hnext > 0,
                              1.0 / jnp.where(hnext > 0, hnext, 1.0), 1.0)

            def store_next(c, _):
                c0 = c * C
                V_s[pl.ds(j + 1, 1), pl.ds(c0, C), :] = (
                    u_s[pl.ds(c0, C), :] * inv_h
                )[None].astype(V_s.dtype)
                return 0

            jax.lax.fori_loop(0, n_chunks, store_next, 0)

            # Givens chain on the new Hessenberg column (real arithmetic)
            h = _vset(h, j + 1, hnext)

            def rot(i, hv):
                use = i < j
                hi, hi1 = _vget(hv, i), _vget(hv, i + 1)
                c_, s_ = _vget(cs, i), _vget(sn, i)
                new_i = jnp.where(use, c_ * hi + s_ * hi1, hi)
                new_i1 = jnp.where(use, -s_ * hi + c_ * hi1, hi1)
                return _vset(_vset(hv, i, new_i), i + 1, new_i1)

            h = jax.lax.fori_loop(0, m, rot, h)
            a_, b_ = _vget(h, j), _vget(h, j + 1)
            denom = jnp.sqrt(a_ * a_ + b_ * b_)
            safe_d = jnp.where(denom > 0, denom, 1.0)
            c_new = jnp.where(denom > 0, jnp.abs(a_) / safe_d, 1.0)
            phase = jnp.where(jnp.abs(a_) > 0, jnp.sign(a_), 1.0)
            s_new = jnp.where(denom > 0, phase * b_ / safe_d, 0.0)
            h_rot = _vset(_vset(h, j, c_new * a_ + s_new * b_),
                          j + 1, 0.0)
            gj = _vget(g, j)
            g_new = _vset(_vset(g, j + 1, -s_new * gj), j, c_new * gj)
            # write column j of R = row j of the transposed store:
            # (1, m+1) h_rot broadcasts across the masked row
            ri_T = jax.lax.broadcasted_iota(jnp.int32, Rm.shape, 0)
            Rm_new = jnp.where(ri_T == j, h_rot, Rm)
            cs_new = _vset(cs, j, c_new)
            sn_new = _vset(sn, j, s_new)
            it_n = it_a + 1
            gj1 = _vget(g_new, j + 1)
            res_sq = gj1 * gj1
            active = ~(res_sq <= tol_sq) & (it_n < max_iters)  # NaN: keep going
            return (j + 1, it_n, g_new, cs_new, sn_new, Rm_new, active)

        j, it, g, cs, sn, Rm, _ = jax.lax.while_loop(
            arnoldi_cond, arnoldi_body,
            (jnp.int32(0), it, g0, cs0, sn0, Rm0, ~(rr <= tol_sq)),
        )
        steps = j  # columns taken this cycle

        # ---- back-substitution: y = R^{-1} g on the first `steps` cols
        ri_T = jax.lax.broadcasted_iota(jnp.int32, (m, m + 1), 0)
        ci_T = jax.lax.broadcasted_iota(jnp.int32, (m, m + 1), 1)

        def bsub(t, y):
            i = steps - 1 - t
            # acc = sum_{k>i} R[i, k] y[k] = sum_{k>i} RmT[k, i] y[k];
            # y[k] is zero for k >= steps, so masking k > i suffices
            acc = jnp.sum(jnp.where(
                (ci_T == i) & (ri_T > i), Rm * y, 0.0
            ))
            diag = jnp.sum(jnp.where((ci_T == i) & (ri_T == i), Rm, 0.0))
            safe = jnp.where(diag != 0, diag, 1.0)
            yi = jnp.where(diag != 0, (_vget(g, i) - acc) / safe, 0.0)
            return _vset(y, i, jnp.where(i >= 0, yi, 0.0))

        y = jax.lax.fori_loop(0, steps, bsub,
                              jnp.zeros((m, 1), jnp.float32))

        # ---- x += V[:steps]^T y ----------------------------------------
        def xup_chunk(c, _):
            c0 = c * C

            def add_i(i, acc):
                return acc + _vget(y, i) * basis_row_chunk(i, c0)

            acc = jax.lax.fori_loop(
                0, steps, add_i, x_s[pl.ds(c0, C), :]
            )
            x_s[pl.ds(c0, C), :] = acc
            return 0

        jax.lax.fori_loop(0, n_chunks, xup_chunk, 0)

        # ---- honest outer check on the TRUE residual -------------------
        stage_x()
        rr_new = residual_into_u()
        done = (rr_new <= tol_sq) & (tol_sq >= 0)
        return (it, rr_new, done)

    it, rr, done = jax.lax.while_loop(
        cycle_cond, cycle_body,
        (jnp.int32(0), rr0, (rr0 <= tol_sq) & (tol_sq >= 0)),
    )

    cp_xo = pltpu.make_async_copy(x_s, x_hbm, sems.at[0])
    cp_xo.start()
    cp_xo.wait()
    stats[0] = it.astype(jnp.float32)
    stats[1] = rr
    stats[2] = done.astype(jnp.float32)


def gmres_multi_vmem_fits(nd: int, R: int, m: int, k: int,
                          diag_itemsize: int = 4, use_minv: bool = False,
                          halo_rows: int = 0,
                          basis_itemsize: int = 4) -> bool:
    """k-RHS Dia working set: diags + k x ((m+1) basis frames + x/b/u +
    halo-padded staging) + minv."""
    frame = R * LANES * 4
    vec_frames = k * (
        (m + 1) * basis_itemsize / 4 + 3.25 + halo_rows / max(R, 1)
    ) + (1 if use_minv else 0)
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _gmres_multi_dia_kernel(scal, iscal, diags, b_hbm, x0_hbm, minv,
                            x_hbm, stats, x_s, b_s, u_s, w_s, V_s, sems,
                            *, qs, pad_lo, pad_hi, R, m, k, use_minv):
    """k-RHS whole-solve GMRES(m) with PER-COLUMN stopping — the
    reference's per-column Givens/Hessenberg state and
    stopping_status-masked updates (gmres.cpp:153-165, one
    givens_sin/cos/residual_norm column per RHS) run entirely in-kernel:
    columns share the Arnoldi step counter j but carry independent
    g/cs/sn/R factors, a converged column's basis/QR/x updates freeze,
    and each column back-substitutes over its own step count (rows past
    it have a zero R diagonal, which the guarded back-substitution maps
    to y = 0).  scal: SMEM (k,) squared tolerances; stats out: SMEM
    (1+3k,) [iters, mon_j..., conv_j..., stop_iter_j...]."""
    from .pallas_cg import _chunk_rows_multi, _spmv_chunk_multi

    max_iters = iscal[0]
    Rp = R + pad_lo + pad_hi
    C = _chunk_rows_multi(R, k)
    n_chunks = R // C

    cp_b = pltpu.make_async_copy(b_hbm, b_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_b.start()
    cp_x.start()
    cp_b.wait()
    cp_x.wait()

    for col in range(k):
        if pad_lo:
            w_s[col, 0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
        if pad_hi:
            w_s[col, Rp - pad_hi:Rp] = jnp.zeros(
                (pad_hi, LANES), jnp.float32
            )

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    def stage_x():
        def cp(c, _):
            c0 = c * C
            for col in range(k):
                w_s[col, pl.ds(pad_lo + c0, C), :] = (
                    x_s[col, pl.ds(c0, C), :]
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, cp, 0)

    def residual_into_u():
        """u = b - A x (x staged); returns per-column true r.r tuple."""
        def rchunk(c, rr):
            c0 = c * C
            ax = _spmv_chunk_multi(diags, w_s, c0, C, qs=qs,
                                   pad_lo=pad_lo, k=k)
            out = []
            for col in range(k):
                r_c = b_s[col, pl.ds(c0, C), :] - ax[col]
                u_s[col, pl.ds(c0, C), :] = r_c
                out.append(rr[col] + jnp.sum(r_c * r_c))
            return tuple(out)

        zk = tuple(jnp.float32(0) for _ in range(k))
        return jax.lax.fori_loop(0, n_chunks, rchunk, zk)

    def basis_row(col, i, c0):
        return V_s[col, pl.ds(i, 1), pl.ds(c0, C), :][0].astype(
            jnp.float32
        )

    stage_x()
    rr0 = residual_into_u()

    def col_tol(col):
        return scal[col]

    done0 = tuple(rr0[col] <= col_tol(col) for col in range(k))

    def cycle_cond(st):
        it = st[0]
        done = st[2]
        all_done = done[0]
        for col in range(1, k):
            all_done = all_done & done[col]
        return (~all_done) & (it < max_iters)

    def cycle_body(st):
        it, rr, done, itc = st

        # ---- initialize each active column: V0 = M u / ||M u|| --------
        def znorm_chunk(c, acc):
            c0 = c * C
            out = []
            for col in range(k):
                z_c = (
                    mchunk(c0) * u_s[col, pl.ds(c0, C), :]
                    if use_minv else u_s[col, pl.ds(c0, C), :]
                )
                out.append(acc[col] + jnp.sum(z_c * z_c))
            return tuple(out)

        zk = tuple(jnp.float32(0) for _ in range(k))
        beta_sq = jax.lax.fori_loop(0, n_chunks, znorm_chunk, zk)
        beta = [jnp.sqrt(beta_sq[col]) for col in range(k)]
        inv_beta = [
            jnp.where(beta[col] > 0,
                      1.0 / jnp.where(beta[col] > 0, beta[col], 1.0), 1.0)
            for col in range(k)
        ]

        def v0_chunk(c, _):
            c0 = c * C
            for col in range(k):
                z_c = (
                    mchunk(c0) * u_s[col, pl.ds(c0, C), :]
                    if use_minv else u_s[col, pl.ds(c0, C), :]
                )
                V_s[col, pl.ds(0, 1), pl.ds(c0, C), :] = (
                    (z_c * inv_beta[col])[None].astype(V_s.dtype)
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, v0_chunk, 0)

        g0 = jnp.zeros((k, m + 1), jnp.float32)
        for col in range(k):
            g0 = _set2(g0, col, 0, beta[col])
        cs0 = jnp.zeros((k, m), jnp.float32)
        sn0 = jnp.zeros((k, m), jnp.float32)
        # per-column TRANSPOSED R factors (m, m+1) — static tuple, all
        # dynamic indexing stays 2-D (Mosaic layout constraint)
        Rm0 = tuple(
            jnp.zeros((m, m + 1), jnp.float32) for _ in range(k)
        )
        act0 = tuple(~done[col] for col in range(k))

        # ---- inner Arnoldi loop: shared j, per-column masked QR --------
        def arnoldi_cond(ast):
            j, it_a = ast[0], ast[1]
            act = ast[6]
            any_act = act[0]
            for col in range(1, k):
                any_act = any_act | act[col]
            return any_act & (j < m)

        def arnoldi_body(ast):
            j, it_a, g, cs, sn, Rm, act, itc_a = ast

            # stage V[:, j], u <- M (A V[:, j])
            def stage_vj(c, _):
                c0 = c * C
                for col in range(k):
                    w_s[col, pl.ds(pad_lo + c0, C), :] = basis_row(
                        col, j, c0
                    )
                return 0

            jax.lax.fori_loop(0, n_chunks, stage_vj, 0)

            def spmv_chunk(c, _):
                c0 = c * C
                av = _spmv_chunk_multi(diags, w_s, c0, C, qs=qs,
                                       pad_lo=pad_lo, k=k)
                for col in range(k):
                    u_c = mchunk(c0) * av[col] if use_minv else av[col]
                    u_s[col, pl.ds(c0, C), :] = u_c
                return 0

            jax.lax.fori_loop(0, n_chunks, spmv_chunk, 0)

            # CGS2 per column: two (dot-all, subtract-all) passes
            def gs_pass(h_acc):
                def dot_i(i, h):
                    def dchunk(c, s):
                        c0 = c * C
                        out = []
                        for col in range(k):
                            out.append(s[col] + jnp.sum(
                                basis_row(col, i, c0)
                                * u_s[col, pl.ds(c0, C), :]
                            ))
                        return tuple(out)

                    s = jax.lax.fori_loop(0, n_chunks, dchunk, zk)
                    for col in range(k):
                        h = _set2(h, col, i, s[col])
                    return h

                h = jax.lax.fori_loop(
                    0, j + 1, dot_i, jnp.zeros((k, m + 1), jnp.float32)
                )

                def sub_i(i, _):
                    def schunk(c, _):
                        c0 = c * C
                        for col in range(k):
                            u_s[col, pl.ds(c0, C), :] = (
                                u_s[col, pl.ds(c0, C), :]
                                - _vget(h[col:col + 1], i)
                                * basis_row(col, i, c0)
                            )
                        return 0

                    jax.lax.fori_loop(0, n_chunks, schunk, 0)
                    return 0

                jax.lax.fori_loop(0, j + 1, sub_i, 0)
                return h_acc + h

            h = gs_pass(jnp.zeros((k, m + 1), jnp.float32))
            h = gs_pass(h)

            def unorm_chunk(c, s):
                c0 = c * C
                out = []
                for col in range(k):
                    u_c = u_s[col, pl.ds(c0, C), :]
                    out.append(s[col] + jnp.sum(u_c * u_c))
                return tuple(out)

            un = jax.lax.fori_loop(0, n_chunks, unorm_chunk, zk)
            hnext = [jnp.sqrt(un[col]) for col in range(k)]
            inv_h = [
                jnp.where(hnext[col] > 0,
                          1.0 / jnp.where(hnext[col] > 0, hnext[col], 1.0),
                          1.0)
                for col in range(k)
            ]

            def store_next(c, _):
                c0 = c * C
                for col in range(k):
                    V_s[col, pl.ds(j + 1, 1), pl.ds(c0, C), :] = (
                        u_s[col, pl.ds(c0, C), :] * inv_h[col]
                    )[None].astype(V_s.dtype)
                return 0

            jax.lax.fori_loop(0, n_chunks, store_next, 0)

            # per-column Givens chain; stopped columns keep their factors
            g_n, cs_n, sn_n, Rm_n = g, cs, sn, Rm
            act_new, itc_new = [], []
            it_n = it_a + 1
            for col in range(k):
                hv = _vset(h[col:col + 1], j + 1, hnext[col])

                def rot(i, hv, col=col):
                    use = i < j
                    hi, hi1 = _vget(hv, i), _vget(hv, i + 1)
                    c_ = _vget(cs[col:col + 1], i)
                    s_ = _vget(sn[col:col + 1], i)
                    new_i = jnp.where(use, c_ * hi + s_ * hi1, hi)
                    new_i1 = jnp.where(use, -s_ * hi + c_ * hi1, hi1)
                    return _vset(_vset(hv, i, new_i), i + 1, new_i1)

                hv = jax.lax.fori_loop(0, m, rot, hv)
                a_, b_ = _vget(hv, j), _vget(hv, j + 1)
                denom = jnp.sqrt(a_ * a_ + b_ * b_)
                safe_d = jnp.where(denom > 0, denom, 1.0)
                c_new = jnp.where(denom > 0, jnp.abs(a_) / safe_d, 1.0)
                phase = jnp.where(jnp.abs(a_) > 0, jnp.sign(a_), 1.0)
                s_new = jnp.where(denom > 0, phase * b_ / safe_d, 0.0)
                h_rot = _vset(_vset(hv, j, c_new * a_ + s_new * b_),
                              j + 1, 0.0)
                g_cj = _vget(g[col:col + 1], j)
                gj1 = -s_new * g_cj
                gj = c_new * g_cj
                a = act[col]
                g_cj1 = _vget(g[col:col + 1], j + 1)
                g_n = _set2(
                    _set2(g_n, col, j + 1, jnp.where(a, gj1, g_cj1)),
                    col, j, jnp.where(a, gj, g_cj),
                )
                cs_n = _set2(cs_n, col, j,
                             jnp.where(a, c_new, _vget(cs[col:col + 1], j)))
                sn_n = _set2(sn_n, col, j,
                             jnp.where(a, s_new, _vget(sn[col:col + 1], j)))
                # column j of each R factor is written at most once (at
                # step j), so writing zeros for a stopped column equals
                # keeping its (never-written) old values
                new_col = jnp.where(a, h_rot, 0.0)  # (1, m+1)
                ri_T = jax.lax.broadcasted_iota(
                    jnp.int32, Rm_n[col].shape, 0
                )
                Rm_n = tuple(
                    jnp.where(ri_T == j, new_col, Rm_n[c2])
                    if c2 == col else Rm_n[c2]
                    for c2 in range(k)
                )
                res_sq = gj1 * gj1
                still = a & ~(res_sq <= col_tol(col)) & (it_n < max_iters)  # NaN: stay active
                act_new.append(still)
                itc_new.append(jnp.where(a, it_n, itc_a[col]))
            return (j + 1, it_n, g_n, cs_n, sn_n, Rm_n,
                    tuple(act_new), tuple(itc_new))

        j, it, g, cs, sn, Rm, _act, itc = jax.lax.while_loop(
            arnoldi_cond, arnoldi_body,
            (jnp.int32(0), it, g0, cs0, sn0, Rm0, act0, itc),
        )

        # ---- guarded back-substitution over the full m (rows past a
        # column's own step count have R diag 0 -> y = 0); per-column
        # (m, 1) solves, all masks 2-D over the transposed R factors
        ri_T = jax.lax.broadcasted_iota(jnp.int32, (m, m + 1), 0)
        ci_T = jax.lax.broadcasted_iota(jnp.int32, (m, m + 1), 1)

        def bsub(t, y):
            i = jnp.asarray(m - 1 - t, jnp.int32)  # x64-safe index
            out = []
            for col in range(k):
                yc = y[col]
                acc = jnp.sum(jnp.where(
                    (ci_T == i) & (ri_T > i), Rm[col] * yc, 0.0
                ))
                diag = jnp.sum(jnp.where(
                    (ci_T == i) & (ri_T == i), Rm[col], 0.0
                ))
                gcol = _vget(g[col:col + 1], i)
                safe = jnp.where(diag != 0, diag, 1.0)
                yi = jnp.where(diag != 0, (gcol - acc) / safe, 0.0)
                out.append(_vset(yc, i, yi))
            return tuple(out)

        y = jax.lax.fori_loop(
            0, m, bsub,
            tuple(jnp.zeros((m, 1), jnp.float32) for _ in range(k)),
        )
        # a column already done at cycle start gets a zero update
        y = tuple(
            jnp.where(done[col], 0.0, y[col]) for col in range(k)
        )

        # ---- x += V^T y (y is zero past each column's step count) -----
        def xup_chunk(c, _):
            c0 = c * C
            for col in range(k):
                def add_i(i, acc, col=col):
                    return acc + _vget(y[col], i) * basis_row(col, i, c0)

                x_s[col, pl.ds(c0, C), :] = jax.lax.fori_loop(
                    0, j, add_i, x_s[col, pl.ds(c0, C), :]
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, xup_chunk, 0)

        # ---- honest outer check on the TRUE residual per column --------
        stage_x()
        rr_new = residual_into_u()
        done_new = tuple(
            done[col] | (rr_new[col] <= col_tol(col)) for col in range(k)
        )
        rr_keep = tuple(
            jnp.where(done[col], rr[col], rr_new[col]) for col in range(k)
        )
        return (it, rr_keep, done_new, itc)

    itc0 = tuple(jnp.asarray(0, jnp.int32) for _ in range(k))
    it, rr, done, itc = jax.lax.while_loop(
        cycle_cond, cycle_body, (jnp.int32(0), rr0, done0, itc0)
    )

    cp_xo = pltpu.make_async_copy(x_s, x_hbm, sems.at[0])
    cp_xo.start()
    cp_xo.wait()
    stats[0] = it.astype(jnp.float32)
    for col in range(k):
        stats[1 + col] = rr[col]
        stats[1 + k + col] = done[col].astype(jnp.float32)
        stats[1 + 2 * k + col] = itc[col].astype(jnp.float32)


@logged_kernel
def gmres_vmem_solve_multi(diags, offsets, b3, x0_3, minv2=None, *, m,
                           tol_sq_eff, max_iters,
                           basis_dtype=jnp.float32, interpret=False):
    """k-RHS whole-solve restarted GMRES(m) with per-column stopping.

    b3/x0_3: (k, R, 128); tol_sq_eff: (k,) squared ABSOLUTE thresholds.
    Returns (x3, iterations, true_rr (k,), converged (k,))."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    k = b3.shape[0]
    qs, _qmin, _halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _gmres_multi_dia_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi,
        R=R, m=int(m), k=k, use_minv=use_minv,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((k,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, diags, b3, x0_3,
            minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    Rp = R + pad_lo + pad_hi
    x3, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, R, LANES), b3.dtype),
            jax.ShapeDtypeStruct((1 + 3 * k,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k, R, LANES), jnp.float32),        # x
            pltpu.VMEM((k, R, LANES), jnp.float32),        # b
            pltpu.VMEM((k, R, LANES), jnp.float32),        # u
            pltpu.VMEM((k, Rp, LANES), jnp.float32),       # staging
            pltpu.VMEM((k, int(m) + 1, R, LANES), basis_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * (nd + 4 * m) * R * LANES * int(max_iters),
            bytes_accessed=(nd + k * (m + 4)) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    rr = stats[1:1 + k]
    conv = stats[1 + k:1 + 2 * k] > 0
    return x3, it, rr, conv


def _gmres_dia_kernel(scal, iscal, diags, b_hbm, x0_hbm, minv, x_hbm,
                      stats, x_s, b_s, u_s, w_s, V_s, sems, *, qs, pad_lo,
                      pad_hi, R, m, use_minv):
    C = _chunk_rows(R)
    n_chunks = R // C

    def spmv_into(dst):
        def qchunk(c, _):
            c0 = c * C
            dst[pl.ds(c0, C), :] = _spmv_chunk(
                diags, w_s, c0, C, qs=qs, pad_lo=pad_lo
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, qchunk, 0)

    _gmres_core(
        scal[0], iscal[0], b_hbm, x0_hbm, x_hbm, stats, x_s, b_s, u_s,
        w_s, V_s, minv, sems, R=R, m=m, use_minv=use_minv,
        stage_off=pad_lo, pad_rows=pad_lo + pad_hi, spmv_into=spmv_into,
    )


def _gmres_pell_kernel(scal, iscal, tiles, bases, vals, qidx, b_hbm,
                       x0_hbm, minv, x_hbm, stats, x_s, b_s, u_s, p_s,
                       V_s, sems, *, G, n_steps, Rf, m, use_minv):
    C = _chunk_rows(Rf)
    n_chunks = Rf // C
    spmv = _make_pell_spmv(
        tiles, bases, vals, qidx, G=G, n_steps=n_steps, C=C,
        n_chunks=n_chunks,
    )

    def spmv_into(dst):
        spmv(p_s, dst)

    _gmres_core(
        scal[0], iscal[0], b_hbm, x0_hbm, x_hbm, stats, x_s, b_s, u_s,
        p_s, V_s, minv, sems, R=Rf, m=m, use_minv=use_minv,
        stage_off=PAD_PANELS, pad_rows=2 * PAD_PANELS + 1,
        spmv_into=spmv_into,
    )


@logged_kernel
def gmres_vmem_solve(diags, offsets, b2, x0_2, minv2=None, *, m,
                     tol_sq_eff, max_iters, basis_dtype=jnp.float32,
                     interpret=False):
    """Run restarted GMRES(m) to convergence in one Pallas kernel on a
    Dia operator.

    diags: (nd, R, 128) f32/bf16; b2/x0_2: (R, 128) f32 right-hand side
    and initial guess; minv2: optional inverse-diagonal frame (left
    scalar-Jacobi preconditioning, matching solver/gmres.py).
    tol_sq_eff: squared ABSOLUTE threshold on the residual norms (both
    the in-cycle preconditioned estimate and the outer true residual);
    negative -> run to max_iters.  Returns (x2, iters, true_rr,
    converged)."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _gmres_dia_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R,
        m=int(m), use_minv=use_minv,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, diags, b2, x0_2,
            minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    Rp = R + pad_lo + pad_hi
    x2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, LANES), b2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.float32),        # x
            pltpu.VMEM((R, LANES), jnp.float32),        # b
            pltpu.VMEM((R, LANES), jnp.float32),        # u (w / r)
            pltpu.VMEM((Rp, LANES), jnp.float32),       # SpMV source
            pltpu.VMEM((int(m) + 1, R, LANES), basis_dtype),  # basis
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nd + 4 * m) * R * LANES * int(max_iters),
            bytes_accessed=(nd + m + 4) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


@logged_kernel
def pell_gmres_vmem_solve(A, b2, x0_2, minv2=None, *, m, tol_sq_eff,
                          max_iters, basis_dtype=jnp.float32,
                          interpret=False):
    """Run restarted GMRES(m) to convergence in one Pallas kernel on a
    GENERAL unstructured (Pell) operator.

    A: matrix.pell.Pell (S=8 layout); b2/x0_2: (Rf, 128) f32 frames with
    Rf = A.NT * 8; minv2: optional (Rf, 128) inverse diagonal.  Returns
    (x2, iters, true_rr, converged)."""
    Rf = A.NT * SUBLANES
    assert b2.shape == (Rf, LANES)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _gmres_pell_kernel, G=A.G, n_steps=A.n_steps, Rf=Rf, m=int(m),
        use_minv=use_minv,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    qidx = A.qidx  # int8 storage stays resident; the kernel widens in-register
    args = [
        scal, iscal,
        A.tile_of_step.astype(jnp.int32), A.bases.astype(jnp.int32),
        A.values, qidx, b2, x0_2,
        minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_of_step
        pl.BlockSpec(memory_space=pltpu.SMEM),  # bases
        pl.BlockSpec(memory_space=pltpu.VMEM),  # values (resident)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # qidx (resident)
        pl.BlockSpec(memory_space=pl.ANY),      # b -> DMA
        pl.BlockSpec(memory_space=pl.ANY),      # x0 -> DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),  # minv / placeholder
    ]
    Rp = Rf + 2 * PAD_PANELS + 1
    x2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rf, LANES), b2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rf, LANES), jnp.float32),       # x
            pltpu.VMEM((Rf, LANES), jnp.float32),       # b
            pltpu.VMEM((Rf, LANES), jnp.float32),       # u
            pltpu.VMEM((Rp, LANES), jnp.float32),       # SpMV source
            pltpu.VMEM((int(m) + 1, Rf, LANES), basis_dtype),  # basis
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (A.values.size + 4 * m * Rf * LANES)
            * int(max_iters),
            bytes_accessed=A.values.size
            * (A.values.dtype.itemsize + 4) + (m + 4) * Rf * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

"""Whole-solve fused CG for GENERAL unstructured matrices (PELL plan).

The arc completed: ops/pallas_cg.py fuses the entire CG loop into one
kernel for banded (Dia) operators; this module does the same for
arbitrary sparsity via the PELL layout (ops/spmv_pallas.py) — the
operator's slot values + packed lane indices live in VMEM alongside the
Krylov vectors, so a full conjugate-gradient solve on an *unstructured*
matrix runs with ZERO per-iteration HBM traffic.  The reference's
closest analog is still a per-iteration sequence of 5+ kernel launches
with full HBM passes (core/solver/cg.cpp:148-190); no GPU-side
equivalent of a VMEM/SMEM-resident whole solve exists there.

Capacity: a poisson-2d 1M-row plan (inflation ~1.6, f32 values + int32
lane indices) is ~66 MB of slots + ~20 MB of vectors — inside the 116 MB
budget; bf16 values / int8 indices stretch this ~2.7x.

Layout recap (ops/spmv_pallas.py): output rows tile as (8, 128) per
1024; a slot is one (values, lane-index) (8, 128) tile pair plus a panel
base b; q[s, :] gathers from panel b + s of the padded x.  In-kernel the
search direction p is kept directly in PELL panel layout — a
(Rf + 15, 128) scratch whose row j + 7 is panel j — so the slot SpMV is
one dynamic 8-row slice + one `tpu.dynamic_gather`, identical to the
streaming kernel but reading p from on-chip memory.

Stop semantics mirror ops/pallas_cg._cg_kernel exactly (first iteration
unconditional, exact r.r or pre-update |rho| monitored).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

from .pallas_cg import _chunk_rows, _sdiv, cg_vmem_budget_bytes
from .spmv_pallas import PAD_PANELS, SUBLANES

LANES = 128

# scalar maps (tile_of_step + bases) ride SMEM inputs; stay well under
# the ~256 KB SMEM budget
_MAX_SMEM_INTS = 48 * 1024


def pell_cg_vmem_fits(n_slots: int, NT: int, val_itemsize: int,
                      q_itemsize: int = 4, n_steps: int = 0,
                      use_minv: bool = False) -> bool:
    """Working set: slot values + lane indices, x/r/q frames, the
    panel-padded p scratch (+ minv), and the SMEM scalar maps."""
    if n_steps + n_slots > _MAX_SMEM_INTS:
        return False
    Rf = NT * SUBLANES
    slot_bytes = n_slots * SUBLANES * LANES * (val_itemsize + q_itemsize)
    frame = Rf * LANES * 4
    vec_frames = 4.5 + (2 * PAD_PANELS + 1) / max(Rf, 1) + (
        1 if use_minv else 0
    )
    return slot_bytes + vec_frames * frame <= cg_vmem_budget_bytes()


def _make_pell_spmv(tiles, bases, vals, qidx, *, G, n_steps, C, n_chunks):
    """In-kernel slot-loop SpMV factory: dst = A @ src_pad, where src_pad
    is a panel-padded (.., 128) VMEM ref (panel j at row j + PAD_PANELS)
    and dst a (Rf, 128) VMEM ref.  The PELL streaming kernel's body with
    all operands read from on-chip memory."""

    def spmv(src_pad, dst):
        def zq(c, _):
            dst[pl.ds(c * C, C), :] = jnp.zeros((C, LANES), jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_chunks, zq, 0)

        def step_fn(i, _):
            t = tiles[i]
            acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
            for g in range(G):
                slot = i * G + g
                W = src_pad[pl.ds(bases[slot], SUBLANES), :]
                qv = qidx[pl.ds(slot, 1)][0]
                if qv.dtype != jnp.int32:
                    qv = qv.astype(jnp.int32)  # int8 stays VMEM-resident
                gth = jnp.take_along_axis(
                    W, qv, axis=1, mode="promise_in_bounds"
                )
                acc = acc + vals[pl.ds(slot, 1)][0].astype(jnp.float32) * gth
            base_row = t * SUBLANES
            dst[pl.ds(base_row, SUBLANES), :] = (
                dst[pl.ds(base_row, SUBLANES), :] + acc
            )
            return 0

        jax.lax.fori_loop(0, n_steps, step_fn, 0)

    return spmv


def _pell_cg_kernel(scal, iscal, tiles, bases, vals, qidx, r0_hbm, x0_hbm,
                    minv, x_hbm, r_hbm, stats, x_s, r_s, q_s, p_s, sems, *,
                    G, n_steps, Rf, use_minv, use_implicit,
                    flexible=False):
    """scal: SMEM (1,) [tol_sq_eff]; iscal: SMEM int32 (1,) [max_iters];
    tiles/bases: SMEM int32 scalar maps; vals/qidx: VMEM-resident slot
    arrays; p_s: (Rf + 2*PAD_PANELS + 1, 128) panel-padded scratch with
    p's panel j at row j + PAD_PANELS."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    C = _chunk_rows(Rf)
    n_chunks = Rf // C
    Rp = Rf + 2 * PAD_PANELS + 1

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    def mchunk(c0, C):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    # zero the pad panels once; the interior is rewritten every iteration
    p_s[0:PAD_PANELS] = jnp.zeros((PAD_PANELS, LANES), jnp.float32)
    p_s[Rp - PAD_PANELS - 1:Rp] = jnp.zeros(
        (PAD_PANELS + 1, LANES), jnp.float32
    )

    def init_chunk(c, carry):
        rho, rr = carry
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        z_c = mchunk(c0, C) * r_c if use_minv else r_c
        p_s[pl.ds(PAD_PANELS + c0, C), :] = z_c
        return (rho + jnp.sum(r_c * z_c), rr + jnp.sum(r_c * r_c))

    rho0, rr0 = jax.lax.fori_loop(
        0, n_chunks, init_chunk, (jnp.float32(0), jnp.float32(0))
    )

    _spmv = _make_pell_spmv(
        tiles, bases, vals, qidx, G=G, n_steps=n_steps, C=C,
        n_chunks=n_chunks,
    )

    def spmv_into_q():
        _spmv(p_s, q_s)

    def cond(st):
        it, rho, rr, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho, rr, _ = st
        spmv_into_q()

        def pq_chunk(c, pq):
            c0 = c * C
            return pq + jnp.sum(
                p_s[pl.ds(PAD_PANELS + c0, C), :] * q_s[pl.ds(c0, C), :]
            )

        pq = jax.lax.fori_loop(0, n_chunks, pq_chunk, jnp.float32(0))
        alpha = jnp.where(pq != 0, rho / jnp.where(pq != 0, pq, 1.0), 0.0)

        def update_chunk(c, carry):
            rho_n, rr_n, rho_t = carry
            c0 = c * C
            p_c = p_s[pl.ds(PAD_PANELS + c0, C), :]
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + alpha * p_c
            r_old_c = r_s[pl.ds(c0, C), :]
            r_c = r_old_c - alpha * q_s[pl.ds(c0, C), :]
            r_s[pl.ds(c0, C), :] = r_c
            z_c = mchunk(c0, C) * r_c if use_minv else r_c
            rho_t = rho_t + (
                jnp.sum((r_c - r_old_c) * z_c) if flexible else 0.0
            )
            return (rho_n + jnp.sum(r_c * z_c), rr_n + jnp.sum(r_c * r_c),
                    rho_t)

        rho_new, rr_new, rho_t = jax.lax.fori_loop(
            0, n_chunks, update_chunk,
            (jnp.float32(0), jnp.float32(0), jnp.float32(0)),
        )
        num = rho_t if flexible else rho_new
        beta = jnp.where(rho != 0, num / jnp.where(rho != 0, rho, 1.0),
                         0.0)

        def pdir_chunk(c, _):
            c0 = c * C
            r_c = r_s[pl.ds(c0, C), :]
            z_c = mchunk(c0, C) * r_c if use_minv else r_c
            p_s[pl.ds(PAD_PANELS + c0, C), :] = (
                z_c + beta * p_s[pl.ds(PAD_PANELS + c0, C), :]
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
def pell_cg_vmem_solve(A, r0_2, x0_2, minv2=None, *, tol_sq_eff, max_iters,
                       use_implicit=False, flexible=False,
                       interpret=False):
    """Run CG to convergence in one Pallas kernel on a Pell operator.

    A: matrix.pell.Pell (or any object with values/qidx/bases/
    tile_of_step/n_steps/G/NT); r0_2/x0_2: (Rf, 128) f32 frames with
    Rf = A.NT * 8; minv2: optional (Rf, 128) inverse diagonal.
    Returns (x2, iterations, monitored_sq, converged)."""
    Rf = A.NT * SUBLANES
    assert r0_2.shape == (Rf, LANES)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _pell_cg_kernel, G=A.G, n_steps=A.n_steps, Rf=Rf,
        use_minv=use_minv, use_implicit=use_implicit, flexible=flexible,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    qidx = A.qidx  # int8 storage stays resident; the kernel widens in-register
    args = [
        scal, iscal,
        A.tile_of_step.astype(jnp.int32), A.bases.astype(jnp.int32),
        A.values, qidx, r0_2, x0_2,
        minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tol
        pl.BlockSpec(memory_space=pltpu.SMEM),  # max_iters
        pl.BlockSpec(memory_space=pltpu.SMEM),  # tile_of_step
        pl.BlockSpec(memory_space=pltpu.SMEM),  # bases
        pl.BlockSpec(memory_space=pltpu.VMEM),  # values (resident)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # qidx (resident)
        pl.BlockSpec(memory_space=pl.ANY),      # r0 -> DMA
        pl.BlockSpec(memory_space=pl.ANY),      # x0 -> DMA
        pl.BlockSpec(memory_space=pltpu.VMEM),  # minv / placeholder
    ]
    Rp = Rf + 2 * PAD_PANELS + 1
    x2, _r2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rf, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((Rf, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rf, LANES), jnp.float32),  # x
            pltpu.VMEM((Rf, LANES), jnp.float32),  # r
            pltpu.VMEM((Rf, LANES), jnp.float32),  # q
            pltpu.VMEM((Rp, LANES), jnp.float32),  # p (panel-padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (A.values.size + 6 * Rf * LANES) * int(max_iters),
            bytes_accessed=A.values.size
            * (A.values.dtype.itemsize + 4) + 4 * Rf * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


# -- fused BiCGSTAB on PELL ----------------------------------------------------


def pell_bicgstab_vmem_fits(n_slots: int, NT: int, val_itemsize: int,
                            q_itemsize: int = 4, n_steps: int = 0,
                            use_minv: bool = False) -> bool:
    """x/r/rr/v/t frames + panel-padded p, s (and w for the explicit M
    application) + slot arrays + SMEM maps."""
    if n_steps + n_slots > _MAX_SMEM_INTS:
        return False
    Rf = NT * SUBLANES
    slot_bytes = n_slots * SUBLANES * LANES * (val_itemsize + q_itemsize)
    pads = (2 * PAD_PANELS + 1) / max(Rf, 1)
    vec_frames = 8.5 + 3 * pads + (2 if use_minv else 0)
    return slot_bytes + vec_frames * Rf * LANES * 4 <= cg_vmem_budget_bytes()


def _pell_bicgstab_kernel(scal, iscal, tiles, bases, vals, qidx, r0_hbm,
                          x0_hbm, minv, x_hbm, r_hbm, stats, x_s, r_s, rr_s,
                          v_s, t_s, p_s, s_s, w_s, sems, *, G, n_steps, Rf,
                          use_minv, use_implicit):
    """Semantics mirror ops/pallas_bicgstab._bicgstab_kernel (itself
    solver/bicgstab.py): shadow residual rr = r0, half-step check on s,
    omega = 0 for half-converged.  Right preconditioning is EXPLICIT
    here (w = M p computed chunk-wise into its own padded scratch, then
    v = A w) — PELL values have no cheap column-scaling fold."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    C = _chunk_rows(Rf)
    n_chunks = Rf // C
    Rp = Rf + 2 * PAD_PANELS + 1

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    pad_refs = (p_s, s_s, w_s) if use_minv else (p_s, s_s)
    for ref in pad_refs:
        ref[0:PAD_PANELS] = jnp.zeros((PAD_PANELS, LANES), jnp.float32)
        ref[Rp - PAD_PANELS - 1:Rp] = jnp.zeros(
            (PAD_PANELS + 1, LANES), jnp.float32
        )

    _spmv = _make_pell_spmv(
        tiles, bases, vals, qidx, G=G, n_steps=n_steps, C=C,
        n_chunks=n_chunks,
    )

    def init_chunk(c, rho):
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        rr_s[pl.ds(c0, C), :] = r_c
        v_s[pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        p_s[pl.ds(PAD_PANELS + c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        return rho + jnp.sum(r_c * r_c)

    rho0 = jax.lax.fori_loop(0, n_chunks, init_chunk, jnp.float32(0))

    def precondition(src_pad):
        """w = minv * src (chunk-wise); returns the SpMV source ref."""
        if not use_minv:
            return src_pad

        def w_chunk(c, _):
            c0 = c * C
            w_s[pl.ds(PAD_PANELS + c0, C), :] = (
                mchunk(c0) * src_pad[pl.ds(PAD_PANELS + c0, C), :]
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, w_chunk, 0)
        return w_s

    def cond(st):
        it, rho_old, alpha, omega, rho_new, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho_old, alpha, omega, rho_new, _ = st
        beta = _sdiv(rho_new * alpha, rho_old * omega)

        def p_chunk(c, _):
            c0 = c * C
            p_c = p_s[pl.ds(PAD_PANELS + c0, C), :]
            p_s[pl.ds(PAD_PANELS + c0, C), :] = (
                r_s[pl.ds(c0, C), :]
                + beta * (p_c - omega * v_s[pl.ds(c0, C), :])
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, p_chunk, 0)

        _spmv(precondition(p_s), v_s)

        def rv_chunk(c, rv):
            c0 = c * C
            return rv + jnp.sum(
                rr_s[pl.ds(c0, C), :] * v_s[pl.ds(c0, C), :]
            )

        rv = jax.lax.fori_loop(0, n_chunks, rv_chunk, jnp.float32(0))
        alpha_new = _sdiv(rho_new, rv)

        def s_chunk(c, ss):
            c0 = c * C
            s_c = r_s[pl.ds(c0, C), :] - alpha_new * v_s[pl.ds(c0, C), :]
            s_s[pl.ds(PAD_PANELS + c0, C), :] = s_c
            return ss + jnp.sum(s_c * s_c)

        ss = jax.lax.fori_loop(0, n_chunks, s_chunk, jnp.float32(0))
        mon_half = jnp.abs(rho_new) if use_implicit else ss
        half_done = mon_half <= tol_sq

        _spmv(precondition(s_s), t_s)

        def ts_chunk(c, carry):
            ts, tt = carry
            c0 = c * C
            t_c = t_s[pl.ds(c0, C), :]
            return (
                ts + jnp.sum(t_c * s_s[pl.ds(PAD_PANELS + c0, C), :]),
                tt + jnp.sum(t_c * t_c),
            )

        ts, tt = jax.lax.fori_loop(
            0, n_chunks, ts_chunk, (jnp.float32(0), jnp.float32(0))
        )
        omega_new = jnp.where(half_done, 0.0, _sdiv(ts, tt))

        def upd_chunk(c, carry):
            rr_dot, rnorm = carry
            c0 = c * C
            p_c = p_s[pl.ds(PAD_PANELS + c0, C), :]
            s_c = s_s[pl.ds(PAD_PANELS + c0, C), :]
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


@logged_kernel
def pell_bicgstab_vmem_solve(A, r0_2, x0_2, minv2=None, *, tol_sq_eff,
                             max_iters, use_implicit=False, interpret=False):
    """Run BiCGSTAB to convergence in one Pallas kernel on a Pell
    operator.  Same contract as pell_cg_vmem_solve."""
    Rf = A.NT * SUBLANES
    assert r0_2.shape == (Rf, LANES)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _pell_bicgstab_kernel, G=A.G, n_steps=A.n_steps, Rf=Rf,
        use_minv=use_minv, use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    qidx = A.qidx  # int8 storage stays resident; the kernel widens in-register
    args = [
        scal, iscal,
        A.tile_of_step.astype(jnp.int32), A.bases.astype(jnp.int32),
        A.values, qidx, r0_2, x0_2,
        minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    Rp = Rf + 2 * PAD_PANELS + 1
    x2, _r2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rf, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((Rf, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rf, LANES), jnp.float32),  # x
            pltpu.VMEM((Rf, LANES), jnp.float32),  # r
            pltpu.VMEM((Rf, LANES), jnp.float32),  # rr
            pltpu.VMEM((Rf, LANES), jnp.float32),  # v
            pltpu.VMEM((Rf, LANES), jnp.float32),  # t
            pltpu.VMEM((Rp, LANES), jnp.float32),  # p (panel-padded)
            pltpu.VMEM((Rp, LANES), jnp.float32),  # s (panel-padded)
            # w = M p / M s staging; dummy-small when not preconditioned
            pltpu.VMEM((Rp if use_minv else 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (A.values.size + 6 * Rf * LANES) * int(max_iters),
            bytes_accessed=A.values.size
            * (A.values.dtype.itemsize + 4) + 4 * Rf * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


def pell_cgs_vmem_fits(n_slots: int, NT: int, val_itemsize: int,
                       q_itemsize: int = 4, n_steps: int = 0,
                       use_minv: bool = False) -> bool:
    """x/r/rr/q/u/v frames + panel-padded p and w (and the explicit-M
    staging) + slot arrays + SMEM maps."""
    if n_steps + n_slots > _MAX_SMEM_INTS:
        return False
    Rf = NT * SUBLANES
    slot_bytes = n_slots * SUBLANES * LANES * (val_itemsize + q_itemsize)
    pads = (2 * PAD_PANELS + 1) / max(Rf, 1)
    vec_frames = 8.5 + 2 * pads + ((1 + pads) if use_minv else 0)
    return slot_bytes + vec_frames * Rf * LANES * 4 <= cg_vmem_budget_bytes()


def _pell_cgs_kernel(scal, iscal, tiles, bases, vals, qidx, r0_hbm,
                     x0_hbm, minv, x_hbm, r_hbm, stats, x_s, r_s, rr_s,
                     q_s, u_s, v_s, p_s, w2_s, m_s, sems, *, G, n_steps,
                     Rf, use_minv, use_implicit):
    """Whole-solve CGS on a Pell operator — semantics mirror
    ops/pallas_cgs._cgs_kernel (itself solver/bicgstab.py Cgs /
    core/solver/cgs.cpp): u = r + beta q; p = u + beta(q + beta p);
    v = A M p; q_new = u - alpha v; x += alpha M(u + q_new);
    r -= alpha A M(u + q_new).  Right preconditioning is EXPLICIT (the
    PELL layout has no cheap column-scaling fold); the second SpMV's
    result reuses the v frame."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    C = _chunk_rows(Rf)
    n_chunks = Rf // C
    Rp = Rf + 2 * PAD_PANELS + 1

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    pad_refs = (p_s, w2_s, m_s) if use_minv else (p_s, w2_s)
    for ref in pad_refs:
        ref[0:PAD_PANELS] = jnp.zeros((PAD_PANELS, LANES), jnp.float32)
        ref[Rp - PAD_PANELS - 1:Rp] = jnp.zeros(
            (PAD_PANELS + 1, LANES), jnp.float32
        )

    _spmv = _make_pell_spmv(
        tiles, bases, vals, qidx, G=G, n_steps=n_steps, C=C,
        n_chunks=n_chunks,
    )

    def precondition(src_pad):
        if not use_minv:
            return src_pad

        def w_chunk(c, _):
            c0 = c * C
            m_s[pl.ds(PAD_PANELS + c0, C), :] = (
                mchunk(c0) * src_pad[pl.ds(PAD_PANELS + c0, C), :]
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, w_chunk, 0)
        return m_s

    def init_chunk(c, rho):
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        rr_s[pl.ds(c0, C), :] = r_c
        q_s[pl.ds(c0, C), :] = jnp.zeros((C, LANES), jnp.float32)
        p_s[pl.ds(PAD_PANELS + c0, C), :] = jnp.zeros(
            (C, LANES), jnp.float32
        )
        return rho + jnp.sum(r_c * r_c)

    rho0 = jax.lax.fori_loop(0, n_chunks, init_chunk, jnp.float32(0))

    def cond(st):
        it, rho_old, rho_new, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho_old, rho_new, _ = st
        beta = _sdiv(rho_new, rho_old)

        def up_chunk(c, _):
            c0 = c * C
            r_c = r_s[pl.ds(c0, C), :]
            q_c = q_s[pl.ds(c0, C), :]
            u_c = r_c + beta * q_c
            u_s[pl.ds(c0, C), :] = u_c
            p_old = p_s[pl.ds(PAD_PANELS + c0, C), :]
            p_s[pl.ds(PAD_PANELS + c0, C), :] = (
                u_c + beta * (q_c + beta * p_old)
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, up_chunk, 0)

        _spmv(precondition(p_s), v_s)

        def sg_chunk(c, sg):
            c0 = c * C
            return sg + jnp.sum(
                rr_s[pl.ds(c0, C), :] * v_s[pl.ds(c0, C), :]
            )

        sigma = jax.lax.fori_loop(0, n_chunks, sg_chunk, jnp.float32(0))
        alpha = _sdiv(rho_new, sigma)

        def qw_chunk(c, _):
            c0 = c * C
            u_c = u_s[pl.ds(c0, C), :]
            q_new = u_c - alpha * v_s[pl.ds(c0, C), :]
            q_s[pl.ds(c0, C), :] = q_new
            w2_s[pl.ds(PAD_PANELS + c0, C), :] = u_c + q_new
            return 0

        jax.lax.fori_loop(0, n_chunks, qw_chunk, 0)

        _spmv(precondition(w2_s), v_s)  # t = A M w, reusing the v frame

        def upd_chunk(c, carry):
            rho_nxt, rnorm = carry
            c0 = c * C
            # m_s already holds M*w from the preceding precondition()
            mw_c = (
                m_s[pl.ds(PAD_PANELS + c0, C), :] if use_minv
                else w2_s[pl.ds(PAD_PANELS + c0, C), :]
            )
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + alpha * mw_c
            r_c = r_s[pl.ds(c0, C), :] - alpha * v_s[pl.ds(c0, C), :]
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

    it, _ro, _rn, stop_mon = jax.lax.while_loop(
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
def pell_cgs_vmem_solve(A, r0_2, x0_2, minv2=None, *, tol_sq_eff,
                        max_iters, use_implicit=False, interpret=False):
    """Run CGS to convergence in one Pallas kernel on a Pell operator.
    Same contract as pell_cg_vmem_solve."""
    Rf = A.NT * SUBLANES
    assert r0_2.shape == (Rf, LANES)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _pell_cgs_kernel, G=A.G, n_steps=A.n_steps, Rf=Rf,
        use_minv=use_minv, use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    qidx = A.qidx  # int8 storage stays resident; the kernel widens in-register
    args = [
        scal, iscal,
        A.tile_of_step.astype(jnp.int32), A.bases.astype(jnp.int32),
        A.values, qidx, r0_2, x0_2,
        minv2 if use_minv else jnp.zeros((8, LANES), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    Rp = Rf + 2 * PAD_PANELS + 1
    x2, _r2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Rf, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((Rf, LANES), r0_2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rf, LANES), jnp.float32),  # x
            pltpu.VMEM((Rf, LANES), jnp.float32),  # r
            pltpu.VMEM((Rf, LANES), jnp.float32),  # rr
            pltpu.VMEM((Rf, LANES), jnp.float32),  # q
            pltpu.VMEM((Rf, LANES), jnp.float32),  # u
            pltpu.VMEM((Rf, LANES), jnp.float32),  # v (reused as t)
            pltpu.VMEM((Rp, LANES), jnp.float32),  # p (panel-padded)
            pltpu.VMEM((Rp, LANES), jnp.float32),  # w = u+q (padded)
            pltpu.VMEM((Rp if use_minv else 8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (A.values.size + 7 * Rf * LANES) * int(max_iters),
            bytes_accessed=A.values.size
            * (A.values.dtype.itemsize + 4) + 4 * Rf * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


def pell_ir_vmem_fits(n_slots: int, NT: int, val_itemsize: int,
                      q_itemsize: int = 4, n_steps: int = 0,
                      use_minv: bool = False) -> bool:
    """x/r/b frames + the panel-padded staging + slot arrays."""
    if n_steps + n_slots > _MAX_SMEM_INTS:
        return False
    Rf = NT * SUBLANES
    slot_bytes = n_slots * SUBLANES * LANES * (val_itemsize + q_itemsize)
    pads = (2 * PAD_PANELS + 1) / max(Rf, 1)
    vec_frames = 3.5 + pads + (1 if use_minv else 0)
    return slot_bytes + vec_frames * Rf * LANES * 4 <= cg_vmem_budget_bytes()


def _pell_ir_kernel(scal, iscal, tiles, bases, vals, qidx, b_hbm, x0_hbm,
                    minv, x_hbm, stats, x_s, r_s, b_s, w_s, sems, *, G,
                    n_steps, Rf, use_minv):
    """Whole-solve Richardson/IR on a Pell operator — semantics mirror
    ops/pallas_ir._ir_kernel (itself solver/ir.py / core/solver/ir.cpp):
    d = M r; x += omega d; r = b - A x with the TRUE residual recomputed
    every iteration (IR's own update rule, no recurrence drift)."""
    tol_sq = scal[0]
    omega = scal[1]  # SMEM: relaxation_factor is a runtime pytree leaf
    max_iters = iscal[0]
    C = _chunk_rows(Rf)
    n_chunks = Rf // C
    Rp = Rf + 2 * PAD_PANELS + 1

    cp_b = pltpu.make_async_copy(b_hbm, b_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_b.start()
    cp_x.start()
    cp_b.wait()
    cp_x.wait()

    def mchunk(c0):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    w_s[0:PAD_PANELS] = jnp.zeros((PAD_PANELS, LANES), jnp.float32)
    w_s[Rp - PAD_PANELS - 1:Rp] = jnp.zeros(
        (PAD_PANELS + 1, LANES), jnp.float32
    )

    _spmv = _make_pell_spmv(
        tiles, bases, vals, qidx, G=G, n_steps=n_steps, C=C,
        n_chunks=n_chunks,
    )

    def residual(_=None):
        """r = b - A x (x staged into w_s); returns r.r."""
        def stg(c, _):
            c0 = c * C
            w_s[pl.ds(PAD_PANELS + c0, C), :] = x_s[pl.ds(c0, C), :]
            return 0

        jax.lax.fori_loop(0, n_chunks, stg, 0)
        _spmv(w_s, r_s)

        def sub(c, rr):
            c0 = c * C
            r_c = b_s[pl.ds(c0, C), :] - r_s[pl.ds(c0, C), :]
            r_s[pl.ds(c0, C), :] = r_c
            return rr + jnp.sum(r_c * r_c)

        return jax.lax.fori_loop(0, n_chunks, sub, jnp.float32(0))

    rr0 = residual()

    def cond(st):
        it, rr = st
        return (it < max_iters) & ~(rr <= tol_sq)  # NaN: keep going

    def body(st):
        it, _ = st

        def xup(c, _):
            c0 = c * C
            d_c = (
                mchunk(c0) * r_s[pl.ds(c0, C), :] if use_minv
                else r_s[pl.ds(c0, C), :]
            )
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + omega * d_c
            return 0

        jax.lax.fori_loop(0, n_chunks, xup, 0)
        return (it + 1, residual())

    it, rr = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), rr0)
    )

    cp_xo = pltpu.make_async_copy(x_s, x_hbm, sems.at[0])
    cp_xo.start()
    cp_xo.wait()
    stats[0] = it.astype(jnp.float32)
    stats[1] = rr
    stats[2] = (rr <= tol_sq).astype(jnp.float32)


@logged_kernel
def pell_ir_vmem_solve(A, b2, x0_2, minv2=None, *, omega, tol_sq_eff,
                       max_iters, interpret=False):
    """Run Richardson/IR to convergence in one Pallas kernel on a Pell
    operator.  Returns (x2, iterations, true_rr, converged)."""
    Rf = A.NT * SUBLANES
    assert b2.shape == (Rf, LANES)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _pell_ir_kernel, G=A.G, n_steps=A.n_steps, Rf=Rf,
        use_minv=use_minv,
    )
    scal = jnp.stack([
        jnp.asarray(tol_sq_eff, jnp.float32).reshape(()),
        jnp.asarray(omega, jnp.float32).reshape(()),
    ])
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
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
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
            pltpu.VMEM((Rf, LANES), jnp.float32),  # x
            pltpu.VMEM((Rf, LANES), jnp.float32),  # r
            pltpu.VMEM((Rf, LANES), jnp.float32),  # b
            pltpu.VMEM((Rp, LANES), jnp.float32),  # staging
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (A.values.size + 3 * Rf * LANES) * int(max_iters),
            bytes_accessed=A.values.size
            * (A.values.dtype.itemsize + 4) + 3 * Rf * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

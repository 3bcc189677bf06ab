"""Whole-solve fused CG: the entire Krylov loop inside ONE Pallas kernel.

Reference analog: Ginkgo fuses CG's BLAS-1 updates into step_1/step_2
kernels (common/unified/solver/cg_kernels.cpp) but still launches
SpMV + 2 dots + 2 fused-axpy kernels per iteration with a host-synced
stop check (core/solver/cg.cpp:148-190, 18n/iter traffic model).  The
TPU-native end point of that fusion arc is a single kernel for the whole
solve: for DIA operators whose diagonals AND vectors fit in VMEM, every
iteration runs entirely on-chip — per-iteration HBM traffic is ZERO
(one-time DMA of vectors in, one DMA of x/r out), and each iteration is
pure VPU work with in-register reductions.  With bf16 `reduce_storage`
diagonals, multi-million-row solves stay fully VMEM-resident.

Preconditioning: Identity or any diagonal (scalar-Jacobi) preconditioner
— the inverse diagonal rides along in VMEM.

Layout: the (R, 128) lane frame of matrix/dia.py.  SpMV uses the same
(q = off//128 sublane, s = off%128 lane) shift decomposition as
ops/pallas_dia.py — `pltpu.roll` + lane select, no gather.  The search
direction p is carried in a halo-padded scratch so diagonal windows are
(dynamic) slices.

Memory discipline (what made this fit): vectors arrive via `pl.ANY`
(HBM) and are DMA'd once into VMEM scratch — VMEM input/output windows
would double-count the state.  All per-iteration work runs in row CHUNKS
inside `fori_loop`s so Mosaic temporaries stay register-sized instead of
spilling whole frames.  The while_loop carries only scalars.

Stopping: classic CG recurrences with the exact r.r tracked every
iteration (free — r is VMEM-resident); the loop is a `lax.while_loop`
INSIDE the kernel, so convergence exits early with no host round-trip
(the reference syncs to host every iteration, cg.cpp:166-171).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

from .pallas_dia import _plan

LANES = 128


def _sdiv(num, den):
    """Guarded division: num/den with den == 0 mapping to 0 (the fused
    solver family's shared zero-denominator convention)."""
    return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)


def _chunk_rows(R: int) -> int:
    """Row-chunk size for the in-kernel loops: big enough to amortize loop
    overhead, small enough that per-chunk temporaries live in registers.
    GINKGO_TPU_CG_CHUNK forces a size (tests use it to cover the
    multi-chunk path at small R)."""
    forced = os.environ.get("GINKGO_TPU_CG_CHUNK")
    if forced:
        c = int(forced)
        if R % c == 0:
            return c
    for c in (512, 1024, 256, 128, 64, 32, 16, 8):
        if R % c == 0:
            return c
    return R


def _spmv_chunk(diags, p_s, c0, C, *, qs, pad_lo):
    """(C, 128) block of A @ p starting at frame row c0.

    p_s: halo-padded (Rp, 128) VMEM ref; diags: (nd, R, 128) VMEM ref.
    Unrolls over the static diagonal list; each diagonal contributes a
    sublane-shifted, lane-rolled window of p — exact, gather-free."""
    acc = jnp.zeros((C, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
    for j, (q, s) in enumerate(qs):
        base = pad_lo + q + c0
        cur = p_s[pl.ds(base, C), :]
        if s == 0:
            shifted = cur
        else:
            nxt = p_s[pl.ds(base + 1, C), :]
            rc = pltpu.roll(cur, -s % LANES, 1)
            rn = pltpu.roll(nxt, -s % LANES, 1)
            shifted = jnp.where(lane < LANES - s, rc, rn)
        acc = acc + diags[j, pl.ds(c0, C), :].astype(jnp.float32) * shifted
    return acc


def _cg_kernel(scal, iscal, diags, r0_hbm, x0_hbm, minv, x_hbm, r_hbm, stats,
               x_s, r_s, q_s, p_s, sems, *, qs, pad_lo, pad_hi, R,
               use_minv, use_implicit, store_q, flexible=False):
    """scal: SMEM (1,) [tol_sq_eff]; iscal: SMEM int32 (1,) [max_iters]
    (kept integral end-to-end so caps above 2^24 are exact).  stats out:
    SMEM (3,) [iterations, monitored_sq, converged]."""
    tol_sq = scal[0]
    max_iters = iscal[0]
    Rp = R + pad_lo + pad_hi
    C = _chunk_rows(R)
    n_chunks = R // C

    # ---- one-time DMA: initial state HBM -> VMEM scratch -------------------
    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    def mchunk(c0, C):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    if pad_lo:
        p_s[0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
    if pad_hi:
        p_s[Rp - pad_hi:Rp] = jnp.zeros((pad_hi, LANES), jnp.float32)

    def init_chunk(c, carry):
        rho, rr = carry
        c0 = c * C
        r_c = r_s[pl.ds(c0, C), :]
        z_c = mchunk(c0, C) * r_c if use_minv else r_c
        p_s[pl.ds(pad_lo + c0, C), :] = z_c
        return (rho + jnp.sum(r_c * z_c), rr + jnp.sum(r_c * r_c))

    rho0, rr0 = jax.lax.fori_loop(
        0, n_chunks, init_chunk, (jnp.float32(0), jnp.float32(0))
    )

    # stop_mon mirrors the generic loop's check exactly: the first body
    # always runs (init +inf, like the generic loop's unconditional first
    # iteration), exact mode tests the POST-update r.r, implicit mode tests
    # the rho that fed this body's alpha (solver_base._check_stop receives
    # the PRE-update rho) — without this the fused path stops one
    # iteration early in implicit mode.
    def cond(st):
        it, rho, rr, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rho, rr, _ = st

        # pass 1: q = A p (chunked), accumulate pq.  When q does not fit
        # (store_q=False) only the reduction is kept and pass 2 recomputes
        # the SpMV — an extra nd mul-adds/element buys back a whole frame.
        def spmv_chunk(c, pq):
            c0 = c * C
            q_c = _spmv_chunk(diags, p_s, c0, C, qs=qs, pad_lo=pad_lo)
            if store_q:
                q_s[pl.ds(c0, C), :] = q_c
            p_c = p_s[pl.ds(pad_lo + c0, C), :]
            return pq + jnp.sum(p_c * q_c)

        pq = jax.lax.fori_loop(0, n_chunks, spmv_chunk, jnp.float32(0))
        alpha = jnp.where(pq != 0, rho / jnp.where(pq != 0, pq, 1.0), 0.0)

        # pass 2: x += alpha p, r -= alpha q, accumulate rho_new / rr_new
        # (+ the FCG Polak-Ribiere numerator (r_new - r_old).z_new — the
        # pre-update r is in hand in this very pass, no extra frame)
        def update_chunk(c, carry):
            rho_n, rr_n, rho_t = carry
            c0 = c * C
            p_c = p_s[pl.ds(pad_lo + c0, C), :]
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + alpha * p_c
            q_c = (
                q_s[pl.ds(c0, C), :] if store_q
                else _spmv_chunk(diags, p_s, c0, C, qs=qs, pad_lo=pad_lo)
            )
            r_old_c = r_s[pl.ds(c0, C), :]
            r_c = r_old_c - alpha * q_c
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
        beta = jnp.where(rho != 0, num / jnp.where(rho != 0, rho, 1.0), 0.0)

        # pass 3: p = z + beta p (z recomputed from r — a multiply, cheaper
        # than a third state frame)
        def pdir_chunk(c, _):
            c0 = c * C
            r_c = r_s[pl.ds(c0, C), :]
            z_c = mchunk(c0, C) * r_c if use_minv else r_c
            p_s[pl.ds(pad_lo + c0, C), :] = (
                z_c + beta * p_s[pl.ds(pad_lo + c0, C), :]
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, pdir_chunk, 0)
        stop_mon = jnp.abs(rho) if use_implicit else rr_new
        return (it + 1, rho_new, rr_new, stop_mon)

    it, rho, rr, stop_mon = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), rho0, rr0, jnp.float32(jnp.inf)),
    )

    # ---- one-time DMA: final state VMEM -> HBM outputs ---------------------
    cp_xo = pltpu.make_async_copy(x_s, x_hbm, sems.at[0])
    cp_ro = pltpu.make_async_copy(r_s, r_hbm, sems.at[1])
    cp_xo.start()
    cp_ro.start()
    cp_xo.wait()
    cp_ro.wait()
    stats[0] = it.astype(jnp.float32)
    stats[1] = stop_mon
    stats[2] = (stop_mon <= tol_sq).astype(jnp.float32)


def _chunk_rows_multi(R: int, k: int) -> int:
    """Chunk size for the k-RHS kernel: k per-column (C, 128) temporaries
    are live per chunk, so shrink C to keep them register/VMEM-friendly."""
    c = _chunk_rows(R)
    if os.environ.get("GINKGO_TPU_CG_CHUNK"):
        return c
    while c * k > 1024 and c % 2 == 0 and R % (c // 2) == 0:
        c //= 2
    return c


def _spmv_chunk_multi(diags, p_s, c0, C, *, qs, pad_lo, k):
    """k (C, 128) blocks of A @ p_j starting at frame row c0 — the
    per-diagonal block is loaded ONCE and applied to every column's
    halo-padded (k, Rp, 128) search-direction scratch."""
    accs = [jnp.zeros((C, LANES), jnp.float32) for _ in range(k)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
    for jd, (q, s) in enumerate(qs):
        db = diags[jd, pl.ds(c0, C), :].astype(jnp.float32)
        base = pad_lo + q + c0
        for j in range(k):
            cur = p_s[j, pl.ds(base, C), :]
            if s == 0:
                shifted = cur
            else:
                nxt = p_s[j, pl.ds(base + 1, C), :]
                rc = pltpu.roll(cur, -s % LANES, 1)
                rn = pltpu.roll(nxt, -s % LANES, 1)
                shifted = jnp.where(lane < LANES - s, rc, rn)
            accs[j] = accs[j] + db * shifted
    return accs


def _cg_multi_kernel(scal, iscal, diags, r0_hbm, x0_hbm, minv, x_hbm, r_hbm,
                     stats, x_s, r_s, q_s, p_s, sems, *, qs, pad_lo, pad_hi,
                     R, k, use_minv, use_implicit, store_q, flexible):
    """k-RHS whole-solve CG with PER-COLUMN stopping — the reference's
    one-stopping-status-byte-per-column protocol (stopping_status.hpp:
    62-145; masked step_1/step_2 kernels in common/unified/solver/
    cg_kernels.cpp) executed entirely in-kernel: a converged column's
    alpha freezes its x/r and its p update is bypassed, while the loop
    runs until every column stops.  scal: SMEM (k,) per-column squared
    tolerances; iscal: SMEM int32 (1,) max_iters.  stats out: SMEM
    (1+3k,) [total_iters, mon_j..., conv_j..., stop_iter_j...]."""
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

    def mchunk(c0, C):
        return minv[pl.ds(c0, C), :].astype(jnp.float32)

    for j in range(k):
        if pad_lo:
            p_s[j, 0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
        if pad_hi:
            p_s[j, Rp - pad_hi:Rp] = jnp.zeros((pad_hi, LANES), jnp.float32)

    def init_chunk(c, carry):
        rhos, rrs = carry
        c0 = c * C
        rhos2, rrs2 = [], []
        for j in range(k):
            r_c = r_s[j, pl.ds(c0, C), :]
            z_c = mchunk(c0, C) * r_c if use_minv else r_c
            p_s[j, pl.ds(pad_lo + c0, C), :] = z_c
            rhos2.append(rhos[j] + jnp.sum(r_c * z_c))
            rrs2.append(rrs[j] + jnp.sum(r_c * r_c))
        return (tuple(rhos2), tuple(rrs2))

    zk = tuple(jnp.float32(0) for _ in range(k))
    rho0, rr0 = jax.lax.fori_loop(0, n_chunks, init_chunk, (zk, zk))

    # per-column state: rho_j, active_j (the stopping-status byte), the
    # iteration each column stopped at, and the monitored quantity.  The
    # first body always runs (active starts True), matching the generic
    # loop / single-RHS kernel semantics.
    def cond(st):
        it = st[0]
        act = st[2]
        any_act = act[0]
        for j in range(1, k):
            any_act = any_act | act[j]
        return (it < max_iters) & any_act

    def body(st):
        it, rho, act, itc, _mon = st

        def spmv_chunk(c, pqs):
            c0 = c * C
            q_cs = _spmv_chunk_multi(diags, p_s, c0, C, qs=qs,
                                     pad_lo=pad_lo, k=k)
            out = []
            for j in range(k):
                if store_q:
                    q_s[j, pl.ds(c0, C), :] = q_cs[j]
                p_c = p_s[j, pl.ds(pad_lo + c0, C), :]
                out.append(pqs[j] + jnp.sum(p_c * q_cs[j]))
            return tuple(out)

        pq = jax.lax.fori_loop(0, n_chunks, spmv_chunk, zk)
        alpha = [
            jnp.where(
                act[j] & (pq[j] != 0),
                rho[j] / jnp.where(pq[j] != 0, pq[j], 1.0),
                0.0,
            )
            for j in range(k)
        ]

        def update_chunk(c, carry):
            rho_n, rr_n, rho_t = carry
            c0 = c * C
            rho_n2, rr_n2, rho_t2 = [], [], []
            q_cs = (
                None if store_q
                else _spmv_chunk_multi(diags, p_s, c0, C, qs=qs,
                                       pad_lo=pad_lo, k=k)
            )
            for j in range(k):
                p_c = p_s[j, pl.ds(pad_lo + c0, C), :]
                x_s[j, pl.ds(c0, C), :] = (
                    x_s[j, pl.ds(c0, C), :] + alpha[j] * p_c
                )
                q_c = q_s[j, pl.ds(c0, C), :] if store_q else q_cs[j]
                r_old_c = r_s[j, pl.ds(c0, C), :]
                r_c = r_old_c - alpha[j] * q_c
                r_s[j, pl.ds(c0, C), :] = r_c
                z_c = mchunk(c0, C) * r_c if use_minv else r_c
                rho_t2.append(rho_t[j] + (
                    jnp.sum((r_c - r_old_c) * z_c) if flexible else 0.0
                ))
                rho_n2.append(rho_n[j] + jnp.sum(r_c * z_c))
                rr_n2.append(rr_n[j] + jnp.sum(r_c * r_c))
            return (tuple(rho_n2), tuple(rr_n2), tuple(rho_t2))

        rho_new, rr_new, rho_t = jax.lax.fori_loop(
            0, n_chunks, update_chunk, (zk, zk, zk)
        )
        num = rho_t if flexible else rho_new
        beta = [
            jnp.where(
                rho[j] != 0,
                num[j] / jnp.where(rho[j] != 0, rho[j], 1.0),
                0.0,
            )
            for j in range(k)
        ]

        def pdir_chunk(c, _):
            c0 = c * C
            for j in range(k):
                r_c = r_s[j, pl.ds(c0, C), :]
                z_c = mchunk(c0, C) * r_c if use_minv else r_c
                old = p_s[j, pl.ds(pad_lo + c0, C), :]
                # stopped columns keep p unchanged (masked step_1)
                p_s[j, pl.ds(pad_lo + c0, C), :] = jnp.where(
                    act[j], z_c + beta[j] * old, old
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, pdir_chunk, 0)
        mon = tuple(
            jnp.abs(rho[j]) if use_implicit else rr_new[j] for j in range(k)
        )
        act_new = tuple(act[j] & ~(mon[j] <= scal[j]) for j in range(k))  # NaN: stay active
        itc_new = tuple(
            jnp.where(act[j], it + 1, itc[j]) for j in range(k)
        )
        return (it + 1, tuple(rho_new), act_new, itc_new, mon)

    it, rho, act, itc, mon = jax.lax.while_loop(
        cond, body,
        (
            jnp.asarray(0, jnp.int32),
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
def cg_vmem_solve_multi(diags, offsets, r0_3, x0_3, minv2=None, *,
                        tol_sq_eff, max_iters, use_implicit=False,
                        store_q=True, flexible=False, interpret=False):
    """k-RHS whole-solve CG in one Pallas kernel with per-column stopping.

    r0_3/x0_3: (k, R, 128) per-column frames; tol_sq_eff: (k,) squared
    absolute thresholds (negative disables that column's residual stop).
    Returns (x3, iterations, monitored_sq (k,), converged (k,),
    stop_iters (k,))."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    k = r0_3.shape[0]
    qs, _qmin, _halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _cg_multi_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R, k=k,
        use_minv=use_minv, use_implicit=use_implicit, store_q=store_q,
        flexible=flexible,
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
            pltpu.VMEM((k, R if store_q else 8, LANES), jnp.float32),
            pltpu.VMEM((k, Rp, LANES), jnp.float32),  # p (halo-padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * (nd + 6) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 4 * k) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    mon = stats[1:1 + k]
    conv = stats[1 + k:1 + 2 * k] > 0
    itc = stats[1 + 2 * k:1 + 3 * k].astype(jnp.int32)
    return x3, it, mon, conv, itc


def cg_vmem_budget_bytes() -> int:
    """VMEM working-set budget for the whole-solve kernel.  v5e has 128 MiB
    of VMEM; leave headroom for the compiler's temporaries.  Override with
    GINKGO_TPU_VMEM_MB."""
    mb = int(os.environ.get("GINKGO_TPU_VMEM_MB", "116"))
    return mb * 1024 * 1024


def cg_vmem_fits(nd: int, R: int, diag_itemsize: int = 4,
                 use_minv: bool = False, store_q: bool = True,
                 halo_rows: int = 0, k: int = 1) -> bool:
    """Working set: the diags VMEM window (nd frames at storage precision)
    + x/r scratch (+ q scratch when store_q) + the halo-padded p scratch
    (pass the ACTUAL halo from _plan(offsets, R) — wide diagonals can make
    it a large fraction of a frame) + minv window when present + chunked
    temporaries.  bf16 `reduce_storage` diagonals halve the dominant term,
    which is what lets multi-million-row solves stay fully VMEM-resident.
    k > 1: per-column x/r/q/p frames (diags and minv stay shared)."""
    frame = R * LANES * 4
    vec_frames = k * (
        3.0 + halo_rows / max(R, 1) + (1 if store_q else 0)
    ) + 0.25 + (1 if use_minv else 0)
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


@logged_kernel
def cg_vmem_solve(diags, offsets, r0_2, x0_2, minv2=None, *, tol_sq_eff,
                  max_iters, use_implicit=False, store_q=True,
                  flexible=False, interpret=False):
    """Run CG to convergence in one Pallas kernel.

    diags: (nd, R, 128) f32/bf16; r0_2/x0_2: (R, 128) f32 initial residual
    and guess; minv2: optional (R, 128) inverse-diagonal (scalar Jacobi).
    tol_sq_eff: scalar — squared ABSOLUTE stop threshold on r.r (or |rho|
    when use_implicit); pass a negative value to run to max_iters.
    Returns (x2, iterations, monitored_sq, converged).
    """
    nd, R, lanes = diags.shape
    assert lanes == LANES
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _cg_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R,
        use_minv=use_minv, use_implicit=use_implicit, store_q=store_q,
        flexible=flexible,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, diags, r0_2, x0_2]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # r0 stays in HBM; DMA'd in
        pl.BlockSpec(memory_space=pl.ANY),  # x0 stays in HBM; DMA'd in
    ]
    if use_minv:
        args.append(minv2)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    else:
        args.append(jnp.zeros((8, LANES), jnp.float32))  # placeholder
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
            # q frame only when stored (else pass 2 recomputes the SpMV)
            pltpu.VMEM((R if store_q else 8, LANES), jnp.float32),
            pltpu.VMEM((Rp, LANES), jnp.float32),  # p (halo-padded)
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nd + 6) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 4) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

"""Fused AMG V-cycle: the ENTIRE multigrid cycle in one Pallas kernel.

Reference role: core/solver/multigrid.cpp:269-489 (MultigridState::
run_cycle) — there, every level's smoother / residual / restrict /
prolong is a separate kernel launch reading and writing HBM.  Here the
whole hierarchy lives in VMEM for the duration of the cycle: per-level
Dia diagonals and inverse-diagonal frames are kernel operands, all
vectors (x/b/r per level + SpMV staging) are VMEM scratch, the banded
PGM transfers (multigrid/pgm.py BandedRestriction/BandedProlongation)
are lowered to in-register sublane gathers + constant MXU matmuls, and
the coarsest solve is a dense-inverse matmul.  HBM traffic per cycle is
exactly: b in, x out, one read of each level's diagonals per SpMV pass.

Geometry (matches pgm.py's pure-stride transfers, deltas == (0,)):
- stride 1 ("lane"):  coarse[c] = fine[2c] + fine[2c+1].  Per coarse
  frame row rc this reads fine rows 2rc / 2rc+1 (sublane dynamic_gather
  with a static index pattern) and compacts lanes with the constant
  0/1 pair matrices (_lane_pair_mats) on the MXU.
- stride S = Sr*128 ("rows"): coarse frame row (g*Sr + t) = fine rows
  (g*2Sr + t) + (g*2Sr + Sr + t) — pure affine row slices, no gather.

All loop offsets are affine in fori indices (no device integer
division); every overrun read/write lands in explicitly zeroed frame
padding, so partial frames need no masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

from .pallas_bicgstab import _sdiv
from .pallas_cg import LANES, _chunk_rows, _spmv_chunk, cg_vmem_budget_bytes
from .pallas_dia import _plan


def _lane_mats_inkernel(S: int):
    """In-kernel (128, 128) pair-compaction matrices for stride-S pairing
    with 2S | 128 (generalizes pgm._lane_pair_mats, the S=1 case):
    pairing (i, i+S) stays inside one 128-lane frame row, so coarse frame
    row rc = fine rows 2rc/2rc+1 lane-compacted.  Coarse lane m sums fine
    lanes (m//S)*2S + m%S and that + S.  Built from iota (Pallas kernels
    cannot capture array constants); S is a power of two, so the integer
    division lowers to shifts."""
    a = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    m = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    h = LANES // 2

    def mat(mm, valid):
        base = (mm // S) * (2 * S) + mm % S
        hit = (a == base) | (a == base + S)
        return jnp.where(hit & valid, 1.0, 0.0).astype(jnp.float32)

    return mat(m, m < h), mat(m - h, m >= h)


def _roundup(a: int, b: int) -> int:
    return -(-a // b) * b


def _even_chunk(R: int) -> int:
    """Even chunk size dividing R (prolong 'lane' needs Cf/2 integral)."""
    c = _chunk_rows(R)
    if c % 2:
        c = 2 * c if (2 * c <= R and R % (2 * c) == 0) else c
    return c if c % 2 == 0 else R if R % 2 == 0 else 2 * R


def _row_sub(Sr: int) -> int:
    """Subchunk for 'rows' transfers: largest divisor of Sr <= 512."""
    for c in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if Sr % c == 0:
            return c
    return 1


def _visit_count(L: int, mode: str) -> int:
    """Level-visits of one unrolled cycle (W is exponential in depth)."""

    def c(l, md):
        if l == L:
            return 1
        n = 1 + c(l + 1, md)
        if md in ("w", "f") and l + 1 < L:
            n += c(l + 1, "v" if md == "f" else md)
        return n

    return c(0, mode)


def build_vcycle_plan(levels_meta, mode="v", mid_case="standalone",
                      kcycle_base=1, kcycle_rel_tol=0.25):
    """Static kernel plan from per-level metadata.

    levels_meta: list of dicts with keys
      nd, R, offsets (tuple), itemsize, iters_pre, relax_pre, iters_post,
      relax_post, optional iters_mid/relax_mid, stride (transfer TO the
      next level; absent on the last entry which describes the coarsest
      operator frame R only as 'Rc').
    The last element must carry {'Rc': coarsest frame rows}.
    mid_case mirrors multigrid.hpp:95 mid_smooth_type
    ('both' | 'post_smoother' | 'pre_smoother' | 'standalone').
    mode 'k' is the working K-cycle (solver/multigrid._kcycle_correction
    semantics in-kernel): kcycle_base/kcycle_rel_tol mirror
    multigrid.hpp:364-380; levels with a possible second FCG iteration
    get a dedicated e1-stash frame (RVk)."""
    import math

    L = len(levels_meta) - 1
    Rc_last = levels_meta[-1]["Rc"]
    lv = []
    for l in range(L):
        m = levels_meta[l]
        qs, _, _, pad_lo, pad_hi = _plan(m["offsets"], m["R"])
        lv.append(
            dict(
                nd=m["nd"],
                R=m["R"],
                qs=qs,
                pad_lo=pad_lo,
                pad_hi=pad_hi,
                C=_chunk_rows(m["R"]),
                itemsize=m["itemsize"],
                itp=m["iters_pre"],
                rp=float(m["relax_pre"]),
                ito=m["iters_post"],
                ro=float(m["relax_post"]),
                itm=m.get("iters_mid", m["iters_post"]),
                rm=float(m.get("relax_mid", m["relax_post"])),
                stride=m["stride"],
            )
        )
    # frame geometry: coverage of each transfer (writes land in zeroed pad)
    R_next = [lv[l + 1]["R"] if l + 1 < L else Rc_last for l in range(L)]
    for l in range(L):
        e = lv[l]
        S = e["stride"]
        if S < LANES:
            assert LANES % (2 * S) == 0
            Cc = _chunk_rows(max(R_next[l], 8))
            wcov = _roundup(R_next[l], Cc)  # coarse b rows written
            e["tr"] = dict(kind="lane", S=S, Cc=Cc, wcov=wcov,
                           rcov=2 * wcov)
            Cf = _even_chunk(e["R"])
            fcov = _roundup(e["R"], Cf)  # fine x rows written by prolong
            e["pr"] = dict(kind="lane", S=S, Cf=Cf, fcov=fcov,
                           ccov=fcov // 2)
        else:
            Sr = S // LANES
            Sc = _row_sub(Sr)
            ng = -(-R_next[l] // Sr)
            e["tr"] = dict(kind="rows", Sr=Sr, Sc=Sc, ng=ng,
                           wcov=ng * Sr, rcov=2 * ng * Sr)
            ngp = -(-e["R"] // (2 * Sr))
            e["pr"] = dict(kind="rows", Sr=Sr, Sc=Sc, ng=ngp,
                           fcov=ngp * 2 * Sr, ccov=ngp * Sr)
    # allocated frame rows per level 0..L (level L = coarsest)
    RVx = [0] * (L + 1)
    RVb = [0] * (L + 1)
    RVr = [0] * L
    for l in range(L):
        RVx[l] = max(RVx[l], lv[l]["R"], lv[l]["pr"]["fcov"])
        RVr[l] = max(lv[l]["R"], lv[l]["tr"]["rcov"])
        RVb[l] = max(RVb[l], lv[l]["R"])
        RVb[l + 1] = max(RVb[l + 1], lv[l]["tr"]["wcov"])
        RVx[l + 1] = max(RVx[l + 1], lv[l]["pr"]["ccov"])
    RVx[L] = max(RVx[L], Rc_last)
    RVb[L] = max(RVb[L], Rc_last)
    # K-cycle bookkeeping: which levels' coarse corrections are
    # FCG-accelerated, and which child levels need an e1-stash frame
    # (only when a second inner solve is possible: rel_tol > 0 or nan)
    kacc = [False] * max(L, 1)
    krt = float(kcycle_rel_tol)
    two_possible = math.isnan(krt) or krt > 0  # inf counts as > 0
    if mode == "k":
        for l in range(L):
            kacc[l] = (l % max(int(kcycle_base), 1) == 0) and (l + 1 < L)
    RVk = [0] * (L + 1)
    for l in range(L):
        if kacc[l] and two_possible:
            RVk[l + 1] = lv[l + 1]["R"]

    def _k_visits(l):
        if l == L:
            return 1
        n = 1 + _k_visits(l + 1)
        if kacc[l] and two_possible:
            n += _k_visits(l + 1)
        return n

    visits = _k_visits(0) if mode == "k" else _visit_count(L, mode)
    plan = dict(L=L, lv=lv, RVx=RVx, RVb=RVb, RVr=RVr, Rc=Rc_last,
                mode=mode, mid_case=mid_case, visits=visits,
                kacc=kacc, krt=krt, RVk=RVk,
                nk=sum(1 for r in RVk if r))
    frame = LANES * 4
    vmem = 0
    for l in range(L):
        e = lv[l]
        vmem += e["nd"] * e["R"] * LANES * e["itemsize"]  # diags
        vmem += e["R"] * frame  # dinv
        vmem += (e["R"] + e["pad_lo"] + e["pad_hi"]) * frame  # w
        vmem += RVr[l] * frame
    for l in range(L + 1):
        vmem += (RVx[l] + RVb[l] + RVk[l]) * frame
    vmem += (Rc_last * LANES) ** 2 * 4  # Minv
    vmem += lv[0]["R"] * frame * 2 if L else 0  # in/out DMA landing slack
    plan["vmem"] = vmem
    return plan


def vcycle_vmem_fits(plan) -> bool:
    return plan["vmem"] <= cg_vmem_budget_bytes()


def _zero(ref, rows):
    C = _chunk_rows(rows) if rows % 8 == 0 else rows

    def body(i, _):
        ref[pl.ds(i * C, C), :] = jnp.zeros((C, LANES), jnp.float32)
        return 0

    if rows % C == 0 and rows // C > 1:
        jax.lax.fori_loop(0, rows // C, body, 0)
    else:
        ref[pl.ds(0, rows), :] = jnp.zeros((rows, LANES), jnp.float32)


def _stage(x_ref, w_ref, w_lo, C, n_chunks):
    def body(c, _):
        c0 = c * C
        w_ref[pl.ds(w_lo + c0, C), :] = x_ref[pl.ds(c0, C), :]
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _vcycle_zero_init(plan, xs, bs, rs, ws):
    """One-time frame zeroing: all pad regions the cycle reads must be
    zero.  Idempotent across repeated _vcycle_refs calls on the same
    scratch — the cycle never writes the regions it relies on being zero
    (rs tails, xs[l+1] read-overrun tails stay tail-only by geometry)."""
    L = plan["L"]
    lv = plan["lv"]
    for l in range(L + 1):
        _zero(xs[l], plan["RVx"][l])
        if l > 0:
            _zero(bs[l], plan["RVb"][l])
    for l in range(L):
        _zero(rs[l], plan["RVr"][l])
        e = lv[l]
        Rw = e["R"] + e["pad_lo"] + e["pad_hi"]
        if e["pad_lo"]:
            ws[l][pl.ds(0, e["pad_lo"]), :] = jnp.zeros(
                (e["pad_lo"], LANES), jnp.float32)
        if e["pad_hi"]:
            ws[l][pl.ds(Rw - e["pad_hi"], e["pad_hi"]), :] = jnp.zeros(
                (e["pad_hi"], LANES), jnp.float32)


def _vcycle_refs(plan, diags, dinv, minv, xs, bs, rs, ws, use_x0=False,
                 ks=()):
    """One multigrid cycle on VMEM refs: reads bs[0] (rows [0, R0)
    valid), writes the result into xs[0].  With use_x0 False the level-0
    pre-smooth starts from zero (xs[0] need not be initialized); with
    True it smooths from the current xs[0].  plan['mode'] 'v'/'w'/'f'
    unrolls the reference recursion (multigrid.cpp:445-483: second
    coarse visit after a mid-smooth; F drops to V on the second visit);
    'k' replaces the coarse correction with the FCG(2)-accelerated
    K-cycle step (scalar formulas = the reference kcycle_step_1/2
    kernels; ks = per-level e1-stash refs for levels with RVk > 0).
    Caller guarantees _vcycle_zero_init ran once on this scratch."""
    import math

    L = plan["L"]
    lv = plan["lv"]
    mode = plan.get("mode", "v")
    kidx = {}
    for lvl in range(L + 1):
        if plan.get("RVk", [0] * (L + 1))[lvl]:
            kidx[lvl] = len(kidx)

    # ---- per-level primitive passes ------------------------------------
    def smooth_update(l, relax):
        e = lv[l]
        C, n_chunks = e["C"], e["R"] // e["C"]
        _stage(xs[l], ws[l], e["pad_lo"], C, n_chunks)

        def body(c, _):
            c0 = c * C
            t = _spmv_chunk(diags[l], ws[l], c0, C, qs=e["qs"],
                            pad_lo=e["pad_lo"])
            xs[l][pl.ds(c0, C), :] = xs[l][pl.ds(c0, C), :] + relax * (
                dinv[l][pl.ds(c0, C), :].astype(jnp.float32)
                * (bs[l][pl.ds(c0, C), :] - t)
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    def smooth_from_zero(l, relax):
        e = lv[l]
        C, n_chunks = e["C"], e["R"] // e["C"]

        def body(c, _):
            c0 = c * C
            xs[l][pl.ds(c0, C), :] = relax * (
                dinv[l][pl.ds(c0, C), :].astype(jnp.float32)
                * bs[l][pl.ds(c0, C), :]
            )
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    def residual(l):
        e = lv[l]
        C, n_chunks = e["C"], e["R"] // e["C"]
        _stage(xs[l], ws[l], e["pad_lo"], C, n_chunks)

        def body(c, _):
            c0 = c * C
            t = _spmv_chunk(diags[l], ws[l], c0, C, qs=e["qs"],
                            pad_lo=e["pad_lo"])
            rs[l][pl.ds(c0, C), :] = bs[l][pl.ds(c0, C), :] - t
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    def restrict(l):
        tr = lv[l]["tr"]
        if tr["kind"] == "lane":
            m0, m1 = _lane_mats_inkernel(tr["S"])
            Cc = tr["Cc"]
            # even/odd row deinterleave as constant 0/1 MXU matmuls:
            # Mosaic's sublane dynamic_gather is single-vreg only
            # ("Multiple source vregs along gather dimension" on chip),
            # and these are FIXED permutations — same trick as the
            # stride-1 lane compaction (PERF.md)
            r_c = jax.lax.broadcasted_iota(jnp.int32, (Cc, 2 * Cc), 0)
            c_c = jax.lax.broadcasted_iota(jnp.int32, (Cc, 2 * Cc), 1)
            Ee = (c_c == 2 * r_c).astype(jnp.float32)
            Eo = (c_c == 2 * r_c + 1).astype(jnp.float32)

            def body(c, _):
                c0 = c * Cc
                fb = rs[l][pl.ds(2 * c0, 2 * Cc), :]
                fe = jax.lax.dot_general(
                    Ee, fb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                fo = jax.lax.dot_general(
                    Eo, fb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                t = jax.lax.dot_general(
                    fe, m0, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    fo, m1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                bs[l + 1][pl.ds(c0, Cc), :] = t
                return 0

            jax.lax.fori_loop(0, tr["wcov"] // Cc, body, 0)
        else:
            Sr, Sc = tr["Sr"], tr["Sc"]

            def body(g, _):
                for j in range(Sr // Sc):
                    c0 = g * Sr + j * Sc
                    f0 = g * 2 * Sr + j * Sc
                    bs[l + 1][pl.ds(c0, Sc), :] = (
                        rs[l][pl.ds(f0, Sc), :]
                        + rs[l][pl.ds(f0 + Sr, Sc), :]
                    )
                return 0

            jax.lax.fori_loop(0, tr["ng"], body, 0)

    def prolong_add(l):
        pr = lv[l]["pr"]
        if pr["kind"] == "lane":
            m0, m1 = _lane_mats_inkernel(pr["S"])
            Cf = pr["Cf"]
            h = Cf // 2
            # row interleave (even rows <- ge, odd <- go) as constant 0/1
            # MXU matmuls — sublane dynamic_gather is single-vreg only
            r_f = jax.lax.broadcasted_iota(jnp.int32, (Cf, h), 0)
            c_f = jax.lax.broadcasted_iota(jnp.int32, (Cf, h), 1)
            Ie = (r_f == 2 * c_f).astype(jnp.float32)
            Io = (r_f == 2 * c_f + 1).astype(jnp.float32)

            def body(c, _):
                f0 = c * Cf
                cb = xs[l + 1][pl.ds(c * h, h), :]
                ge = jax.lax.dot_general(
                    cb, m0, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                go = jax.lax.dot_general(
                    cb, m1, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                add = jax.lax.dot_general(
                    Ie, ge, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    Io, go, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xs[l][pl.ds(f0, Cf), :] = xs[l][pl.ds(f0, Cf), :] + add
                return 0

            jax.lax.fori_loop(0, pr["fcov"] // Cf, body, 0)
        else:
            Sr, Sc = pr["Sr"], pr["Sc"]

            def body(g, _):
                for h_ in range(2):
                    for j in range(Sr // Sc):
                        f0 = g * 2 * Sr + h_ * Sr + j * Sc
                        c0 = g * Sr + j * Sc
                        xs[l][pl.ds(f0, Sc), :] = (
                            xs[l][pl.ds(f0, Sc), :]
                            + xs[l + 1][pl.ds(c0, Sc), :]
                        )
                return 0

            jax.lax.fori_loop(0, pr["ng"], body, 0)

    def coarse_solve():
        # x_L = Minv @ b_L (dense, exact; Minv stored transposed)
        Rc = plan["Rc"]
        acc = jnp.zeros((1, Rc * LANES), jnp.float32)
        for rp_ in range(Rc):
            row = bs[L][pl.ds(rp_, 1), :]
            acc = acc + jax.lax.dot_general(
                row, minv[pl.ds(rp_ * LANES, LANES), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        for rr in range(Rc):
            xs[L][pl.ds(rr, 1), :] = acc[:, rr * LANES:(rr + 1) * LANES]

    # ---- cycle recursion (trace-time static unroll) ---------------------
    # Faithful to MultigridState::run_mg_cycle (multigrid.cpp:403-487):
    # pre-smooth runs on first-of-cycle visits (or when mid_case routes
    # the mid role through the pre smoother), the W/F second coarse visit
    # re-enters level l+1 with the SAME restricted rhs and the current
    # coarse solution (:452-461; F drops to V), prolongation happens once
    # per parent visit, post-smooth runs on end-of-cycle visits (or when
    # mid_case routes through the post smoother), and the standalone mid
    # smoother fires at the end of non-final W/F visits (:478-485).
    mid_case = plan.get("mid_case", "standalone")

    def kcycle_correction(l):
        """FCG(2)-accelerated coarse correction at level l+1 —
        solver/multigrid._kcycle_correction executed on VMEM refs with
        the reference kcycle_step_1/2 scalar formulas (reference/solver/
        multigrid_kernels.cpp:55-104) and the kcycle_check_stop policy
        (:106-121) deciding the second inner solve via pl.when."""
        ln = l + 1
        en = lv[ln]
        Cn, ncn = en["C"], en["R"] // en["C"]
        krt = plan["krt"]
        two_always = math.isnan(krt) or (math.isinf(krt) and krt > 0)
        two_never = (not two_always) and krt <= 0
        kref = ks[kidx[ln]] if ln in kidx else None

        # inner solve 1: c1 -> xs[ln]
        visit(ln, "k", True, True, True)

        # v = A_{ln} c1 -> rs[ln]; rho = <c1,v>, alpha = <c1,b>, bb = <b,b>
        # (the UNSCALED c1 is stashed here so the second FCG step can
        # form gamma = <c1, A c2> directly — no divide-back by temp,
        # which would NaN when alpha underflows)
        _stage(xs[ln], ws[ln], en["pad_lo"], Cn, ncn)

        def vpass(c, carry):
            rho_a, al_a, bb_a = carry
            c0 = c * Cn
            t = _spmv_chunk(diags[ln], ws[ln], c0, Cn, qs=en["qs"],
                            pad_lo=en["pad_lo"])
            rs[ln][pl.ds(c0, Cn), :] = t
            c1c = xs[ln][pl.ds(c0, Cn), :]
            if kref is not None:
                kref[pl.ds(c0, Cn), :] = c1c
            bc = bs[ln][pl.ds(c0, Cn), :]
            return (rho_a + jnp.sum(c1c * t), al_a + jnp.sum(c1c * bc),
                    bb_a + jnp.sum(bc * bc))

        rho, alpha, bb = jax.lax.fori_loop(
            0, ncn, vpass,
            (jnp.float32(0), jnp.float32(0), jnp.float32(0)),
        )
        temp = alpha / rho  # raw: kcycle_step_1 guards on is_finite
        fin = jnp.isfinite(temp)
        tempe = jnp.where(fin, temp, 1.0)

        # kcycle_step_1: b -= temp v (the updated residual g2, reused as
        # the second solve's rhs); e1 = temp c1 lands in xs[ln]
        def s1(c, g2):
            c0 = c * Cn
            bc = bs[ln][pl.ds(c0, Cn), :]
            nb = jnp.where(fin, bc - tempe * rs[ln][pl.ds(c0, Cn), :], bc)
            bs[ln][pl.ds(c0, Cn), :] = nb
            e1 = jnp.where(
                fin, tempe * xs[ln][pl.ds(c0, Cn), :],
                xs[ln][pl.ds(c0, Cn), :],
            )
            xs[ln][pl.ds(c0, Cn), :] = e1
            return g2 + jnp.sum(nb * nb)

        g2sq = jax.lax.fori_loop(0, ncn, s1, jnp.float32(0))
        if two_never:
            return

        def second_body():
            # inner solve 2: c2 -> xs[ln] (zero-guess smooth overwrites;
            # e1 survives in kref)
            visit(ln, "k", True, True, True)
            _stage(xs[ln], ws[ln], en["pad_lo"], Cn, ncn)

            def wpass(c, carry):
                ga, be, ze = carry
                c0 = c * Cn
                w = _spmv_chunk(diags[ln], ws[ln], c0, Cn, qs=en["qs"],
                                pad_lo=en["pad_lo"])
                c2c = xs[ln][pl.ds(c0, Cn), :]
                c1c = kref[pl.ds(c0, Cn), :]
                bc = bs[ln][pl.ds(c0, Cn), :]
                return (ga + jnp.sum(c1c * w), be + jnp.sum(c2c * w),
                        ze + jnp.sum(c2c * bc))

            gamma, beta_s, zeta = jax.lax.fori_loop(
                0, ncn, wpass,
                (jnp.float32(0), jnp.float32(0), jnp.float32(0)),
            )
            scalar_d = zeta / (beta_s - gamma * gamma / rho)
            scalar_e = 1.0 - gamma / alpha * scalar_d
            ok = jnp.isfinite(scalar_d) & jnp.isfinite(scalar_e)
            se = jnp.where(ok, scalar_e, 1.0)
            sd = jnp.where(ok, scalar_d, 0.0)
            # e1 = (temp if finite else 1) * c1 — rebuild from the
            # unscaled stash so the combine never divides by temp
            e1s = se * jnp.where(fin, tempe, 1.0)

            def comb(c, _):
                c0 = c * Cn
                xs[ln][pl.ds(c0, Cn), :] = (
                    e1s * kref[pl.ds(c0, Cn), :]
                    + sd * xs[ln][pl.ds(c0, Cn), :]
                )
                return 0

            jax.lax.fori_loop(0, ncn, comb, 0)

        if two_always:
            second_body()
        else:
            # kcycle_check_stop: second iteration iff the updated
            # residual missed rel_tol * ||b||
            pl.when(g2sq > krt * krt * bb)(second_body)

    def visit(l, cyc, first, end, zero):
        if l == L:
            coarse_solve()
            return
        e = lv[l]
        use_pre = first or mid_case in ("both", "pre_smoother")
        if use_pre:
            if zero:
                smooth_from_zero(l, e["rp"])
                extra = e["itp"] - 1
            else:
                extra = e["itp"]
            for _ in range(extra):
                smooth_update(l, e["rp"])
        residual(l)
        restrict(l)
        if cyc == "k" and plan["kacc"][l]:
            kcycle_correction(l)
        else:
            visit(l + 1, cyc, True, cyc in ("v", "k"), True)
            if cyc in ("w", "f") and l + 1 < L:
                # second coarse visit continues from the first visit's
                # solution with the same rhs (multigrid.cpp:452-461)
                visit(l + 1, "v" if cyc == "f" else cyc, False, True,
                      False)
        prolong_add(l)
        if end or mid_case in ("both", "post_smoother"):
            for _ in range(e["ito"]):
                smooth_update(l, e["ro"])
        if cyc in ("w", "f") and not end and mid_case == "standalone":
            for _ in range(e["itm"]):
                smooth_update(l, e["rm"])

    visit(0, mode, True, True, not use_x0)


def _mg_kernel(*refs, plan, use_x0):
    L = plan["L"]
    # ---- unpack refs --------------------------------------------------
    i = 0
    diags = refs[i:i + L]; i += L
    dinv = refs[i:i + L]; i += L
    minv = refs[i]; i += 1
    b_hbm = refs[i]; i += 1
    x0_hbm = None
    if use_x0:
        x0_hbm = refs[i]; i += 1
    xout_hbm = refs[i]; i += 1
    xs = refs[i:i + L + 1]; i += L + 1
    bs = refs[i:i + L + 1]; i += L + 1
    rs = refs[i:i + L]; i += L
    ws = refs[i:i + L]; i += L
    nk = plan.get("nk", 0)
    ks = refs[i:i + nk]; i += nk
    sems = refs[i]

    _vcycle_zero_init(plan, xs, bs, rs, ws)

    # ---- DMA in --------------------------------------------------------
    R0 = plan["lv"][0]["R"]
    cp_b = pltpu.make_async_copy(b_hbm, bs[0].at[pl.ds(0, R0)], sems.at[0])
    cp_b.start()
    if use_x0:
        cp_x = pltpu.make_async_copy(
            x0_hbm, xs[0].at[pl.ds(0, R0)], sems.at[1])
        cp_x.start()
        cp_x.wait()
    cp_b.wait()

    _vcycle_refs(plan, diags, dinv, minv, xs, bs, rs, ws, use_x0=use_x0,
                 ks=ks)

    # ---- DMA out --------------------------------------------------------
    cp_o = pltpu.make_async_copy(xs[0].at[pl.ds(0, R0)], xout_hbm, sems.at[2])
    cp_o.start()
    cp_o.wait()


@logged_kernel
def mg_vmem_vcycle(plan, diags_list, dinv2_list, minv2, b2, x02=None,
                   interpret=False):
    """One V-cycle, whole hierarchy VMEM-resident.

    diags_list[l]: (nd_l, R_l, 128); dinv2_list[l]: (R_l, 128) f32 frames;
    minv2: (Rc*128, Rc*128) f32 dense inverse of the coarsest operator;
    b2 / x02: (R_0, 128) f32 frames.  Returns the (R_0, 128) result."""
    L = plan["L"]
    use_x0 = x02 is not None
    kernel = functools.partial(_mg_kernel, plan=plan, use_x0=use_x0)
    R0 = plan["lv"][0]["R"]
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * L)
        + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # minv
        + [pl.BlockSpec(memory_space=pl.ANY)]  # b
        + ([pl.BlockSpec(memory_space=pl.ANY)] if use_x0 else [])
    )
    scratch = []
    for l in range(L + 1):
        scratch.append(pltpu.VMEM((plan["RVx"][l], LANES), jnp.float32))
    for l in range(L + 1):
        scratch.append(pltpu.VMEM((plan["RVb"][l], LANES), jnp.float32))
    for l in range(L):
        scratch.append(pltpu.VMEM((plan["RVr"][l], LANES), jnp.float32))
    for l in range(L):
        e = plan["lv"][l]
        scratch.append(
            pltpu.VMEM((e["R"] + e["pad_lo"] + e["pad_hi"], LANES),
                       jnp.float32)
        )
    for rk in plan.get("RVk", []):
        if rk:
            scratch.append(pltpu.VMEM((rk, LANES), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((3,)))
    args = list(diags_list) + list(dinv2_list) + [minv2, b2]
    if use_x0:
        args.append(x02)
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R0, LANES), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


# -- fused AMG-preconditioned CG ----------------------------------------------


def mg_cg_vmem_fits(plan, nd_a: int, R: int, a_itemsize: int = 4,
                    halo_a: int = 0) -> bool:
    """CG working set (A diags + x/r/q + halo-padded p) plus the V-cycle
    hierarchy (plan['vmem'] minus the standalone kernel's bs[0] frame and
    in/out DMA slack — r0/x0 land directly in the CG frames and bs[0]
    aliases the CG residual)."""
    frame = R * LANES * 4
    cg_bytes = nd_a * R * LANES * a_itemsize + (
        3 + (R + halo_a) / max(R, 1)
    ) * frame
    return cg_bytes + plan["vmem"] - 3 * frame <= cg_vmem_budget_bytes()


def _mg_cg_kernel(*refs, plan, qs_a, pad_a, R, use_implicit,
                  flexible=False):
    """Whole-solve fused AMG-preconditioned CG: the CG loop of
    ops/pallas_cg_ilu._cg_ilu_kernel with precondition() = one full
    V-cycle on the VMEM-resident hierarchy (z = M r, M = one multigrid
    cycle from zero).  bs[0] of the cycle aliases the CG residual frame;
    z is the cycle's xs[0].  With flexible=True the beta numerator is
    FCG's Polak-Ribiere rho_t = <r_new - r_old, z_new> (fcg.cpp) — the
    update pass stashes r_old in the then-dead q frame, so a varying
    (e.g. K-cycle) preconditioner costs no extra VMEM.  stats out:
    [iterations, monitored_sq, converged]."""
    L = plan["L"]
    i = 0
    scal = refs[i]; i += 1
    iscal = refs[i]; i += 1
    a_diags = refs[i]; i += 1
    diags = refs[i:i + L]; i += L
    dinv = refs[i:i + L]; i += L
    minv = refs[i]; i += 1
    r0_hbm = refs[i]; i += 1
    x0_hbm = refs[i]; i += 1
    x_hbm = refs[i]; i += 1
    r_hbm = refs[i]; i += 1
    stats = refs[i]; i += 1
    x_s = refs[i]; i += 1
    r_s = refs[i]; i += 1
    q_s = refs[i]; i += 1
    p_s = refs[i]; i += 1
    xs = refs[i:i + L + 1]; i += L + 1
    bs_rest = refs[i:i + L]; i += L
    rs = refs[i:i + L]; i += L
    ws = refs[i:i + L]; i += L
    nk = plan.get("nk", 0)
    ks = refs[i:i + nk]; i += nk
    sems = refs[i]

    bs = (r_s,) + tuple(bs_rest)
    z_s = xs[0]

    tol_sq = scal[0]
    max_iters = iscal[0]
    C = _chunk_rows(R)
    n_chunks = R // C
    pa_lo, pa_hi = pad_a
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
    _vcycle_zero_init(plan, xs, bs, rs, ws)

    def precondition():
        """z_s (= xs[0]) = one V-cycle from zero on b = r_s (= bs[0])."""
        _vcycle_refs(plan, diags, dinv, minv, xs, bs, rs, ws, ks=ks)

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

        def spmv_chunk_fn(c, pq):
            c0 = c * C
            q_c = _spmv_chunk(a_diags, p_s, c0, C, qs=qs_a, pad_lo=pa_lo)
            q_s[pl.ds(c0, C), :] = q_c
            p_c = p_s[pl.ds(pa_lo + c0, C), :]
            return pq + jnp.sum(p_c * q_c)

        pq = jax.lax.fori_loop(0, n_chunks, spmv_chunk_fn, jnp.float32(0))
        alpha = jnp.where(pq != 0, rho / jnp.where(pq != 0, pq, 1.0), 0.0)

        def update_chunk(c, rr_n):
            c0 = c * C
            p_c = p_s[pl.ds(pa_lo + c0, C), :]
            x_s[pl.ds(c0, C), :] = x_s[pl.ds(c0, C), :] + alpha * p_c
            r_old_c = r_s[pl.ds(c0, C), :]
            r_c = r_old_c - alpha * q_s[pl.ds(c0, C), :]
            r_s[pl.ds(c0, C), :] = r_c
            if flexible:
                q_s[pl.ds(c0, C), :] = r_old_c  # q is dead: stash r_old
            return rr_n + jnp.sum(r_c * r_c)

        rr_new = jax.lax.fori_loop(0, n_chunks, update_chunk,
                                   jnp.float32(0))

        precondition()

        def rho_chunk(c, acc):
            rho_a, rold_a = acc
            c0 = c * C
            z_c = z_s[pl.ds(c0, C), :]
            rho_a = rho_a + jnp.sum(r_s[pl.ds(c0, C), :] * z_c)
            if flexible:
                rold_a = rold_a + jnp.sum(q_s[pl.ds(c0, C), :] * z_c)
            return (rho_a, rold_a)

        rho_new, rold_z = jax.lax.fori_loop(
            0, n_chunks, rho_chunk, (jnp.float32(0), jnp.float32(0))
        )
        num = rho_new - rold_z if flexible else rho_new
        beta = jnp.where(rho != 0, num / jnp.where(rho != 0, rho, 1.0),
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
def mg_cg_vmem_solve(A_dia, plan, diags_list, dinv2_list, minv2, r0_2,
                     x0_2, *, tol_sq_eff, max_iters, use_implicit=False,
                     flexible=False, interpret=False):
    """Run AMG-preconditioned CG to convergence in one Pallas kernel.

    A_dia: the fine operator (matrix.dia.Dia); plan/diags/dinv/minv:
    the V-cycle hierarchy (build_vcycle_plan; plan.lv[0].R must equal
    A's frame rows); r0_2/x0_2: (R, 128) f32 frames.  Returns
    (x2, iterations, monitored_sq, converged)."""
    a_diags = A_dia.diags
    nd, R, lanes = a_diags.shape
    assert lanes == LANES and plan["lv"][0]["R"] == R
    L = plan["L"]
    qs_a, _, _, pa_lo, pa_hi = _plan(A_dia.offsets, R)
    kernel = functools.partial(
        _mg_cg_kernel, plan=plan, qs_a=qs_a, pad_a=(pa_lo, pa_hi), R=R,
        use_implicit=use_implicit, flexible=flexible,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, a_diags] + list(diags_list) + list(dinv2_list) + [
        minv2, r0_2, x0_2,
    ]
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * L + 1)
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
    )
    Rp = R + pa_lo + pa_hi
    scratch = [
        pltpu.VMEM((R, LANES), jnp.float32),   # x
        pltpu.VMEM((R, LANES), jnp.float32),   # r (= V-cycle bs[0])
        pltpu.VMEM((R, LANES), jnp.float32),   # q
        pltpu.VMEM((Rp, LANES), jnp.float32),  # p (A-halo-padded)
    ]
    for l in range(L + 1):
        scratch.append(pltpu.VMEM((plan["RVx"][l], LANES), jnp.float32))
    for l in range(1, L + 1):
        scratch.append(pltpu.VMEM((plan["RVb"][l], LANES), jnp.float32))
    for l in range(L):
        scratch.append(pltpu.VMEM((plan["RVr"][l], LANES), jnp.float32))
    for l in range(L):
        e = plan["lv"][l]
        scratch.append(
            pltpu.VMEM((e["R"] + e["pad_lo"] + e["pad_hi"], LANES),
                       jnp.float32)
        )
    for rk in plan.get("RVk", []):
        if rk:
            scratch.append(pltpu.VMEM((rk, LANES), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nd * 5 + 8) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 6) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


# -- whole-solve fused multigrid (criteria-driven cycles in one kernel) --------


def mg_solve_vmem_fits(plan) -> bool:
    """The standalone-solve kernel adds one stop-test pass but no frames
    beyond the single-cycle kernel's."""
    return plan["vmem"] <= cg_vmem_budget_bytes()


def _mg_solve_kernel(*refs, plan):
    """Criteria-driven multigrid SOLVE in one kernel: lax.while_loop of
    full V-cycles over the VMEM-resident hierarchy with the true-residual
    stop test evaluated in-kernel (the generic Multigrid._solve_impl
    dispatches one cycle kernel + an XLA residual SpMV per iteration; it
    also monitors the true residual, so implicit/true modes coincide).
    x persists in xs[0] across cycles (use_x0 smoothing).  stats out:
    [iterations, monitored_sq, converged]."""
    L = plan["L"]
    i = 0
    scal = refs[i]; i += 1
    iscal = refs[i]; i += 1
    diags = refs[i:i + L]; i += L
    dinv = refs[i:i + L]; i += L
    minv = refs[i]; i += 1
    b_hbm = refs[i]; i += 1
    x0_hbm = refs[i]; i += 1
    x_hbm = refs[i]; i += 1
    stats = refs[i]; i += 1
    xs = refs[i:i + L + 1]; i += L + 1
    bs = refs[i:i + L + 1]; i += L + 1
    rs = refs[i:i + L]; i += L
    ws = refs[i:i + L]; i += L
    nk = plan.get("nk", 0)
    ks = refs[i:i + nk]; i += nk
    sems = refs[i]

    tol_sq = scal[0]
    max_iters = iscal[0]
    e0 = plan["lv"][0]
    R0, C = e0["R"], e0["C"]
    n_chunks = R0 // C

    _vcycle_zero_init(plan, xs, bs, rs, ws)
    cp_b = pltpu.make_async_copy(b_hbm, bs[0].at[pl.ds(0, R0)], sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, xs[0].at[pl.ds(0, R0)], sems.at[1])
    cp_b.start()
    cp_x.start()
    cp_b.wait()
    cp_x.wait()

    def true_rr():
        _stage(xs[0], ws[0], e0["pad_lo"], C, n_chunks)

        def body(c, acc):
            c0 = c * C
            t = _spmv_chunk(diags[0], ws[0], c0, C, qs=e0["qs"],
                            pad_lo=e0["pad_lo"])
            r_c = bs[0][pl.ds(c0, C), :] - t
            return acc + jnp.sum(r_c * r_c)

        return jax.lax.fori_loop(0, n_chunks, body, jnp.float32(0))

    def cond(st):
        it, rr = st
        return (it < max_iters) & ~(rr <= tol_sq)  # NaN: keep going

    def body(st):
        it, _ = st
        _vcycle_refs(plan, diags, dinv, minv, xs, bs, rs, ws, use_x0=True,
                     ks=ks)
        return (it + 1, true_rr())

    it, rr = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), jnp.float32(jnp.inf))
    )

    cp_o = pltpu.make_async_copy(xs[0].at[pl.ds(0, R0)], x_hbm, sems.at[2])
    cp_o.start()
    cp_o.wait()
    stats[0] = it.astype(jnp.float32)
    stats[1] = rr
    stats[2] = (rr <= tol_sq).astype(jnp.float32)


@logged_kernel
def mg_vmem_solve(plan, diags_list, dinv2_list, minv2, b2, x02, *,
                  tol_sq_eff, max_iters, interpret=False):
    """Run the criteria-driven multigrid solve in one Pallas kernel.
    Returns (x2, iterations, monitored_sq, converged)."""
    L = plan["L"]
    R0 = plan["lv"][0]["R"]
    kernel = functools.partial(_mg_solve_kernel, plan=plan)
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal] + list(diags_list) + list(dinv2_list) + [
        minv2, b2, x02,
    ]
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * L + 1)
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
    )
    scratch = []
    for l in range(L + 1):
        scratch.append(pltpu.VMEM((plan["RVx"][l], LANES), jnp.float32))
    for l in range(L + 1):
        scratch.append(pltpu.VMEM((plan["RVb"][l], LANES), jnp.float32))
    for l in range(L):
        scratch.append(pltpu.VMEM((plan["RVr"][l], LANES), jnp.float32))
    for l in range(L):
        e = plan["lv"][l]
        scratch.append(
            pltpu.VMEM((e["R"] + e["pad_lo"] + e["pad_hi"], LANES),
                       jnp.float32)
        )
    for rk in plan.get("RVk", []):
        if rk:
            scratch.append(pltpu.VMEM((rk, LANES), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((3,)))
    x2, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R0, LANES), b2.dtype),
            jax.ShapeDtypeStruct((3,), jnp.float32),
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0


# -- fused AMG-preconditioned BiCGSTAB ----------------------------------------


def mg_bicgstab_vmem_fits(plan, nd_a: int, R: int, a_itemsize: int = 4,
                          halo_a: int = 0) -> bool:
    """BiCGSTAB working set (A diags + x/r/rr/p/v/t/s/u1 + halo-padded
    staging + the dedicated V-cycle b0 frame) plus the hierarchy
    (plan['vmem'] minus its bs[0] and DMA slack, both replaced by frames
    counted here)."""
    frame = R * LANES * 4
    solver_bytes = nd_a * R * LANES * a_itemsize + (
        9 + (R + halo_a) / max(R, 1)
    ) * frame
    return solver_bytes + plan["vmem"] - 3 * frame <= cg_vmem_budget_bytes()


def _bicgstab_mg_kernel(*refs, plan, qs_a, pad_a, R, use_implicit):
    """Right-preconditioned BiCGSTAB (solver/bicgstab.py semantics:
    y = M p, v = A y, half-step check on s, z = M s, t = A z,
    x += alpha y + omega z) with M = one AMG V-cycle from zero over the
    VMEM-resident hierarchy.  M applies to two different sources (p, s),
    so the cycle's bs[0] is a dedicated frame the rhs is copied into;
    the result is copied out of the cycle's xs[0]."""
    L = plan["L"]
    i = 0
    scal = refs[i]; i += 1
    iscal = refs[i]; i += 1
    a_diags = refs[i]; i += 1
    diags = refs[i:i + L]; i += L
    dinv = refs[i:i + L]; i += L
    minv = refs[i]; i += 1
    r0_hbm = refs[i]; i += 1
    x0_hbm = refs[i]; i += 1
    x_hbm = refs[i]; i += 1
    r_hbm = refs[i]; i += 1
    stats = refs[i]; i += 1
    x_s = refs[i]; i += 1
    r_s = refs[i]; i += 1
    rr_s = refs[i]; i += 1
    p_s = refs[i]; i += 1
    v_s = refs[i]; i += 1
    t_s = refs[i]; i += 1
    s_s = refs[i]; i += 1
    u1_s = refs[i]; i += 1
    w_s = refs[i]; i += 1
    b0_s = refs[i]; i += 1
    xs = refs[i:i + L + 1]; i += L + 1
    bs_rest = refs[i:i + L]; i += L
    rs = refs[i:i + L]; i += L
    ws = refs[i:i + L]; i += L
    nk = plan.get("nk", 0)
    ks = refs[i:i + nk]; i += nk
    sems = refs[i]

    bs = (b0_s,) + tuple(bs_rest)
    tol_sq = scal[0]
    max_iters = iscal[0]
    C = _chunk_rows(R)
    n_chunks = R // C
    pa_lo, pa_hi = pad_a
    Rw = R + pa_lo + pa_hi

    cp_r = pltpu.make_async_copy(r0_hbm, r_s, sems.at[0])
    cp_x = pltpu.make_async_copy(x0_hbm, x_s, sems.at[1])
    cp_r.start()
    cp_x.start()
    cp_r.wait()
    cp_x.wait()

    if pa_lo:
        w_s[0:pa_lo] = jnp.zeros((pa_lo, LANES), jnp.float32)
    if pa_hi:
        w_s[Rw - pa_hi:Rw] = jnp.zeros((pa_hi, LANES), jnp.float32)
    _vcycle_zero_init(plan, xs, bs, rs, ws)

    def copy_rows(src_s, dst_s):
        def cp(c, _):
            c0 = c * C
            dst_s[pl.ds(c0, C), :] = src_s[pl.ds(c0, C), :]
            return 0

        jax.lax.fori_loop(0, n_chunks, cp, 0)

    def stage(src_s):
        def cp(c, _):
            c0 = c * C
            w_s[pl.ds(pa_lo + c0, C), :] = src_s[pl.ds(c0, C), :]
            return 0

        jax.lax.fori_loop(0, n_chunks, cp, 0)

    def m_apply(rhs_s, out_s):
        """out = one V-cycle from zero on b = rhs."""
        copy_rows(rhs_s, b0_s)
        _vcycle_refs(plan, diags, dinv, minv, xs, bs, rs, ws, ks=ks)
        copy_rows(xs[0], out_s)

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
            v_c = _spmv_chunk(a_diags, w_s, c0, C, qs=qs_a, pad_lo=pa_lo)
            v_s[pl.ds(c0, C), :] = v_c
            return rv + jnp.sum(rr_s[pl.ds(c0, C), :] * v_c)

        rv = jax.lax.fori_loop(0, n_chunks, v_chunk, jnp.float32(0))
        alpha_new = _sdiv(rho_new, rv)

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
            t_c = _spmv_chunk(a_diags, w_s, c0, C, qs=qs_a, pad_lo=pa_lo)
            t_s[pl.ds(c0, C), :] = t_c
            s_c = s_s[pl.ds(c0, C), :]
            return (ts + jnp.sum(t_c * s_c), tt + jnp.sum(t_c * t_c))

        ts, tt = jax.lax.fori_loop(
            0, n_chunks, t_chunk, (jnp.float32(0), jnp.float32(0))
        )
        omega_new = jnp.where(half_done, 0.0, _sdiv(ts, tt))

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
def mg_bicgstab_vmem_solve(A_dia, plan, diags_list, dinv2_list, minv2,
                           r0_2, x0_2, *, tol_sq_eff, max_iters,
                           use_implicit=False, interpret=False):
    """Run AMG-preconditioned BiCGSTAB to convergence in one Pallas
    kernel (operands as mg_cg_vmem_solve).  Returns
    (x2, iterations, monitored_sq, converged)."""
    a_diags = A_dia.diags
    nd, R, lanes = a_diags.shape
    assert lanes == LANES and plan["lv"][0]["R"] == R
    L = plan["L"]
    qs_a, _, _, pa_lo, pa_hi = _plan(A_dia.offsets, R)
    kernel = functools.partial(
        _bicgstab_mg_kernel, plan=plan, qs_a=qs_a, pad_a=(pa_lo, pa_hi),
        R=R, use_implicit=use_implicit,
    )
    scal = jnp.asarray(tol_sq_eff, jnp.float32).reshape((1,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    args = [scal, iscal, a_diags] + list(diags_list) + list(dinv2_list) + [
        minv2, r0_2, x0_2,
    ]
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + 2 * L + 1)
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
    )
    Rw = R + pa_lo + pa_hi
    scratch = [
        pltpu.VMEM((R, LANES), jnp.float32)  # x r rr p v t s u1
        for _ in range(8)
    ]
    scratch.append(pltpu.VMEM((Rw, LANES), jnp.float32))  # A staging
    scratch.append(pltpu.VMEM((R, LANES), jnp.float32))   # V-cycle b0
    for l in range(L + 1):
        scratch.append(pltpu.VMEM((plan["RVx"][l], LANES), jnp.float32))
    for l in range(1, L + 1):
        scratch.append(pltpu.VMEM((plan["RVb"][l], LANES), jnp.float32))
    for l in range(L):
        scratch.append(pltpu.VMEM((plan["RVr"][l], LANES), jnp.float32))
    for l in range(L):
        e = plan["lv"][l]
        scratch.append(
            pltpu.VMEM((e["R"] + e["pad_lo"] + e["pad_hi"], LANES),
                       jnp.float32)
        )
    for rk in plan.get("RVk", []):
        if rk:
            scratch.append(pltpu.VMEM((rk, LANES), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (nd * 5 + 10) * R * LANES * int(max_iters),
            bytes_accessed=(nd + 8) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

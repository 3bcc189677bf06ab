"""Round-4 follow-up evidence session (real TPU).

Rows the main evidence grid (round2_tpu.py) does not cover:

- pell_defaults_ab: the new library DEFAULTS (int8 lane indices for
  Pell operators; auto-S cost-model pick for streaming plans) A/B'd
  against the old v4 layout on the same matrix, interleaved in-process.
- powerlaw_auto: Csr("auto") on the bench power-law profile (routes to
  the WELL windowed-gather plan) — cross-checks bench.py's row.
- kcycle_tuned: K-cycle cost at kcycle_base 1 vs 2 vs the V-cycle.
  Base-1 K at 10 levels visits ~2^9 coarse levels per cycle (fixed
  per-visit overheads dominate on-chip); base-2 bounds the recursion.
- fcg/ir_fused_ab: the two Dia-family fused solvers round2_tpu's
  krylov loop omits.
- pell_{gmres,cgs,bicgstab}_ab: the Pell-backend fused solvers
  (soak_fused proves parity; these record the on-chip cost ratio).
- nan_stop_parity: a guaranteed-overflow CGS solve under an
  Iteration-only criterion must run the FULL cap on both paths (the
  round-4 NaN stop-semantics fix; before it the fused kernel exited
  on the first NaN monitor and the A/B measured nothing).

Reference protocol: benchmark/utils/general.hpp:94-117 (min-runtime
guards); results are committed artifacts (BENCHMARKING.md:151-153).
Usage: `python benchmark/round4_followup.py` on the TPU; ROUND2_SMALL=1
for the CPU smoke mode.  Emits one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from round2_tpu import (  # noqa: E402 (sibling import)
    chain_seconds,
    emit,
    fence,
    guard,
    pos_slope,
    report_unmatched_rows,
    slope,
)


def main():
    import ginkgo_tpu as gko
    from ginkgo_tpu import stop
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.matrix.pell import Pell
    from ginkgo_tpu.utils import generators

    small = bool(os.environ.get("ROUND2_SMALL"))
    if small:
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == "tpu", "run on the TPU"
    dev = str(jax.devices()[0])

    rng = np.random.default_rng(11)

    # ---- local-scatter unstructured matrix (round2 pell-grid profile) --
    n_u = 1 << (13 if small else 18)
    per_row = 9
    rows_u = np.repeat(np.arange(n_u, dtype=np.int64), per_row)
    cols_u = rows_u + rng.integers(-256, 257, size=rows_u.size)
    np.clip(cols_u, 0, n_u - 1, out=cols_u)
    data_u = MatrixData.from_coo(
        (n_u, n_u),
        np.concatenate([rows_u, np.arange(n_u)]),
        np.concatenate([cols_u, np.arange(n_u)]),
        np.concatenate([
            (rng.random(rows_u.size).astype(np.float32) - 0.5) * 1e-2,
            np.full(n_u, 4.0, np.float32),
        ]),
    ).sum_duplicates()
    xu = jnp.ones((n_u,), jnp.float32)
    nnz_u = data_u.nnz

    def row_pell_defaults():
        from ginkgo_tpu.matrix.csr import Csr
        from ginkgo_tpu.ops.spmv_well import (
            choose_unstructured_plan, plan_spmv,
        )

        old = Pell.from_matrix_data(data_u, q_dtype=np.int32).scale(0.2)
        new = Pell.from_matrix_data(data_u).scale(0.2)  # int8 default
        csr = Csr.from_matrix_data(data_u)
        splan = choose_unstructured_plan(
            np.asarray(csr.row_ptrs), np.asarray(csr.col_idxs),
            np.asarray(csr.values), tuple(csr.shape),
        )  # streaming default: int8 + auto-S
        res = {}
        trips = 10 if small else 40
        res["v4_i32_S8"] = slope(lambda v: old.apply(v), xu, trips)
        res["default_i8_S8"] = slope(lambda v: new.apply(v), xu, trips)
        res["stream_autoS"] = slope(
            lambda v: plan_spmv(splan, v, interpret=small), xu, trips
        )
        emit({"row": "pell_defaults_ab", "n": n_u, "nnz": nnz_u,
              "auto_S": int(getattr(splan, "S", 8)),
              "plan_kind": type(splan).__name__,
              **{k: {"seconds": t,
                     "gnnz_per_s": round(nnz_u / t / 1e9, 2)}
                 for k, t in res.items()},
              "device": dev})

    guard("pell_defaults_ab", row_pell_defaults)

    # ---- power-law / Csr auto cross-check ------------------------------
    def row_powerlaw():
        n_p = (1 << 12) if small else (1 << 17)
        rng_p = np.random.default_rng(23)
        deg = np.minimum(rng_p.zipf(2.1, size=n_p) + 2, 64)
        rows_p = np.repeat(np.arange(n_p, dtype=np.int64), deg)
        u = rng_p.random(rows_p.size)
        cols_p = np.minimum(
            (u ** 2.5 * n_p).astype(np.int64), n_p - 1
        )
        data_p = MatrixData.from_coo(
            (n_p, n_p),
            np.concatenate([rows_p, np.arange(n_p)]),
            np.concatenate([cols_p, np.arange(n_p)]),
            np.concatenate([
                rng_p.random(rows_p.size).astype(np.float32) * 1e-2,
                np.full(n_p, 2.0, np.float32),
            ]),
        ).sum_duplicates()
        A = gko.Csr.from_matrix_data(data_p)
        strat = A._resolve_strategy()
        xp = jnp.ones((n_p,), jnp.float32)
        t = slope(lambda v: A.apply(v), xp, 8 if small else 30)
        emit({"row": "powerlaw_auto", "n": n_p, "nnz": int(data_p.nnz),
              "strategy": strat, "seconds": t,
              "gnnz_per_s": round(data_p.nnz / t / 1e9, 3)})

    guard("powerlaw_auto", row_powerlaw)

    # ---- K-cycle: base 1 vs 2 vs V-cycle -------------------------------
    data_g = generators.poisson_2d(32 if small else 512, dtype=np.float32)
    Dg = Dia.from_matrix_data(data_g).scale(0.125)
    bg = jnp.ones((data_g.shape[0], 1), jnp.float32)

    def mg_total(iters, **build_kw):
        s = gko.Multigrid.build(
            criteria=[stop.Iteration(max_iters=iters)],
            max_levels=10, **build_kw,
        ).generate(Dg)

        @jax.jit
        def run(rhs):
            x, _ = s.solve(rhs)
            return x

        fence(run(bg))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fence(run(bg))
            best = min(best, time.perf_counter() - t0)
        return best

    def mg_iters(**build_kw):
        s = gko.Multigrid.build(
            criteria=[stop.Iteration(max_iters=200),
                      stop.ResidualNorm(tolerance=1e-5)],
            max_levels=10, **build_kw,
        ).generate(Dg)
        _, info = s.solve(bg)
        return int(info.iterations)

    def row_kcycle_tuned():
        lo, hi = (4, 16) if small else (10, 40)
        span = hi - lo
        out = {}
        for name, kw in (
            ("v", {"cycle": "v"}),
            ("k_base1", {"cycle": "k", "kcycle_base": 1}),
            ("k_base2", {"cycle": "k", "kcycle_base": 2}),
        ):
            out[name] = {
                "us_per_cycle": round(pos_slope(
                    lambda kw=kw: mg_total(lo, **kw),
                    lambda kw=kw: mg_total(hi, **kw),
                    span) * 1e6, 1),
                "iters_to_tol": mg_iters(**kw),
            }
        emit({"row": "kcycle_tuned", "n": data_g.shape[0], **out})

    guard("kcycle_tuned", row_kcycle_tuned)

    # ---- FCG / IR fused A/B on Dia (262k) ------------------------------
    # nonsymmetric convection-diffusion tridiagonal (round2_tpu's Ds):
    # the cgs/bicg/idr rows re-measure on the identical matrix so the
    # post-fix numbers supersede round2_tpu_r4's directly
    n_s = 1 << (12 if small else 18)
    rows_s = np.concatenate(
        [np.arange(n_s), np.arange(1, n_s), np.arange(n_s - 1)]
    )
    cols_s = np.concatenate(
        [np.arange(n_s), np.arange(n_s - 1), np.arange(1, n_s)]
    )
    vals_s = np.concatenate([
        np.full(n_s, 3.1), np.full(n_s - 1, -1.4), np.full(n_s - 1, -0.6),
    ]).astype(np.float32)
    Ds = Dia.from_matrix_data(
        MatrixData.from_coo((n_s, n_s), rows_s, cols_s, vals_s)
    )
    bs = jnp.ones((n_s, 1), jnp.float32)

    def krylov_total(cls, iters, fused, op, rhs, **build_kw):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = cls.build(
                criteria=[stop.Iteration(max_iters=iters)], **build_kw
            ).generate(op)

            @jax.jit
            def run(r):
                x, _ = s.solve(r)
                return x

            fence(run(rhs))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(rhs))
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    # cgs/bicg/idr re-measured here POST NaN-stop fix (on round2_tpu's
    # exact Ds matrix): before it, a diverging f32 CGS under an
    # Iteration-only criterion exited the fused kernel at the first NaN
    # monitor while the streaming loop ran the full cap —
    # round2_tpu_r4's cgs row (1.3 us/iter, "19.65x") is that artifact,
    # not a measurement.
    for name, cls, op, rhs, kw in (
        ("fcg", gko.Fcg, Dg, bg, {}),
        ("ir", gko.Ir, Dg, bg, {}),
        ("cgs", gko.Cgs, Ds, bs, {}),
        ("bicg", gko.Bicg, Ds, bs, {}),
        ("idr_s4", gko.Idr, Ds, bs, {"subspace_dim": 4}),
    ):
        def row_krylov(cls=cls, kw=kw, name=name, op=op, rhs=rhs):
            res = {}
            lo, hi = (20, 80) if small else (100, 400)
            for fused in (True, False):
                res["fused" if fused else "stream"] = pos_slope(
                    lambda: krylov_total(cls, lo, fused, op, rhs, **kw),
                    lambda: krylov_total(cls, hi, fused, op, rhs, **kw),
                    hi - lo,
                )
            emit({"row": f"{name}_fused_ab", "n": op.shape[0],
                  "fused_us_per_iter": round(res["fused"] * 1e6, 1),
                  "stream_us_per_iter": round(res["stream"] * 1e6, 1),
                  "speedup": round(res["stream"] / res["fused"], 2)})

        guard(f"{name}_fused_ab", row_krylov)

    # ---- Pell-backend fused solvers (131k local-scatter SPD-ish) -------
    n_c = 1 << (12 if small else 17)
    rows_c = np.repeat(np.arange(n_c, dtype=np.int64), per_row)
    cols_c = np.clip(
        rows_c + rng.integers(-256, 257, size=rows_c.size), 0, n_c - 1
    )
    data_c = MatrixData.from_coo(
        (n_c, n_c),
        np.concatenate([rows_c, np.arange(n_c)]),
        np.concatenate([cols_c, np.arange(n_c)]),
        np.concatenate([
            (rng.random(rows_c.size).astype(np.float32) - 0.5) * 1e-2,
            np.full(n_c, 4.0, np.float32),
        ]),
    ).sum_duplicates()
    Au = Pell.from_matrix_data(data_c).scale(0.2)
    bu = jnp.ones((n_c, 1), jnp.float32)

    def pell_solver_total(cls, iters, fused, **build_kw):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = cls.build(
                criteria=[stop.Iteration(max_iters=iters)], **build_kw
            ).generate(Au)

            @jax.jit
            def run(rhs):
                x, _ = s.solve(rhs)
                return x

            fence(run(bu))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(bu))
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    for name, cls, kw in (
        ("pell_gmres", gko.Gmres, {"krylov_dim": 30}),
        ("pell_cgs", gko.Cgs, {}),
        ("pell_bicgstab", gko.Bicgstab, {}),
    ):
        def row_pell_k(cls=cls, kw=kw, name=name):
            res = {}
            lo, hi = (15, 60) if small else (60, 240)
            for fused in (True, False):
                res["fused" if fused else "stream"] = pos_slope(
                    lambda: pell_solver_total(cls, lo, fused, **kw),
                    lambda: pell_solver_total(cls, hi, fused, **kw),
                    hi - lo,
                )
            emit({"row": f"{name}_fused_ab", "n": n_c,
                  "fused_us_per_iter": round(res["fused"] * 1e6, 1),
                  "stream_us_per_iter": round(res["stream"] * 1e6, 1),
                  "speedup": round(res["stream"] / res["fused"], 2)})

        guard(f"{name}_fused_ab", row_pell_k)

    # ---- WELL f32 vs bf16 storage on the power-law profile -------------
    def row_well_bf16():
        from ginkgo_tpu.matrix.well import Well

        n_p = (1 << 12) if small else (1 << 17)
        rng_p = np.random.default_rng(23)
        deg = np.minimum(rng_p.zipf(2.1, size=n_p) + 2, 64)
        rows_p = np.repeat(np.arange(n_p, dtype=np.int64), deg)
        u = rng_p.random(rows_p.size)
        cols_p = np.minimum((u ** 2.5 * n_p).astype(np.int64), n_p - 1)
        data_p = MatrixData.from_coo(
            (n_p, n_p),
            np.concatenate([rows_p, np.arange(n_p)]),
            np.concatenate([cols_p, np.arange(n_p)]),
            np.concatenate([
                rng_p.random(rows_p.size).astype(np.float32) * 1e-2,
                np.full(n_p, 2.0, np.float32),
            ]),
        ).sum_duplicates()
        W = Well.from_matrix_data(data_p)
        B = W.reduce_storage()
        xp = jnp.ones((n_p,), jnp.float32)
        trips = 8 if small else 30
        t_f32 = slope(lambda v: W.apply(v), xp, trips)
        t_bf16 = slope(lambda v: B.apply(v), xp, trips)
        emit({"row": "well_bf16_ab", "n": n_p, "nnz": int(data_p.nnz),
              "inflation": round(W.inflation, 1),
              "f32_gnnz_per_s": round(data_p.nnz / t_f32 / 1e9, 3),
              "bf16_gnnz_per_s": round(data_p.nnz / t_bf16 / 1e9, 3),
              "speedup": round(t_f32 / t_bf16, 2)})

    guard("well_bf16_ab", row_well_bf16)

    # ---- NaN stop-semantics parity (the round-4 fix, on chip) ----------
    def row_nan_parity():
        Dn = Dia.from_matrix_data(
            generators.poisson_2d(16 if small else 64, dtype=np.float32)
        ).scale(1e30)
        bn = jnp.full((Dn.shape[0], 1), 1e8, jnp.float32)
        iters = {}
        for fused in (True, False):
            if not fused:
                os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
            try:
                s = gko.Cgs.build(
                    criteria=[stop.Iteration(max_iters=50)]
                ).generate(Dn)
                _, info = s.solve(bn)
                iters["fused" if fused else "stream"] = int(info.iterations)
            finally:
                os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)
        emit({"row": "nan_stop_parity", **iters,
              "pass": iters.get("fused") == iters.get("stream") == 50})

    guard("nan_stop_parity", row_nan_parity)

    report_unmatched_rows()


if __name__ == "__main__":
    main()

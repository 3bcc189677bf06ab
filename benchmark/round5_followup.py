"""Round-5 follow-up evidence session (real TPU unless ROUND2_SMALL=1).

Rows, each answering a named r4-verdict item:

- powerlaw_supertile_ab (missing #1): WELL T=1 vs supertile T=16 on the
  bench power-law pattern, interleaved in one process — the layout
  change's on-chip win plus the Csr("auto") routing record.
- pell_cgs_ab / pell_bicgstab_ab (weak #4): the sub-drift fused margins
  re-measured; run this script in TWO sessions and quote the RANGE in
  PERF.md (CLAUDE.md drift protocol).
- kcycle_converging (weak #5): V vs K(base 1|2) on a configuration where
  standalone MG actually reaches tol (256^2, 3 damped-Jacobi sweeps,
  relax 0.8) so iters_to_tol is a real number on every side.
- well_plan_envelope (weak #2/#6): host plan-build time for the auto-T
  WELL stats passes at 5M and 20M nnz power-law patterns, 2 in-process
  trials (the 1-vCPU host's first-trial readings run 10-40x slow).

Reference protocol: benchmark/utils/general.hpp:94-117; committed
artifacts under benchmark/results/ (BENCHMARKING.md discipline).
Usage: `python benchmark/round5_followup.py`; ROUND2_ROWS=a,b filters.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from round2_tpu import (  # noqa: E402 (sibling import)
    emit,
    fence,
    guard,
    pos_slope,
    report_unmatched_rows,
)


def powerlaw_data(n_p, seed=23):
    from ginkgo_tpu.base.matrix_data import MatrixData

    rng_p = np.random.default_rng(seed)
    deg = np.minimum(rng_p.zipf(2.1, size=n_p) + 2, 64)
    rows_p = np.repeat(np.arange(n_p, dtype=np.int64), deg)
    u = rng_p.random(rows_p.size)
    cols_p = np.minimum((u ** 3.0 * n_p).astype(np.int64), n_p - 1)
    vals_p = rng_p.standard_normal(rows_p.size).astype(np.float32) * 1e-2
    return MatrixData.from_coo(
        (n_p, n_p),
        np.concatenate([rows_p, np.arange(n_p)]),
        np.concatenate([cols_p, np.arange(n_p)]),
        np.concatenate([vals_p, np.full(n_p, 4.0, np.float32)]),
    ).sum_duplicates()


def main():
    import ginkgo_tpu as gko
    from ginkgo_tpu import stop
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.matrix.pell import Pell
    from ginkgo_tpu.matrix.csr import Csr
    from ginkgo_tpu.utils import generators
    from ginkgo_tpu.ops.spmv_well import WellPlan, well_spmv

    small = bool(os.environ.get("ROUND2_SMALL"))
    if small:
        jax.config.update("jax_platforms", "cpu")
    emit({"row": "_session", "backend": jax.default_backend(),
          "device": str(jax.devices()[0]), "round": 5})

    # ---- supertile A/B on the power-law pattern ------------------------
    def row_powerlaw_supertile():
        n_p = (1 << 12) if small else (1 << 17)
        data_p = powerlaw_data(n_p)
        A = Csr.from_matrix_data(data_p, index_dtype=np.int32)
        ip, ci, vv = (np.asarray(A.row_ptrs), np.asarray(A.col_idxs),
                      np.asarray(A.values))
        interp = small
        kw = dict(G=8) if small else {}
        p1 = WellPlan(ip, ci, vv, tuple(A.shape), T=1, **kw)
        p16 = WellPlan(ip, ci, vv, tuple(A.shape), T=16, **kw)
        x = jnp.ones((n_p,), jnp.float32)

        def total(plan, trips):
            @jax.jit
            def run(v):
                return jax.lax.fori_loop(
                    0, trips, lambda i, vv_: well_spmv(
                        plan, vv_, interpret=interp) * 0.2, v)

            fence(run(x))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(x))
                best = min(best, time.perf_counter() - t0)
            return best

        lo, hi = (2, 6) if small else (40, 160)
        span = hi - lo
        t1 = pos_slope(lambda: total(p1, lo), lambda: total(p1, hi), span)
        t16 = pos_slope(lambda: total(p16, lo), lambda: total(p16, hi), span)
        auto = WellPlan(ip, ci, vv, tuple(A.shape), materialize=False)
        emit({
            "row": "powerlaw_supertile_ab", "n": n_p, "nnz": int(data_p.nnz),
            "t1_inflation": round(p1.inflation, 1),
            "t16_inflation": round(p16.inflation, 1),
            "t1_us_per_apply": round(t1 * 1e6, 1),
            "t16_us_per_apply": round(t16 * 1e6, 1),
            "t1_gnnz_per_s": round(data_p.nnz / t1 / 1e9, 2),
            "t16_gnnz_per_s": round(data_p.nnz / t16 / 1e9, 2),
            "speedup": round(t1 / t16, 2),
            "auto_T": auto.T,
            "csr_auto_strategy": A._resolve_strategy(),
        })

    guard("powerlaw_supertile_ab", row_powerlaw_supertile)

    # ---- Pell-backend fused margins (run in TWO sessions -> range) -----
    n_c = (1 << 12) if small else (1 << 17)
    rng_c = np.random.default_rng(12)
    rows_c = np.repeat(np.arange(n_c, dtype=np.int64), 9)
    cols_c = np.clip(
        rows_c + rng_c.integers(-256, 257, size=rows_c.size), 0, n_c - 1
    )
    data_c = MatrixData.from_coo(
        (n_c, n_c),
        np.concatenate([rows_c, np.arange(n_c)]),
        np.concatenate([cols_c, np.arange(n_c)]),
        np.concatenate([
            (rng_c.random(rows_c.size).astype(np.float32) - 0.5) * 1e-2,
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

    for name, cls in (("pell_cgs", None), ("pell_bicgstab", None)):
        def row_pell_k(name=name):
            cls = gko.Cgs if name == "pell_cgs" else gko.Bicgstab
            res = {}
            lo, hi = (15, 60) if small else (60, 240)
            # interleaved: alternate fused/stream endpoint measurements
            res["fused"] = pos_slope(
                lambda: pell_solver_total(cls, lo, True),
                lambda: pell_solver_total(cls, hi, True), hi - lo)
            res["stream"] = pos_slope(
                lambda: pell_solver_total(cls, lo, False),
                lambda: pell_solver_total(cls, hi, False), hi - lo)
            emit({"row": f"{name}_ab_r5", "n": n_c,
                  "fused_us_per_iter": round(res["fused"] * 1e6, 2),
                  "stream_us_per_iter": round(res["stream"] * 1e6, 2),
                  "ratio": round(res["stream"] / res["fused"], 3)})

        guard(f"{name}_ab_r5", row_pell_k)

    # ---- K-cycle on a CONVERGING configuration -------------------------
    def row_kcycle_converging():
        s_side = 32 if small else 256
        data_g = generators.poisson_2d(s_side, dtype=np.float32)
        Dg = Dia.from_matrix_data(data_g).scale(0.125)
        bg = jnp.ones((data_g.shape[0], 1), jnp.float32)
        mk_kw = dict(max_levels=10, smoother_iters=3, smoother_relax=0.8)

        def mg_iters(**build_kw):
            sol = gko.Multigrid.build(
                criteria=[stop.Iteration(max_iters=200),
                          stop.ResidualNorm(tolerance=1e-3)],
                **mk_kw, **build_kw,
            ).generate(Dg)
            _, info = sol.solve(bg)
            return int(info.iterations), bool(np.all(np.asarray(
                info.converged)))

        def mg_total(iters, **build_kw):
            sol = gko.Multigrid.build(
                criteria=[stop.Iteration(max_iters=iters)], **mk_kw,
                **build_kw,
            ).generate(Dg)

            @jax.jit
            def run(rhs):
                x, _ = sol.solve(rhs)
                return x

            fence(run(bg))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(bg))
                best = min(best, time.perf_counter() - t0)
            return best

        out = {}
        lo, hi = (2, 8) if small else (10, 40)
        for name, kw in (
            ("v", {"cycle": "v"}),
            ("k_base1", {"cycle": "k", "kcycle_base": 1}),
            ("k_base2", {"cycle": "k", "kcycle_base": 2}),
        ):
            iters, conv = mg_iters(**kw)
            out[name] = {
                "iters_to_tol": iters,
                "converged": conv,
                "us_per_cycle": round(pos_slope(
                    lambda kw=kw: mg_total(lo, **kw),
                    lambda kw=kw: mg_total(hi, **kw),
                    hi - lo) * 1e6, 1),
            }
        emit({"row": "kcycle_converging", "n": data_g.shape[0],
              "smoother_iters": 3, "smoother_relax": 0.8,
              "tolerance": 1e-3, **out})

    guard("kcycle_converging", row_kcycle_converging)

    # ---- WELL plan-build envelope (host-side) --------------------------
    def row_plan_envelope():
        sizes = [1 << 14] if small else [1 << 20, 1 << 22]
        for n_p in sizes:
            data_p = powerlaw_data(n_p, seed=41)
            A = Csr.from_matrix_data(data_p, index_dtype=np.int32)
            ip, ci, vv = (np.asarray(A.row_ptrs), np.asarray(A.col_idxs),
                          np.asarray(A.values))
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                stats = WellPlan(ip, ci, vv, tuple(A.shape),
                                 materialize=False)
                times.append(time.perf_counter() - t0)
            emit({"row": "well_plan_envelope", "n": n_p,
                  "nnz": int(data_p.nnz),
                  "auto_T": stats.T, "inflation": round(stats.inflation, 1),
                  "stats_seconds_trials": [round(t, 2) for t in times],
                  "note": "auto-T stats passes (3 candidate layerings); "
                          "steady state = later trial (bursty host)"})

    guard("well_plan_envelope", row_plan_envelope)

    report_unmatched_rows()


if __name__ == "__main__":
    main()

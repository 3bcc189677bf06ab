"""Round-2 TPU measurement session: every new kernel, interleaved A/B.

One long-lived process (amortizes the 90-230 s first-op tunnel stall);
all comparisons interleaved in-process (chip clock drifts between
sessions); slope timing between two trip counts (cancels the ~25 ms
dispatch/fence overhead).  Prints one JSON line per row.

Rows:
  pell_v4_vs_v5      PELL SpMV S/q_dtype grid on an unstructured matrix
  formats_streaming  per-format streaming vs gather (Ell example)
  gmres_fused_ab     fused vs streaming GMRES(30), Dia 262k
  ilu_cg_ab          fused ILU-CG vs streaming ILU-CG, Dia 262k
  trs_fused_ab       fused vs streaming sweep trisolve
  pell_fused_cg      fused PELL CG at 131k (bench.py cross-check)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(x))


def emit(row):
    print(json.dumps(row), flush=True)


_SEEN_ROWS = set()


def _is_transient(e):
    """Tunnel/remote-compile failure class (same predicate as
    bench.py:_is_transient — VERDICT r4 weak #1): a dropped tunnel
    response deserves one rebuild-and-remeasure retry, because the row
    fn rebuilds its operands from scratch on re-entry."""
    name = type(e).__name__
    return (
        "JaxRuntimeError" in name
        or "XlaRuntimeError" in name
        or isinstance(e, (ConnectionError, OSError, RuntimeError))
    )


def guard(name, fn):
    """Per-row isolation (VERDICT r2 weak #1: one failed row must never
    destroy the rest of the session's evidence).  ROUND2_ROWS=a,b,c
    restricts the session to the named rows (cheap re-measurement);
    tokens are stripped and unknown names are reported at exit
    (ADVICE r3: 'a, b' silently skipped row b).  Transient tunnel
    failures get ONE retry, mirroring bench.py's row protocol."""
    _SEEN_ROWS.add(name)
    only = os.environ.get("ROUND2_ROWS")
    if only and name not in [s.strip() for s in only.split(",")]:
        return
    for attempt in (0, 1):
        try:
            fn()
            return
        except Exception as e:  # noqa: BLE001
            import traceback

            traceback.print_exc()
            if attempt == 0 and _is_transient(e):
                emit({"row": name, "transient_retry": True,
                      "error": f"{type(e).__name__}: {e}"[:300]})
                try:
                    jax.clear_caches()
                except Exception:  # noqa: BLE001
                    pass
                continue
            emit({"row": name, "error": f"{type(e).__name__}: {e}"[:300]})
            return


def report_unmatched_rows():
    only = os.environ.get("ROUND2_ROWS")
    if not only:
        return
    unknown = [
        s.strip() for s in only.split(",")
        if s.strip() and s.strip() not in _SEEN_ROWS
    ]
    if unknown:
        emit({"row": "_filter_warning",
              "unmatched_names": unknown,
              "known_rows": sorted(_SEEN_ROWS)})


def chain_seconds(apply_fn, x0, trips, trials=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, trips, lambda i, v: apply_fn(v), x)

    fence(run(x0))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fence(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def pos_slope(lo_fn, hi_fn, span, retries=2):
    """Positive slope between two totals with drift retries.

    Each retry measures a FRESH lo/hi pair and only the lo endpoint is
    min-ed across attempts — an anomalously fast hi reading can then be
    corrected upward on the next attempt (ADVICE r3: min-ing both
    endpoints could never recover).  A persistently non-positive slope
    raises instead of clamping to 1e-9, so the row records an error
    rather than a 0.0 µs figure and an absurd ratio."""
    lo = lo_fn()
    hi = hi_fn()
    for _ in range(retries):
        if hi > lo:
            break
        lo = min(lo, lo_fn())
        hi = hi_fn()
    if hi <= lo:
        raise RuntimeError(
            f"non-positive slope after {retries} retries "
            f"(lo={lo:.6f}s hi={hi:.6f}s)"
        )
    return (hi - lo) / span


def slope(apply_fn, x0, trips):
    return pos_slope(
        lambda: chain_seconds(apply_fn, x0, trips),
        lambda: chain_seconds(apply_fn, x0, 2 * trips),
        trips,
    )


def main():
    import ginkgo_tpu as gko
    from ginkgo_tpu import stop
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.matrix.ell import Ell
    from ginkgo_tpu.matrix.pell import Pell
    from ginkgo_tpu.utils import generators

    small = bool(os.environ.get("ROUND2_SMALL"))  # CPU smoke mode
    if small:
        # JAX_PLATFORMS=cpu alone does not switch off the axon TPU plugin
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == "tpu", "run on the TPU"
    dev = str(jax.devices()[0])

    # ---- unstructured matrix with column locality (bench.py profile) --
    rng = np.random.default_rng(11)
    # 2^18: the v4 int32 variant's padded plan at 2^19 rode the jitted
    # closure past the ~300 MB tunnel cap (HTTP 413)
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

    # PELL v4 vs v5 grid, interleaved
    variants = [
        ("v4_S8_i32", dict(S=8, q_dtype=np.int32)),
        ("v5_S8_i8", dict(S=8, q_dtype=np.int8)),
        ("v5_S16_i8", dict(S=16, q_dtype=np.int8)),
        ("v5_S32_i8", dict(S=32, q_dtype=np.int8)),
    ]
    ops = {}
    for name, kw in variants:
        try:
            ops[name] = Pell.from_matrix_data(data_u, **kw).scale(0.2)
        except Exception as e:  # noqa: BLE001
            emit({"row": "pell_variant_build", "variant": name,
                  "error": str(e)[:200]})
    # bf16 reduce_storage on the best-guess layout
    if "v4_S8_i32" in ops:
        ops["v5_S8_bf16_i8"] = ops["v4_S8_i32"].reduce_storage()
    def row_pell_grid():
        results = {}
        for name, A in ops.items():
            t = slope(lambda v, A=A: A.apply(v), xu, trips=40)
            results[name] = {
                "seconds": t,
                "gnnz_per_s": round(nnz_u / t / 1e9, 2),
                "inflation": round(float(A.inflation), 2),
            }
        emit({"row": "pell_v4_vs_v5", "n": n_u, "nnz": nnz_u,
              "variants": results, "device": dev})

    guard("pell_v4_vs_v5", row_pell_grid)

    # ---- per-format streaming vs gather (Ell) --------------------------
    n_e = 1 << (12 if small else 17)
    rows_e = np.repeat(np.arange(n_e, dtype=np.int64), per_row)
    cols_e = np.clip(
        rows_e + rng.integers(-256, 257, size=rows_e.size), 0, n_e - 1
    )
    data_e = MatrixData.from_coo(
        (n_e, n_e), rows_e, cols_e,
        rng.random(rows_e.size).astype(np.float32) * 1e-2,
    ).sum_duplicates()
    def row_formats():
        E = Ell.from_matrix_data(data_e)
        xe = jnp.ones((n_e,), jnp.float32)
        t_stream = slope(lambda v: E.apply(v) * 0.2, xe, trips=40)
        os.environ["GINKGO_TPU_NO_PALLAS"] = "1"
        try:
            t_gather = chain_seconds(
                lambda v: E.apply(v) * 0.2, xe, trips=2
            ) / 2
        finally:
            del os.environ["GINKGO_TPU_NO_PALLAS"]
        emit({"row": "formats_streaming", "format": "Ell", "n": n_e,
              "nnz": data_e.nnz, "stream_seconds": t_stream,
              "stream_gnnz_per_s": round(data_e.nnz / t_stream / 1e9, 2),
              "gather_seconds": t_gather,
              "speedup": round(t_gather / t_stream, 1)})

    guard("formats_streaming", row_formats)

    # ---- fused vs streaming GMRES(30), Dia 262k ------------------------
    data_g = generators.poisson_2d(32 if small else 512, dtype=np.float32)
    Dg = Dia.from_matrix_data(data_g).scale(0.125)
    bg = jnp.ones((data_g.shape[0], 1), jnp.float32)

    # env flag is read at TRACE time; solver_base._env_trace_key keeps
    # the two paths distinct in the jit cache
    def gmres_total(iters, fused):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = gko.Gmres.build(
                criteria=[stop.Iteration(max_iters=iters)], krylov_dim=30
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
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    def row_gmres():
        g = {}
        for fused in (True, False):
            g["fused" if fused else "stream"] = pos_slope(
                lambda: gmres_total(10 if small else 60, fused),
                lambda: gmres_total(40 if small else 240, fused),
                30 if small else 180,
            )
        emit({"row": "gmres_fused_ab", "n": data_g.shape[0],
              "fused_us_per_iter": round(g["fused"] * 1e6, 1),
              "stream_us_per_iter": round(g["stream"] * 1e6, 1),
              "speedup": round(g["stream"] / g["fused"], 2)})

    guard("gmres_fused_ab", row_gmres)

    # ---- fused ILU-CG vs streaming ILU-CG, Dia 262k --------------------
    from ginkgo_tpu.factorization.ilu import IluFactory
    from ginkgo_tpu.preconditioner.ilu import IluPreconditionerFactory
    from ginkgo_tpu.solver.triangular import (
        LowerTrsFactory, UpperTrsFactory,
    )

    try:
        A_csr = gko.Csr.from_matrix_data(data_g)
        fact = IluFactory().generate(A_csr)
        M = IluPreconditionerFactory(
            l_solver_factory=LowerTrsFactory(algorithm="sweeps", sweeps=3),
            u_solver_factory=UpperTrsFactory(algorithm="sweeps", sweeps=3),
        ).generate(fact)
    except Exception as e:  # noqa: BLE001
        emit({"row": "ilu_setup", "error": str(e)[:200]})
        fact = M = None


    def ilu_total(iters, fused):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = gko.Cg.build(
                criteria=[stop.Iteration(max_iters=iters)],
                preconditioner=M,
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
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    def row_ilu():
        ic = {}
        for fused in (True, False):
            ic["fused" if fused else "stream"] = pos_slope(
                lambda: ilu_total(20 if small else 100, fused),
                lambda: ilu_total(80 if small else 400, fused),
                60 if small else 300,
            )
        emit({"row": "ilu_cg_ab", "n": data_g.shape[0],
              "fused_us_per_iter": round(ic["fused"] * 1e6, 1),
              "stream_us_per_iter": round(ic["stream"] * 1e6, 1),
              "speedup": round(ic["stream"] / ic["fused"], 2)})

    guard("ilu_cg_ab", row_ilu)

    # ---- fused MG-CG (whole AMG-preconditioned solve in one kernel) ----
    # vs the generic composition (separate V-cycle kernels per apply)
    from ginkgo_tpu.solver.multigrid import Multigrid

    mgp = Multigrid.build(
        criteria=[stop.Iteration(max_iters=1)],
        max_levels=10,
    ).generate(Dg)

    def mgcg_total(iters, fused):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = gko.Cg.build(
                criteria=[stop.Iteration(max_iters=iters)],
                preconditioner=mgp,
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
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    def row_mgcg():
        mc = {}
        for fused in (True, False):
            mc["fused" if fused else "stream"] = pos_slope(
                lambda: mgcg_total(5 if small else 20, fused),
                lambda: mgcg_total(20 if small else 80, fused),
                15 if small else 60,
            )
        emit({"row": "mg_cg_fused_ab", "n": data_g.shape[0],
              "fused_us_per_iter": round(mc["fused"] * 1e6, 1),
              "stream_us_per_iter": round(mc["stream"] * 1e6, 1),
              "speedup": round(mc["stream"] / mc["fused"], 2)})

    guard("mg_cg_fused_ab", row_mgcg)

    # ---- fused K-cycle vs fused V-cycle (standalone MG solve) ---------
    # per-cycle cost (iteration-capped slope) AND iterations-to-tol: the
    # K-cycle's second inner solves cost ~2x/cycle but cut iteration
    # counts ~2.5x on deep hierarchies
    # max_levels must reach a tiny coarse grid: 5 levels at 262k left a
    # 16k-row coarse problem (10 ms dense coarse solves, no convergence
    # in 200 cycles) — 10 levels coarsens to ~256 rows
    def mg_total(cyc, iters):
        s = gko.Multigrid.build(
            criteria=[stop.Iteration(max_iters=iters)],
            max_levels=10, cycle=cyc,
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

    def mg_iters(cyc):
        s = gko.Multigrid.build(
            criteria=[stop.Iteration(max_iters=200),
                      stop.ResidualNorm(tolerance=1e-5)],
            max_levels=10, cycle=cyc,
        ).generate(Dg)
        _, info = s.solve(bg)
        return int(info.iterations)

    def row_kcycle():
        kc = {}
        for cyc in ("v", "k"):
            kc[cyc] = {"us_per_cycle": pos_slope(
                lambda: mg_total(cyc, 4 if small else 10),
                lambda: mg_total(cyc, 16 if small else 40),
                12 if small else 30) * 1e6,
                "iters_to_tol": mg_iters(cyc)}
        tot_v = kc["v"]["us_per_cycle"] * kc["v"]["iters_to_tol"]
        tot_k = kc["k"]["us_per_cycle"] * kc["k"]["iters_to_tol"]
        emit({"row": "mg_kcycle_ab", "n": data_g.shape[0],
              "v_us_per_cycle": round(kc["v"]["us_per_cycle"], 1),
              "k_us_per_cycle": round(kc["k"]["us_per_cycle"], 1),
              "v_iters": kc["v"]["iters_to_tol"],
              "k_iters": kc["k"]["iters_to_tol"],
              "total_speedup_k_vs_v": round(tot_v / tot_k, 2)})

    guard("mg_kcycle_ab", row_kcycle)

    # ---- fused vs streaming sweep trisolve (standalone apply) ----------
    # The ILU L factor of the banded Poisson operator lands in Dia, so the
    # sweeps TriangularSolver rides ops/pallas_trs.py when fused paths are
    # on; GINKGO_TPU_NO_FUSED_CG=1 falls back to the fori_loop of Dia SpMVs.
    nsw = 6

    def trs_seconds(fused, trips):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            ltrs = LowerTrsFactory(
                algorithm="sweeps", sweeps=nsw
            ).generate(fact.get_l_factor())
            return chain_seconds(lambda v: ltrs.apply(v) * 0.5,
                                 bg[:, 0], trips)
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    def row_trs():
        # the fused solve is ~µs-scale: 10-trip chains sit inside the
        # ~25 ms dispatch jitter — use 100/200 trips and retry on drift
        trs = {}
        for fused in (True, False):
            trs["fused" if fused else "stream"] = pos_slope(
                lambda: trs_seconds(fused, 100),
                lambda: trs_seconds(fused, 200),
                100,
            )
        emit({"row": "trs_fused_ab", "n": data_g.shape[0], "sweeps": nsw,
              "fused_us_per_solve": round(trs["fused"] * 1e6, 1),
              "stream_us_per_solve": round(trs["stream"] * 1e6, 1),
              "speedup": round(trs["stream"] / trs["fused"], 2)})

    guard("trs_fused_ab", row_trs)

    # ---- fused PELL CG (bench.py cross-check at 131k) ------------------
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

    def pell_total(iters):
        s = gko.Cg.build(
            criteria=[stop.Iteration(max_iters=iters)]
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

    def row_pell_cg():
        t_pc = pos_slope(
            lambda: pell_total(20 if small else 100),
            lambda: pell_total(120 if small else 600),
            100 if small else 500,
        )
        emit({"row": "pell_fused_cg", "n": n_c,
              "us_per_iter": round(t_pc * 1e6, 2)})

    guard("pell_fused_cg", row_pell_cg)

    # ---- k-RHS fused CG: one kernel for 4 columns vs 4 sequential ------
    # single-RHS fused solves vs the generic streaming multi-RHS loop
    k_m = 4
    bm = jnp.asarray(
        rng.standard_normal((data_g.shape[0], k_m)).astype(np.float32)
    )

    def multi_total(iters, mode):
        if mode == "stream":
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = gko.Cg.build(
                criteria=[stop.Iteration(max_iters=iters)]
            ).generate(Dg)

            @jax.jit
            def run(rhs):
                if mode == "seq":
                    outs = [
                        s.solve(rhs[:, j:j + 1])[0] for j in range(k_m)
                    ]
                    return jnp.concatenate(outs, axis=1)
                x, _ = s.solve(rhs)
                return x

            fence(run(bm))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(bm))
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    def row_cg_multi():
        mm = {}
        for mode in ("multi", "seq", "stream"):
            mm[mode] = pos_slope(
                lambda: multi_total(20 if small else 100, mode),
                lambda: multi_total(80 if small else 400, mode),
                60 if small else 300,
            )
        emit({"row": "cg_multi_rhs_ab", "n": data_g.shape[0], "k": k_m,
              "multi_us_per_iter": round(mm["multi"] * 1e6, 1),
              "seq_fused_us_per_iter": round(mm["seq"] * 1e6, 1),
              "stream_us_per_iter": round(mm["stream"] * 1e6, 1),
              "speedup_vs_seq": round(mm["seq"] / mm["multi"], 2),
              "speedup_vs_stream": round(mm["stream"] / mm["multi"], 2)})

    guard("cg_multi_rhs_ab", row_cg_multi)

    # ---- fused CGS / BiCG / IDR vs streaming (nonsymmetric Dia) --------
    # convection-diffusion-like tridiagonal band: exercises the
    # conj-transpose stack of the fused BiCG kernel
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

    def krylov_total(cls, iters, fused, **build_kw):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = cls.build(
                criteria=[stop.Iteration(max_iters=iters)], **build_kw
            ).generate(Ds)

            @jax.jit
            def run(rhs):
                x, _ = s.solve(rhs)
                return x

            fence(run(bs))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(bs))
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    # k-RHS fused GMRES vs the vmapped streaming solver
    k_g = 3
    bg3 = jnp.asarray(
        rng.standard_normal((n_s, k_g)).astype(np.float32)
    )

    def gmres_multi_total(iters, fused):
        if not fused:
            os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
        try:
            s = gko.Gmres.build(
                criteria=[stop.Iteration(max_iters=iters)], krylov_dim=20
            ).generate(Ds)

            @jax.jit
            def run(rhs):
                x, _ = s.solve(rhs)
                return x

            fence(run(bg3))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(bg3))
                best = min(best, time.perf_counter() - t0)
            return best
        finally:
            os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

    def row_gmres_multi():
        gm = {}
        for fused in (True, False):
            gm["fused" if fused else "stream"] = pos_slope(
                lambda: gmres_multi_total(10 if small else 60, fused),
                lambda: gmres_multi_total(40 if small else 240, fused),
                30 if small else 180,
            )
        emit({"row": "gmres_multi_rhs_ab", "n": n_s, "k": k_g,
              "fused_us_per_iter": round(gm["fused"] * 1e6, 1),
              "stream_us_per_iter": round(gm["stream"] * 1e6, 1),
              "speedup": round(gm["stream"] / gm["fused"], 2)})

    guard("gmres_multi_rhs_ab", row_gmres_multi)

    for name, cls, kw in (
        ("cgs", gko.Cgs, {}),
        ("bicg", gko.Bicg, {}),
        ("idr_s4", gko.Idr, {"subspace_dim": 4}),
    ):
        def row_krylov(cls=cls, kw=kw, name=name):
            res = {}
            for fused in (True, False):
                res["fused" if fused else "stream"] = pos_slope(
                    lambda: krylov_total(cls, 20 if small else 100,
                                         fused, **kw),
                    lambda: krylov_total(cls, 80 if small else 400,
                                         fused, **kw),
                    60 if small else 300,
                )
            emit({"row": f"{name}_fused_ab", "n": n_s,
                  "fused_us_per_iter": round(res["fused"] * 1e6, 1),
                  "stream_us_per_iter": round(res["stream"] * 1e6, 1),
                  "speedup": round(res["stream"] / res["fused"], 2)})

        guard(f"{name}_fused_ab", row_krylov)

    report_unmatched_rows()


if __name__ == "__main__":
    main()

"""Headline benchmark: stencil SpMV throughput vs HBM roofline on one chip.

Protocol notes:
- The axon TPU tunnel has ~25 ms fixed dispatch/fence overhead per call, so
  timing chains MANY SpMVs inside one jitted `lax.fori_loop` (data-dependent,
  so XLA cannot elide or fuse across iterations through the Pallas call) and
  amortizes: per-apply = total / trips.  Mirrors the reference's repetition
  protocol (benchmark/utils/general.hpp:94-117) adapted to this reality.
- Matrix: 2048^2 5-point Poisson stencil (4.19M rows, ~21M nnz), the
  poisson-solver / stencil class of the reference examples + benchmarks.
- Kernel: the Pallas DIA SpMV (ops/pallas_dia.py) — the TPU-native
  gather-free banded kernel; XLA-Dia and gather-based CSR strategies are
  reported in `detail` for honesty.

Roofline model: bytes/apply = (nd diag reads + x read + y write) * 4 B.
Prints ONE JSON line.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def hbm_bandwidth_gbs():
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0


def _total_seconds(apply_fn, x0, trips, trials):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, trips, lambda i, v: apply_fn(v), x)

    float(jnp.sum(run(x0)))  # warm + fence
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0)))
        best = min(best, time.perf_counter() - t0)
    return best


def amortized_seconds(apply_fn, x0, trips=300, trials=3):
    """Per-apply seconds as the slope between two trip counts — chained
    applies inside one jit (data-dependent, so XLA cannot elide iterations
    through the Pallas call), scalar readback as the fence.  The slope
    cancels the tunnel's fixed dispatch/fence overhead."""
    t1 = _total_seconds(apply_fn, x0, trips, trials)
    t2 = _total_seconds(apply_fn, x0, 2 * trips, trials)
    return max((t2 - t1) / trips, 1e-9)


def main():
    from ginkgo_tpu.utils import generators
    from ginkgo_tpu.matrix.csr import Csr
    from ginkgo_tpu.matrix.dia import Dia, LANES
    from ginkgo_tpu.ops.pallas_dia import dia_spmv_pallas

    on_tpu = jax.default_backend() == "tpu"
    n_side = 2048 if on_tpu else 256
    trips = 300 if on_tpu else 20
    data = generators.poisson_2d(n_side, dtype=np.float32)
    n, nnz = data.shape[0], data.nnz

    # scale so the iterated operator stays bounded (spectral radius <= 1);
    # keeps the timed loop a pure SpMV chain with no extra memory passes
    D = Dia.from_matrix_data(data).scale(0.125)
    R = D.diags.shape[1]
    x2 = jnp.ones((R, LANES), dtype=jnp.float32)

    if on_tpu:
        t_pallas = amortized_seconds(
            lambda v: dia_spmv_pallas(D.diags, D.offsets, v), x2, trips
        )
    else:
        t_pallas = amortized_seconds(
            lambda v: dia_spmv_pallas(D.diags, D.offsets, v, interpret=True),
            x2,
            trips,
        )
    # XLA permutation-matmul Dia path (the portable fallback), same frame
    import os

    os.environ["GINKGO_TPU_NO_PALLAS"] = "1"
    t_xla = amortized_seconds(
        lambda v: D.apply(v.reshape(-1)).reshape(R, LANES), x2, trips
    )
    del os.environ["GINKGO_TPU_NO_PALLAS"]
    if t_xla < 1e-8:  # slope drowned in tunnel noise
        t_xla = float("nan")

    nd = D.num_diags
    bytes_apply = (nd + 2) * 4 * R * LANES  # nd diag reads + x read + y write
    gbs = bytes_apply / t_pallas / 1e9
    frac = gbs / hbm_bandwidth_gbs()

    # honesty row: CSR classical (gather-based) at smaller size
    data_s = generators.poisson_2d(512, dtype=np.float32)
    A = Csr.from_matrix_data(data_s, index_dtype=np.int32).scale(0.125)
    xs = jnp.ones((data_s.shape[0],), dtype=jnp.float32)
    t_csr = amortized_seconds(lambda v: A.apply(v), xs, trips=5, trials=2)

    # solver row: CG per-iteration cost on the same operator (the
    # cg.cpp:148-156 memory-model metric)
    if on_tpu:
        from ginkgo_tpu import Cg, stop

        b = jnp.ones((n, 1), jnp.float32)

        def cg_total(iters):
            s = Cg.build(criteria=[stop.Iteration(max_iters=iters)]).generate(D)

            @jax.jit
            def run(rhs):
                x, _ = s.solve(rhs)
                return x

            float(jnp.sum(run(b)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(run(b)))
                best = min(best, time.perf_counter() - t0)
            return best

        t_cg_iter = max((cg_total(100) - cg_total(50)) / 50, 1e-9)

        # bf16 reduce_storage diagonals fit the 4.19M-row CG state in VMEM,
        # which routes this row to the whole-solve fused Pallas kernel
        # (ops/pallas_cg.py, default on TPU); the f32 row above does not
        # fit and streams from HBM (PERF.md)
        D16cg = D.reduce_storage()

        def cg_fused_total(iters):
            s = Cg.build(
                criteria=[stop.Iteration(max_iters=iters)]
            ).generate(D16cg)

            @jax.jit
            def run(rhs):
                x, _ = s.solve(rhs)
                return x

            float(jnp.sum(run(b)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(run(b)))
                best = min(best, time.perf_counter() - t0)
            return best

        t_cg_fused = max(
            (cg_fused_total(3200) - cg_fused_total(200)) / 3000, 1e-9
        )
    else:
        t_cg_iter = float("nan")
        t_cg_fused = float("nan")

    # reduced-storage row: bf16 diagonals, f32 accumulate (accessor mode)
    if on_tpu:
        D16 = D.reduce_storage()
        t_bf16 = amortized_seconds(
            lambda v: dia_spmv_pallas(D16.diags, D16.offsets, v), x2, trips
        )
    else:
        t_bf16 = float("nan")

    # general-sparse row: Blocked-ELL on a block-structured matrix
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.matrix.bell import Bell

    rng = np.random.default_rng(7)
    NRB, BR, K, NPC = 1024, 16, 6, 128
    nb, mb = NRB * BR, NPC * 128
    rr_l, cc_l = [], []
    for rb in range(NRB):
        for pnl in rng.choice(NPC, size=K, replace=False):
            rr, cc = np.nonzero(rng.random((BR, 128)) < 0.3)
            rr_l.append(rb * BR + rr)
            cc_l.append(pnl * 128 + cc)
    rows_b, cols_b = np.concatenate(rr_l), np.concatenate(cc_l)
    data_b = MatrixData.from_coo(
        (nb, mb), rows_b, cols_b,
        (rng.random(len(rows_b)).astype(np.float32) - 0.5) * 1e-2,
    ).sort_row_major()
    Ab = Bell.from_matrix_data(data_b, block_rows=BR)
    xb = jnp.ones((mb,), jnp.float32)
    t_bell = amortized_seconds(lambda v: Ab.apply(v) + 1e-6, xb, trips=trips)

    # general-sparse rows: PELL streaming SpMV + fused whole-solve CG on
    # an UNSTRUCTURED (non-banded, non-block) SPD matrix with column
    # locality (~10 nnz/row scattered in a +-256 column window — the
    # post-RCM/FEM profile the reference's load_balance kernels target)
    from ginkgo_tpu.matrix.pell import Pell

    n_u = 1 << 20 if on_tpu else 1 << 13
    rng_u = np.random.default_rng(11)
    per_row = 9
    rows_u = np.repeat(np.arange(n_u, dtype=np.int64), per_row)
    cols_u = rows_u + rng_u.integers(-256, 257, size=rows_u.size)
    np.clip(cols_u, 0, n_u - 1, out=cols_u)
    vals_u = (rng_u.random(rows_u.size).astype(np.float32) - 0.5) * 1e-2
    data_u = MatrixData.from_coo(
        (n_u, n_u),
        np.concatenate([rows_u, np.arange(n_u)]),
        np.concatenate([cols_u, np.arange(n_u)]),
        np.concatenate([vals_u, np.full(n_u, 4.0, np.float32)]),
    ).sum_duplicates()
    Au = Pell.from_matrix_data(data_u).scale(0.2)
    xu = jnp.ones((n_u,), jnp.float32)
    t_pell = amortized_seconds(
        lambda v: Au.apply(v), xu, trips=max(trips // 3, 5)
    )

    # fused whole-solve CG on a VMEM-sized unstructured operator (the
    # 1M-row plan above exceeds the slot budget; 131k rows fits)
    n_ucg = 1 << 17
    t_pell_cg = float("nan")
    if on_tpu:
        from ginkgo_tpu import Cg, stop

        rows_c = np.repeat(np.arange(n_ucg, dtype=np.int64), per_row)
        cols_c = rows_c + rng_u.integers(-256, 257, size=rows_c.size)
        np.clip(cols_c, 0, n_ucg - 1, out=cols_c)
        data_c = MatrixData.from_coo(
            (n_ucg, n_ucg),
            np.concatenate([rows_c, np.arange(n_ucg)]),
            np.concatenate([cols_c, np.arange(n_ucg)]),
            np.concatenate([
                (rng_u.random(rows_c.size).astype(np.float32) - 0.5) * 1e-2,
                np.full(n_ucg, 4.0, np.float32),
            ]),
        ).sum_duplicates()
        Au_cg = Pell.from_matrix_data(data_c).scale(0.2)
        bu = jnp.ones((n_ucg, 1), jnp.float32)

        def pell_cg_total(iters):
            s = Cg.build(criteria=[stop.Iteration(max_iters=iters)]).generate(
                Au_cg
            )

            @jax.jit
            def run(rhs):
                x, _ = s.solve(rhs)
                return x

            float(jnp.sum(run(bu)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(run(bu)))
                best = min(best, time.perf_counter() - t0)
            return best

        probe = Cg.build(criteria=[stop.Iteration(max_iters=2)]).generate(
            Au_cg
        )
        if probe._try_vmem_fused_pell(bu, jnp.zeros_like(bu)) is not None:
            t_pell_cg = max(
                (pell_cg_total(600) - pell_cg_total(100)) / 500, 1e-9
            )

    # fused whole-solve GMRES(30) per-iteration vs the streaming loop on
    # a 262k-row Dia Poisson (basis 31 frames VMEM-resident)
    t_gmres_fused = float("nan")
    t_gmres_stream = float("nan")
    t_mgcg_fused = float("nan")
    t_mgcg_stream = float("nan")
    if on_tpu:
        from ginkgo_tpu import Gmres

        data_g = generators.poisson_2d(512, dtype=np.float32)
        Dg = Dia.from_matrix_data(data_g).scale(0.125)
        bg = jnp.ones((data_g.shape[0], 1), jnp.float32)

        def gmres_total(iters, fused):
            import os as _os

            if not fused:
                _os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
            try:
                s = Gmres.build(
                    criteria=[stop.Iteration(max_iters=iters)],
                    krylov_dim=30,
                ).generate(Dg)

                @jax.jit
                def run(rhs):
                    x, _ = s.solve(rhs)
                    return x

                float(jnp.sum(run(bg)))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(jnp.sum(run(bg)))
                    best = min(best, time.perf_counter() - t0)
                return best
            finally:
                _os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

        # interleaved A/B (chip clock drifts between sessions)
        g_f1 = gmres_total(60, True)
        g_s1 = gmres_total(60, False)
        g_f2 = gmres_total(240, True)
        g_s2 = gmres_total(240, False)
        t_gmres_fused = max((g_f2 - g_f1) / 180, 1e-9)
        t_gmres_stream = max((g_s2 - g_s1) / 180, 1e-9)

        # whole AMG-preconditioned CG solve in ONE kernel (ops/pallas_mg)
        # vs the generic composition, same 262k operator
        from ginkgo_tpu.solver.multigrid import Multigrid

        mgp = Multigrid.build(
            criteria=[stop.Iteration(max_iters=1)], max_levels=10
        ).generate(Dg)

        def mgcg_total(iters, fused):
            import os as _os

            if not fused:
                _os.environ["GINKGO_TPU_NO_FUSED_CG"] = "1"
            try:
                s = Cg.build(
                    criteria=[stop.Iteration(max_iters=iters)],
                    preconditioner=mgp,
                ).generate(Dg)

                @jax.jit
                def run(rhs):
                    x, _ = s.solve(rhs)
                    return x

                float(jnp.sum(run(bg)))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(jnp.sum(run(bg)))
                    best = min(best, time.perf_counter() - t0)
                return best
            finally:
                _os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)

        m_f1 = mgcg_total(20, True)
        m_s1 = mgcg_total(20, False)
        m_f2 = mgcg_total(80, True)
        m_s2 = mgcg_total(80, False)
        t_mgcg_fused = max((m_f2 - m_f1) / 60, 1e-9)
        t_mgcg_stream = max((m_s2 - m_s1) / 60, 1e-9)

    out = {
        "metric": "spmv_roofline_frac",
        "value": round(frac, 4),
        "unit": "fraction",
        "vs_baseline": round(frac / 0.80, 4),
        "detail": {
            "matrix": f"poisson2d_{n_side}",
            "n": n,
            "nnz": nnz,
            "kernel": "pallas_dia",
            "spmv_seconds": t_pallas,
            "effective_gbs": round(gbs, 1),
            "gnnz_per_s": round(nnz / t_pallas / 1e9, 2),
            "xla_dia_seconds": None if t_xla != t_xla else t_xla,
            "xla_dia_gnnz_per_s": None if t_xla != t_xla else round(nnz / t_xla / 1e9, 2),
            "csr_classical_seconds_512": t_csr,
            "csr_classical_gnnz_per_s": round(data_s.nnz / t_csr / 1e9, 4),
            "cg_seconds_per_iteration": (
                None if t_cg_iter != t_cg_iter else t_cg_iter
            ),
            "cg_bf16_vmem_resident_seconds_per_iteration": (
                None if t_cg_fused != t_cg_fused else t_cg_fused
            ),
            "bf16_storage_seconds": None if t_bf16 != t_bf16 else t_bf16,
            "bf16_storage_gnnz_per_s": (
                None if t_bf16 != t_bf16 else round(nnz / t_bf16 / 1e9, 2)
            ),
            "bell_blockstructured_seconds": t_bell,
            "bell_gnnz_per_s": round(data_b.nnz / t_bell / 1e9, 2),
            "bell_inflation": round(Ab.storage_inflation(), 2),
            "pell_unstructured_seconds": t_pell,
            "pell_gnnz_per_s": round(data_u.nnz / t_pell / 1e9, 2),
            "pell_inflation": round(Au.inflation, 2),
            "pell_n": n_u,
            "cg_pell_vmem_seconds_per_iteration": (
                None if t_pell_cg != t_pell_cg else t_pell_cg
            ),
            "cg_pell_vmem_n": n_ucg,
            "gmres30_fused_seconds_per_iteration": (
                None if t_gmres_fused != t_gmres_fused else t_gmres_fused
            ),
            "gmres30_stream_seconds_per_iteration": (
                None if t_gmres_stream != t_gmres_stream
                else t_gmres_stream
            ),
            "mg_cg_fused_seconds_per_iteration": (
                None if t_mgcg_fused != t_mgcg_fused else t_mgcg_fused
            ),
            "mg_cg_stream_seconds_per_iteration": (
                None if t_mgcg_stream != t_mgcg_stream else t_mgcg_stream
            ),
            "hbm_gbs": hbm_bandwidth_gbs(),
            "note": "frac may exceed 1.0: loop-invariant diagonal blocks are "
                    "served from on-chip memory across chained applies, so "
                    "effective bytes/s beats pure HBM streaming",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

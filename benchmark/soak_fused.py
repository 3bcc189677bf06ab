"""On-chip soak of the fused-solver defaults (VERDICT r2 #8).

The fused whole-solve kernels (solver/_fused_gate.py) are DEFAULT-ON on
TPU, so the default path of every Krylov solver is a Pallas kernel; this
soak certifies each one on real hardware against the streaming loop:
identical iteration counts and f32-roundoff agreement (reference bar:
test/solver breadth + cg_kernels.cpp:55-120 seeding discipline).

Grid: every Krylov solver x {Dia, Pell} x {fused on, fused off}, tol
1e-6.  SPD operator for CG/FCG, mildly nonsymmetric diagonally-dominant
for the rest (CGS's squared-polynomial f32 instability needs dominance
to converge at all — PERF.md soak notes).

Run on the TPU: `python benchmark/soak_fused.py`
CPU smoke (interpret kernels): `SOAK_SMALL=1 JAX_PLATFORMS=cpu python
benchmark/soak_fused.py`.  One JSON line per cell; exit rc=1 if any
cell fails parity.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def emit(row):
    print(json.dumps(row), flush=True)


def main():
    import ginkgo_tpu as gko
    from ginkgo_tpu import stop
    from ginkgo_tpu.base.matrix_data import MatrixData
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.matrix.pell import Pell
    from ginkgo_tpu.utils import generators

    small = bool(os.environ.get("SOAK_SMALL"))
    if small:
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == "tpu", "run on the TPU"

    rng = np.random.default_rng(17)
    n_side = 16 if small else 48
    spd = generators.poisson_2d(n_side, dtype=np.float32)
    n = spd.shape[0]

    # mildly nonsymmetric, strongly diagonally dominant band
    rows_ns = np.concatenate(
        [np.arange(n), np.arange(1, n), np.arange(n - 1)]
    )
    cols_ns = np.concatenate(
        [np.arange(n), np.arange(n - 1), np.arange(1, n)]
    )
    vals_ns = np.concatenate([
        np.full(n, 3.1), np.full(n - 1, -1.4), np.full(n - 1, -0.6),
    ]).astype(np.float32)
    nonsym = MatrixData.from_coo((n, n), rows_ns, cols_ns, vals_ns)

    b = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))

    force = {"GINKGO_TPU_FORCE_VMEM_CG": "1"} if small else {}

    def solve(cls, data_kind, op, fused, **kw):
        env = dict(force) if fused else {"GINKGO_TPU_NO_FUSED_CG": "1"}
        old = {k: os.environ.get(k) for k in
               ("GINKGO_TPU_FORCE_VMEM_CG", "GINKGO_TPU_NO_FUSED_CG")}
        os.environ.pop("GINKGO_TPU_FORCE_VMEM_CG", None)
        os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)
        os.environ.update(env)
        try:
            s = cls.build(
                criteria=[stop.Iteration(max_iters=400),
                          stop.ResidualNorm(tolerance=1e-6)],
                **kw,
            ).generate(op)
            x, info = s.solve(b)
            return (np.asarray(x), int(info.iterations),
                    bool(np.all(np.asarray(info.converged))))
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    cells = []
    for fmt in ("dia", "pell"):
        for name, cls, sym, kw in (
            ("cg", gko.Cg, True, {}),
            ("fcg", gko.Fcg, True, {}),
            ("bicgstab", gko.Bicgstab, False, {}),
            ("cgs", gko.Cgs, False, {}),
            ("bicg", gko.Bicg, False, {}),
            ("gmres", gko.Gmres, False, {"krylov_dim": 30}),
            ("idr_s4", gko.Idr, False, {"subspace_dim": 4}),
            ("ir", gko.Ir, False, {}),
        ):
            data = spd if sym else nonsym
            if name == "ir":
                # Richardson contracts on the scaled operator
                data = MatrixData(data.shape, data.rows, data.cols,
                                  data.values / 8.0)
            if fmt == "dia":
                op = Dia.from_matrix_data(data)
            else:
                op = Pell.from_matrix_data(data)
            cells.append((f"{name}_{fmt}", cls, op, kw))

    failures = 0
    for label, cls, op, kw in cells:
        try:
            xf, itf, convf = solve(cls, label, op, fused=True, **kw)
            xg, itg, convg = solve(cls, label, op, fused=False, **kw)
            diff = float(np.max(np.abs(xf - xg)))
            scale = float(np.max(np.abs(xg))) or 1.0
            ok = (itf == itg) and (diff / scale < 5e-4)
            emit({"cell": label, "iters_fused": itf, "iters_stream": itg,
                  "converged": [convf, convg],
                  "max_rel_diff": round(diff / scale, 8), "pass": ok})
            failures += 0 if ok else 1
        except Exception as e:  # noqa: BLE001
            emit({"cell": label, "error": f"{type(e).__name__}: {e}"[:300]})
            failures += 1
    # ---- k-RHS seeded stopped-column cells (VERDICT r3 #9) --------------
    # one column converged at iteration ~1 (tiny absolute rhs), one never
    # (huge rhs vs absolute tol): the fused k-RHS kernels must freeze and
    # flag per column exactly as the streaming loop — certified ON CHIP
    # (the CPU-interpret version lives in test_pallas_cg.py:313).
    D_spd = Dia.from_matrix_data(spd)
    bk = np.empty((n, 2), np.float32)
    bk[:, 0] = rng.standard_normal(n) * 1e-7
    bk[:, 1] = rng.standard_normal(n) * 1e6
    bk = jnp.asarray(bk)

    def solve_krhs(cls, fused, **kw):
        env = dict(force) if fused else {"GINKGO_TPU_NO_FUSED_CG": "1"}
        old = {k: os.environ.get(k) for k in
               ("GINKGO_TPU_FORCE_VMEM_CG", "GINKGO_TPU_NO_FUSED_CG")}
        os.environ.pop("GINKGO_TPU_FORCE_VMEM_CG", None)
        os.environ.pop("GINKGO_TPU_NO_FUSED_CG", None)
        os.environ.update(env)
        try:
            s = cls.build(
                criteria=[stop.Iteration(max_iters=40),
                          stop.ResidualNorm(tolerance=1e-5,
                                            baseline="absolute")],
                **kw,
            ).generate(D_spd)
            x, info = s.solve(bk)
            return np.asarray(x), info
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for name, cls, kw in (("cg", gko.Cg, {}),
                          ("bicgstab", gko.Bicgstab, {}),
                          ("gmres", gko.Gmres, {"krylov_dim": 10})):
        label = f"krhs_stopped_{name}"
        try:
            xf, inf_f = solve_krhs(cls, fused=True, **kw)
            xg, inf_g = solve_krhs(cls, fused=False, **kw)
            cf = np.asarray(inf_f.converged)
            cg_ = np.asarray(inf_g.converged)
            frozen_identical = bool(np.allclose(
                xf[:, 0], xg[:, 0], rtol=2e-5, atol=1e-10
            ))
            ok = (
                bool(cf[0]) and not bool(cf[1])
                and np.array_equal(cf, cg_)
                and int(inf_f.iterations) == int(inf_g.iterations) == 40
                and frozen_identical
            )
            emit({"cell": label, "converged_fused": cf.tolist(),
                  "converged_stream": cg_.tolist(),
                  "iters": [int(inf_f.iterations), int(inf_g.iterations)],
                  "frozen_column_identical": frozen_identical,
                  "pass": ok})
            failures += 0 if ok else 1
        except Exception as e:  # noqa: BLE001
            emit({"cell": label, "error": f"{type(e).__name__}: {e}"[:300]})
            failures += 1
    emit({"summary": "soak_fused", "cells": len(cells) + 3,
          "failures": failures,
          "device": str(jax.devices()[0])})
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

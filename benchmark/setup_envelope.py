"""Setup-path envelope measurement (VERDICT r2 #7).

Times the host-side setup paths at the sizes the round-2 numbers left
unmeasured: ParILUT at 1M rows, PGM/AMG hierarchy at 4.19M rows.  The
1-vCPU host has wildly bursty memory throughput (CLAUDE.md), so each
path runs >= 2 in-process trials and reports the steady state (best).

Usage: `python benchmark/setup_envelope.py [--small]`
Prints one JSON line per row.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(row):
    print(json.dumps(row), flush=True)


def steady(fn, trials=2):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    small = "--small" in sys.argv or bool(os.environ.get("SETUP_SMALL"))
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side setup timing
    import ginkgo_tpu as gko
    from ginkgo_tpu.utils import generators

    # ---- ParILUT at 1M rows (round 2 measured 250k: 7-8 s) --------------
    try:
        from ginkgo_tpu.factorization.par_ilut import ParIlutFactory

        n_side = 128 if small else 1024  # 16k / 1.05M rows
        data = generators.poisson_2d(n_side, dtype=np.float32)
        A = gko.Csr.from_matrix_data(data)
        t, fact = steady(lambda: ParIlutFactory(iterations=5).generate(A))
        emit({"row": "parilut_setup", "n": data.shape[0],
              "nnz": int(data.nnz), "seconds": round(t, 2),
              "l_nnz": int(np.asarray(
                  fact.get_l_factor().to_csr().row_ptrs)[-1]) if hasattr(
                  fact.get_l_factor(), "to_csr") else None})
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        emit({"row": "parilut_setup", "error": str(e)[:300]})

    # ---- PGM/AMG hierarchy at 4.19M rows (round 2 measured 1M: ~7 s) ----
    try:
        from ginkgo_tpu.matrix.dia import Dia
        from ginkgo_tpu.solver.multigrid import Multigrid
        from ginkgo_tpu import stop

        n_side = 256 if small else 2048  # 65k / 4.19M rows
        data = generators.poisson_2d(n_side, dtype=np.float32)
        D = Dia.from_matrix_data(data)
        t, mg = steady(
            lambda: Multigrid.build(
                criteria=[stop.Iteration(max_iters=1)], max_levels=12
            ).generate(D),
            trials=2,
        )
        emit({"row": "pgm_hierarchy_setup", "n": data.shape[0],
              "levels": len(getattr(mg, "levels", [])) or None,
              "seconds": round(t, 2)})
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc()
        emit({"row": "pgm_hierarchy_setup", "error": str(e)[:300]})


if __name__ == "__main__":
    main()

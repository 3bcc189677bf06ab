"""CB-GMRES storage-mode crossover on chip (VERDICT r3 #8).

The reference's CB-GMRES exists because compressing the Krylov basis
saves bandwidth (cb_gmres.hpp:88-95); round 3 measured reduce1/integer
LOSING to plain GMRES at 262k ("conversion overhead eats the traffic
saving").  This measures seconds/iteration for storage modes
{keep, reduce1 (fused bf16 basis), integer (generic loop)} across
262k / 1M / 4.19M rows, interleaved in one process, slope-timed.

Prints one JSON line per (size, mode).  The per-size winner informs
CbGmres's data-driven default (solver/gmres.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def emit(row):
    print(json.dumps(row), flush=True)


def fence(x):
    return float(jnp.sum(x))


def main():
    import ginkgo_tpu as gko
    from ginkgo_tpu import stop
    from ginkgo_tpu.matrix.dia import Dia
    from ginkgo_tpu.utils import generators

    small = bool(os.environ.get("CB_SMALL"))
    if small:
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == "tpu", "run on the TPU"

    sides = (32, 48) if small else (512, 1024, 2048)
    modes = ("keep", "reduce1", "integer")
    lo_hi = (5, 20) if small else (60, 240)

    for side in sides:
        data = generators.poisson_2d(side, dtype=np.float32)
        D = Dia.from_matrix_data(data).scale(0.125)
        n = data.shape[0]
        b = jnp.ones((n, 1), jnp.float32)

        def total(mode, iters):
            s = gko.Gmres.build(
                criteria=[stop.Iteration(max_iters=iters)],
                krylov_dim=30,
                storage_precision=mode,
            ).generate(D)

            @jax.jit
            def run(rhs):
                x, _ = s.solve(rhs)
                return x

            fence(run(b))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fence(run(b))
                best = min(best, time.perf_counter() - t0)
            return best

        # interleave lo/hi across modes so chip drift hits all equally
        lo = {m: total(m, lo_hi[0]) for m in modes}
        hi = {m: total(m, lo_hi[1]) for m in modes}
        span = lo_hi[1] - lo_hi[0]
        row = {"row": "cb_gmres_crossover", "n": n, "krylov_dim": 30}
        for m in modes:
            sl = (hi[m] - lo[m]) / span
            if sl <= 0:  # drift: one fresh retry of this mode's pair
                lo[m] = min(lo[m], total(m, lo_hi[0]))
                hi[m] = total(m, lo_hi[1])
                sl = (hi[m] - lo[m]) / span
            row[f"{m}_us_per_iter"] = (
                round(sl * 1e6, 1) if sl > 0 else None
            )
        valid = {m: row[f"{m}_us_per_iter"] for m in modes
                 if row[f"{m}_us_per_iter"]}
        if valid:
            row["winner"] = min(valid, key=valid.get)
        emit(row)


if __name__ == "__main__":
    main()

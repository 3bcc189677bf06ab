"""Headline benchmark: stencil SpMV throughput vs HBM roofline on one chip.

Protocol notes:
- The axon TPU tunnel has ~25 us dispatch overhead, re-uploads closed-over
  constants per call, and `block_until_ready` does not reliably block, so
  timing is done with MANY SpMVs inside one jitted `lax.fori_loop` and a
  scalar readback as the fence; the per-apply cost is the slope between two
  trip counts (eliminates fixed costs).  Mirrors the reference's repetition
  protocol (benchmark/utils/general.hpp:94-117) adapted to this reality.
- Matrix: 2048^2 5-point Poisson stencil (4.19M rows, ~21M nnz), the
  poisson-solver / stencil class of the reference examples + benchmarks.
- Format: Dia (the TPU-native gather-free banded format, matrix/dia.py);
  CSR gather strategies are reported in `detail` for honesty.

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
    if "v5p" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 819.0


def timed_loop(apply_fn, operands, x0, n, trials=3):
    """Total seconds for n chained applies inside one jit, scalar-fenced."""

    @jax.jit
    def run(x, ops):
        def body(i, v):
            return apply_fn(v, ops)

        return jax.lax.fori_loop(0, n, body, x)

    float(jnp.sum(run(x0, operands)))  # warm + fence
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0, operands)))
        best = min(best, time.perf_counter() - t0)
    return best


def per_apply_seconds(apply_fn, operands, x0, n1=50, n2=200, trials=3):
    t1 = timed_loop(apply_fn, operands, x0, n1, trials)
    t2 = timed_loop(apply_fn, operands, x0, n2, trials)
    return (t2 - t1) / (n2 - n1)


def main():
    from ginkgo_tpu.utils import generators
    from ginkgo_tpu.matrix.csr import Csr
    from ginkgo_tpu.matrix.dia import Dia

    n_side = 2048
    data = generators.poisson_2d(n_side, dtype=np.float32)
    n, nnz = data.shape[0], data.nnz

    # scale so the iterated operator stays bounded (spectral radius <= 1);
    # keeps the timed loop a pure SpMV chain with no extra memory passes
    D = Dia.from_matrix_data(data).scale(0.125)
    x = jnp.ones((n,), dtype=jnp.float32)

    t_dia = per_apply_seconds(lambda v, op: op.apply(v), D, x)
    nd = D.num_diags
    bytes_dia = (nd + 2) * 4 * n  # nd diag reads + x read + y write
    gbs = bytes_dia / t_dia / 1e9
    frac = gbs / hbm_bandwidth_gbs()

    # honesty row: CSR classical (gather-based) at smaller size
    data_s = generators.poisson_2d(512, dtype=np.float32)
    A = Csr.from_matrix_data(data_s, index_dtype=np.int32).scale(0.125)
    xs = jnp.ones((data_s.shape[0],), dtype=jnp.float32)
    t_csr = per_apply_seconds(lambda v, op: op.apply(v), A, xs, n1=3, n2=10)

    out = {
        "metric": "spmv_roofline_frac",
        "value": round(frac, 4),
        "unit": "fraction",
        "vs_baseline": round(frac / 0.80, 4),
        "detail": {
            "matrix": f"poisson2d_{n_side}",
            "n": n,
            "nnz": nnz,
            "format": "dia",
            "spmv_seconds": t_dia,
            "effective_gbs": round(gbs, 1),
            "gnnz_per_s": round(nnz / t_dia / 1e9, 2),
            "csr_classical_seconds_512": t_csr,
            "csr_classical_gnnz_per_s": round(data_s.nnz / t_csr / 1e9, 4),
            "hbm_gbs": hbm_bandwidth_gbs(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

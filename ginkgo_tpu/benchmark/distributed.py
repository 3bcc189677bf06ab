"""Distributed solver benchmark: weak/strong scaling over a device mesh.

Reference: the distributed solver benchmarks driven by test/mpi + the
weak-scaling target of BASELINE.md (CG + Jacobi >= 75% nnz/s efficiency).
Runs distributed_solve over 1..N devices on the same (strong) or
proportionally grown (weak) problem and reports per-device throughput.

    python -m ginkgo_tpu.benchmark.distributed --mode weak --base-side 64
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from . import general


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    general.add_common_flags(p)
    p.add_argument("--mode", choices=["weak", "strong"], default="weak")
    p.add_argument("--base-side", type=int, default=64,
                   help="2-D Poisson side per device (weak) or total (strong)")
    p.add_argument("--max-iters", type=int, default=50)
    p.add_argument("--devices", default=None,
                   help="comma list of device counts (default 1,2,4,...)")
    p.add_argument("--operator", choices=["csr", "dia"], default="csr",
                   help="distributed operator: DistCsr (general) or "
                        "DistDia (banded ppermute-window fast path)")
    args = p.parse_args(argv)

    import os

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the env var alone does NOT disable an installed TPU plugin;
        # without this the 8-virtual-device mesh silently became the
        # single real TPU chip and ppermute indexed past the axis
        jax.config.update("jax_platforms", "cpu")

    from .. import Cg, stop
    from ..distributed import (
        Partition, DistCsr, DistDia, build_banded_partition,
        distributed_solve, make_mesh,
    )
    from ..utils import generators

    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(c) for c in args.devices.split(",")]
        over = [c for c in counts if c > n_avail]
        if over:
            raise SystemExit(
                f"requested device counts {over} exceed the {n_avail} "
                "available devices (for the CPU mesh, set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
    else:
        counts = [c for c in (1, 2, 4, 8, 16) if c <= n_avail]

    rows = []
    info = general.device_info()
    base = None
    for nd in counts:
        if args.mode == "weak":
            side = int(args.base_side * np.sqrt(nd))
        else:
            side = args.base_side
        data = generators.poisson_2d(side, dtype=np.float32)
        n = data.shape[0]
        if args.operator == "dia":
            part = build_banded_partition(n, nd)
            A = DistDia.from_matrix_data(data, part)
        else:
            part = Partition.build_from_global_size_uniform(n, nd)
            A = DistCsr.from_matrix_data(data, part)
        mesh = make_mesh(nd)
        b = jnp.ones((n, 1), jnp.float32)
        crit = [stop.Iteration(max_iters=args.max_iters)]

        def run():
            x, _ = distributed_solve(mesh, Cg, A, b, part, criteria=crit)
            return x

        general.fence(run())
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            general.fence(run())
            best = min(best, time.perf_counter() - t0)
        nnz_per_s = data.nnz * args.max_iters / best
        if base is None:
            base = nnz_per_s / nd
            base_t, base_nnz = best, data.nnz
        row = {
            "benchmark": "distributed_solver",
            "mode": args.mode,
            "devices": nd,
            "operator": args.operator,
            "halo_mode": getattr(A, "halo_mode", "ppermute_window"),
            "n": n,
            "nnz": int(data.nnz),
            "iterations": args.max_iters,
            "solve_s": best,
            "gnnz_per_s": nnz_per_s / 1e9,
            "scaling_efficiency": nnz_per_s / (base * nd),
            **info,
        }
        if jax.default_backend() == "cpu":
            # virtual mesh on shared host cores: all `nd` shards
            # serialize onto the same silicon, so raw per-device
            # efficiency measures host serialization (~1/nd), not the
            # distributed layer.  The honest metric compares against
            # perfectly-serialized execution of the same total work:
            # eff = (t_1 * work_nd / work_1) / t_nd; the shortfall from
            # 1.0 is the halo/collective/imbalance overhead fraction.
            work_ratio = data.nnz / base_nnz
            row["serialized_efficiency"] = base_t * work_ratio / best
            row["overhead_fraction"] = max(
                0.0, 1.0 - row["serialized_efficiency"]
            )
        rows.append(row)
    general.emit(rows, args)
    return rows


if __name__ == "__main__":
    main()

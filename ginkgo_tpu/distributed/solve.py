"""shard_map solve driver: run any solver over a mesh-distributed operator.

Reference analog: Ginkgo's solvers are distribution-transparent — the same
CG driver runs on distributed::Matrix/Vector via dispatch (cg.cpp:97,
core/distributed/vector.cpp dot = local + MPI_Allreduce).  Here the same
pytree solvers run *inside one shard_map*: their dots/norms psum over the
mesh axis (solver_base.vdot/norm2 with axis_name) and A.apply is the
halo-exchanging DistCsr SpMV.  The entire Krylov loop including collectives
is a single XLA computation per device — no host round trips at all.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..base.linop import as_2d
from ..stop.criterion import combine
from ..preconditioner.jacobi import JacobiFactory
from ..matrix.diagonal import Identity
from .matrix import DistCsr
from .partition import Partition


class DistDiagPrecond:
    """Scalar-Jacobi for distributed operators: purely local apply."""

    def __init__(self, inv_diag):
        self.inv_diag = inv_diag

    def apply(self, x):
        return self.inv_diag[:, None] * x if x.ndim > 1 else self.inv_diag * x


def pad_global(v, partition: Partition):
    """(n, k) global vector -> (P*L, k) padded part-ordered layout."""
    arr, was_1d = as_2d(jnp.asarray(v))
    Pn, L = partition.num_parts, partition.padded_local_size
    out = np.zeros((Pn * L, arr.shape[1]), dtype=arr.dtype)
    for p in range(Pn):
        rows = partition.rows_of_part[p]
        out[p * L : p * L + len(rows)] = np.asarray(arr)[rows]
    return jnp.asarray(out), was_1d


def unpad_global(vp, partition: Partition, was_1d=False):
    """(P*L, k) padded -> (n, k) global ordering."""
    Pn, L = partition.num_parts, partition.padded_local_size
    out = np.zeros((partition.global_size,) + vp.shape[1:], dtype=vp.dtype)
    vp = np.asarray(vp)
    for p in range(Pn):
        rows = partition.rows_of_part[p]
        out[rows] = vp[p * L : p * L + len(rows)]
    out = jnp.asarray(out)
    return out[:, 0] if was_1d else out


def distributed_solve(
    mesh: Mesh,
    solver_cls,
    A: DistCsr,
    b,
    partition: Partition,
    criteria=None,
    preconditioner=None,
    x0=None,
    axis: str | None = None,
    **solver_params,
):
    """Solve A x = b with solver_cls over `mesh` (1-D row partition).

    b, x0 are host/global (n,) or (n, k); returns (x_global, SolveInfo)."""
    axis = axis or A.axis_name
    crit = combine(criteria)
    bp, was_1d = pad_global(b, partition)
    xp = (
        pad_global(x0, partition)[0]
        if x0 is not None
        else jnp.zeros_like(bp)
    )
    L = partition.padded_local_size
    k = bp.shape[1]

    use_jacobi = isinstance(preconditioner, JacobiFactory)

    def shard_fn(a_shard, b_shard, x_shard):
        if use_jacobi:
            d = a_shard.extract_diagonal_local()
            M = DistDiagPrecond(jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1), 1.0))
        else:
            M = Identity.create(L, b_shard.dtype)
        solver = solver_cls.create(
            A=a_shard,
            preconditioner=M,
            criterion=crit,
            axis_name=axis,
            **solver_params,
        )
        x, info = solver._solve_impl(b_shard, x_shard)
        return x, info

    a_specs = jax.tree_util.tree_map(lambda _: P(axis), A)
    from jax import shard_map

    x, info = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(a_specs, P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )(A, bp, xp)
    return unpad_global(x, partition, was_1d), info


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))

"""Collective-communication vocabulary over a mesh axis.

Reference: include/ginkgo/core/base/mpi.hpp:436-1968 — the typed RAII MPI
wrapper (all_reduce, broadcast, gather, scatter, all_gather, all_to_all,
scan, send/recv, windows).  On TPU the transport is ICI/DCN and every op is
an XLA collective issued inside `shard_map`; this module mirrors the
reference's op names so `distributed::*` logic ports 1:1.

"GPU-aware vs host-staged" (mpi.hpp:70, matrix.cpp:278-283) has no analog:
collectives are always device-native.  One-sided windows map to `ppermute`
(the initiator pushes).  All functions REQUIRE an enclosing shard_map with
the given axis name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_reduce(x, axis_name, op: str = "sum"):
    """MPI_Allreduce (mpi.hpp all_reduce)."""
    if op == "sum":
        return jax.lax.psum(x, axis_name)
    if op == "max":
        return jax.lax.pmax(x, axis_name)
    if op == "min":
        return jax.lax.pmin(x, axis_name)
    if op == "prod":
        # signed product: track sign and zeros separately so negative and
        # zero inputs keep MPI_PROD semantics (log/exp alone would NaN)
        negs = jax.lax.psum((x < 0).astype(jnp.int32), axis_name)
        zeros = jax.lax.psum((x == 0).astype(jnp.int32), axis_name)
        mag = jnp.exp(
            jax.lax.psum(jnp.log(jnp.abs(jnp.where(x == 0, 1, x))), axis_name)
        )
        sign = 1.0 - 2.0 * (negs % 2).astype(mag.dtype)
        return jnp.where(zeros > 0, jnp.zeros_like(mag), sign * mag)
    raise ValueError(f"unknown reduce op {op}")


def all_gather(x, axis_name, axis: int = 0, tiled: bool = False):
    """MPI_Allgather (mpi.hpp all_gather)."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def all_to_all(x, axis_name, split_axis: int = 0, concat_axis: int = 0):
    """MPI_Alltoall (mpi.hpp all_to_all): x's split_axis must be divisible
    by the axis size."""
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis
    )


def broadcast(x, axis_name, root: int = 0):
    """MPI_Bcast (mpi.hpp broadcast): every device gets root's value."""
    idx = jax.lax.axis_index(axis_name)
    masked = jnp.where(idx == root, x, jnp.zeros_like(x))
    return jax.lax.psum(masked, axis_name)


def gather(x, axis_name, root: int = 0):
    """MPI_Gather: all shards stacked; non-root devices get zeros
    (SPMD has no true single-owner result — mask mirrors the root-only
    validity contract)."""
    g = jax.lax.all_gather(x, axis_name)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == root, g, jnp.zeros_like(g))


def scatter(x_stacked, axis_name):
    """MPI_Scatter analog: each device takes its slice of the leading axis
    (the stacked layout makes this a static index)."""
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_index_in_dim(x_stacked, idx, axis=0, keepdims=False)


def scan_sum(x, axis_name, exclusive: bool = False):
    """MPI_Scan / MPI_Exscan (mpi.hpp scan): prefix sum over device index."""
    g = jax.lax.all_gather(x, axis_name)  # (P, ...)
    idx = jax.lax.axis_index(axis_name)
    p = g.shape[0]
    pos = jnp.arange(p)
    lim = idx if exclusive else idx + 1
    mask = (pos < lim).reshape((p,) + (1,) * (g.ndim - 1))
    return jnp.sum(jnp.where(mask, g, jnp.zeros_like(g)), axis=0)


def send_recv(x, axis_name, shift: int = 1):
    """Nearest-neighbor p2p (mpi.hpp send/recv pairs): every device sends to
    (rank+shift) and receives from (rank-shift) — a ring ppermute."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + shift) % n) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def put(x, axis_name, target: int, source: int):
    """One-sided window put (mpi.hpp window r_put analog): `source` device's
    value lands on `target`; all other devices keep their own x."""
    n = jax.lax.axis_size(axis_name)
    perm = [(source, target)]
    moved = jax.lax.ppermute(x, axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == target, moved, x)


def rank(axis_name):
    """communicator.rank()."""
    return jax.lax.axis_index(axis_name)


def size(axis_name):
    """communicator.size()."""
    return jax.lax.axis_size(axis_name)

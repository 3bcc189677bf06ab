"""Distributed (row-partitioned) multivector.

Reference: core/distributed/vector.cpp — per-rank local Dense block;
compute_dot/conj_dot/norm2/norm1 = local kernel + MPI_Allreduce
(vector.cpp:317-440); assembly via read_distributed / build_local
(vector_kernels.hpp:52).

Same stacked-SPMD layout as DistCsr (matrix.py): values carry a leading
parts axis (P, L, k), padded rows masked by row_valid.  The reduction
methods come in two flavors:

- module-level shard functions (`dot`, `norm2`, ...) for use INSIDE
  shard_map, taking the local (L, k) block + axis_name — these are the
  exact analog of the reference's local-kernel + Allreduce pattern, with
  `psum` riding ICI;
- DistVector methods for host-level (outside shard_map) use, which compute
  the same results from the stacked layout (useful in tests/assembly).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import linop_dataclass, static_field
from .partition import Partition


# -- shard-level reductions (inside shard_map) ---------------------------------


def dot(a_local, b_local, axis_name):
    """compute_dot (vector.cpp:317): local product + psum."""
    s = jnp.sum(a_local * b_local, axis=0)
    return jax.lax.psum(s, axis_name)


def conj_dot(a_local, b_local, axis_name):
    """compute_conj_dot (vector.cpp:352)."""
    s = jnp.sum(jnp.conj(a_local) * b_local, axis=0)
    return jax.lax.psum(s, axis_name)


def norm2(a_local, axis_name):
    """compute_norm2 (vector.cpp:397)."""
    s = jnp.sum(jnp.abs(a_local) ** 2, axis=0)
    return jnp.sqrt(jax.lax.psum(s, axis_name).real)


def norm1(a_local, axis_name):
    """compute_norm1 (vector.cpp:427)."""
    s = jnp.sum(jnp.abs(a_local), axis=0)
    return jax.lax.psum(s, axis_name)


# -- stacked container (outside shard_map) --------------------------------------


@linop_dataclass
class DistVector:
    """Row-partitioned multivector in the stacked layout: (P, L, k)."""

    values: jnp.ndarray  # (P, L, k), padded rows zero
    row_valid: jnp.ndarray  # (P, L)
    shape: tuple = static_field(default=(0, 0))  # global (n, k)
    num_parts: int = static_field(default=1)
    local_size: int = static_field(default=0)

    @property
    def dtype(self):
        return self.values.dtype

    # -- assembly (read_distributed / build_local analog) ----------------------

    @staticmethod
    def from_global(x, partition: Partition) -> "DistVector":
        arr = jnp.asarray(x)
        if arr.ndim == 1:
            arr = arr[:, None]
        n, k = arr.shape
        P, L = partition.num_parts, partition.padded_local_size
        # scatter each global row into its (part, local) slot of the padded
        # frame (build_local kernel analog, vector_kernels.hpp:52)
        target = jnp.asarray(
            partition.part_of_row * L + partition.local_of_row
        )
        vals = (
            jnp.zeros((P * L, k), arr.dtype).at[target].set(arr).reshape(P, L, k)
        )
        rv = np.zeros((P, L), np.float32)
        for p in range(P):
            rv[p, : partition.part_sizes[p]] = 1
        return DistVector(
            values=vals * jnp.asarray(rv)[:, :, None].astype(arr.dtype),
            row_valid=jnp.asarray(rv),
            shape=(n, k),
            num_parts=P,
            local_size=L,
        )

    read_distributed = from_global

    def to_global(self, partition: Partition):
        """Gather back to a replicated (n, k) array (inverse of
        from_global)."""
        P, L = self.num_parts, self.local_size
        n, k = self.shape
        flat = self.values.reshape(P * L, k)
        rows = []
        for p in range(P):
            sz = partition.part_sizes[p]
            rows.append(flat[p * L : p * L + sz])
        return jnp.concatenate(rows, axis=0)[:n]

    # -- reductions (stacked layout; match the shard functions) -----------------

    def compute_dot(self, other: "DistVector"):
        return jnp.sum(self.values * other.values, axis=(0, 1))

    def compute_conj_dot(self, other: "DistVector"):
        return jnp.sum(jnp.conj(self.values) * other.values, axis=(0, 1))

    def compute_norm2(self):
        return jnp.sqrt(jnp.sum(jnp.abs(self.values) ** 2, axis=(0, 1)).real)

    def compute_norm1(self):
        return jnp.sum(jnp.abs(self.values), axis=(0, 1))

    # -- elementwise algebra -----------------------------------------------------

    def scale(self, alpha):
        return self.replace(values=self.values * jnp.asarray(alpha))

    def add_scaled(self, alpha, other: "DistVector"):
        return self.replace(
            values=self.values + jnp.asarray(alpha) * other.values
        )

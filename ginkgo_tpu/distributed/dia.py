"""Mesh-distributed DIA (banded/stencil) operator — the TPU-native
distributed SpMV fast path.

Reference analog: distributed::Matrix's local/non-local split + halo
exchange (core/distributed/matrix.cpp:263-335).  For a banded operator on
a contiguous equal-block row partition, the split collapses beautifully:
every nonzero of part p's rows lies within the window
[x_{p-1}; x_p; x_{p+1}] (bandwidth <= L), so

- the halo exchange is exactly two ring `ppermute`s (one slab from each
  neighbor — O(L) ICI traffic, the minimal possible), and
- the local SpMV is a sum of STATIC SLICES of the window:
      y[i] = sum_d diag_d[i] * window[L + i + off_d]
  — no gather, no permutation matmuls, no in-frame lane shifts (the
  window absorbs the shift), pure streaming that XLA fuses into one pass.

This is the distributed counterpart of matrix/dia.py and the operator the
weak-scaling target (BASELINE.md) is designed around.  Requires a
partition of equal contiguous blocks of ceil(n/P) rows — build it with
`build_banded_partition(n, num_parts)` (this module) — and operator
bandwidth <= block size.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from .partition import Partition

LANES = 128


@linop_dataclass
class DistDia(LinOp):
    """Row-distributed banded operator in the stacked-SPMD layout.

    All array fields carry a leading parts axis (shard it over the mesh);
    inside shard_map that axis has extent 1."""

    diags: jnp.ndarray  # (P, nd, L) diagonal values per part, row-aligned
    row_valid: jnp.ndarray  # (P, L)
    offsets: tuple = static_field(default=())  # static ints, |off| <= L
    shape: tuple = static_field(default=(0, 0))
    local_size: int = static_field(default=0)  # L (128-aligned)
    num_parts: int = static_field(default=1)
    axis_name: Any = static_field(default=None)

    @property
    def dtype(self):
        return self.diags.dtype

    # -- assembly ---------------------------------------------------------------

    @staticmethod
    def from_matrix_data(
        data: MatrixData, partition: Partition, axis_name="rows"
    ) -> "DistDia":
        from ..base.exceptions import BadDimension

        d = data.sum_duplicates()
        n, m = d.shape
        if n != m:
            raise BadDimension(f"distributed operator must be square, got {d.shape}")
        P = partition.num_parts
        L = partition.padded_local_size
        # equal contiguous blocks: row r -> (r // L, r % L) must match
        if not np.array_equal(partition.part_of_row, np.minimum(
            np.arange(n) // L, P - 1
        )):
            raise ValueError(
                "DistDia requires contiguous equal blocks of the padded "
                "local size (build_banded_partition)"
            )
        offs = np.unique(d.cols - d.rows)
        if len(offs) and (offs.min() < -L or offs.max() > L):
            raise ValueError(
                f"bandwidth {max(abs(offs.min()), abs(offs.max()))} exceeds "
                f"local block size {L}; use more rows per part"
            )
        nd = max(len(offs), 1)
        diags = np.zeros((P, nd, L), dtype=d.values.dtype)
        off_idx = np.searchsorted(offs, d.cols - d.rows)
        part_r = d.rows // L
        part_r = np.minimum(part_r, P - 1)
        loc_r = d.rows - part_r * L
        diags[part_r, off_idx, loc_r] = d.values
        row_valid = np.zeros((P, L), dtype=d.values.dtype)
        for p in range(P):
            row_valid[p, : max(0, min(L, n - p * L))] = 1
        return DistDia(
            diags=jnp.asarray(diags),
            row_valid=jnp.asarray(row_valid),
            offsets=tuple(int(o) for o in offs) if len(offs) else (0,),
            shape=(n, m),
            local_size=L,
            num_parts=P,
            axis_name=axis_name,
        )

    # -- shard-level ops (inside shard_map; leading parts axis == 1) -------------

    def _sq(self, a):
        return a[0]

    def apply(self, x_local):
        """y_local = (A x)_local.  Halo = two ring ppermutes; SpMV = static
        window slices (module docstring)."""
        arr, was_1d = as_2d(x_local)  # (L, k)
        L = self.local_size
        P = self.num_parts
        ax = self.axis_name
        if P > 1:
            from_prev = jax.lax.ppermute(
                arr, ax, [(i, i + 1) for i in range(P - 1)]
            )
            from_next = jax.lax.ppermute(
                arr, ax, [(i + 1, i) for i in range(P - 1)]
            )
            window = jnp.concatenate([from_prev, arr, from_next], axis=0)
        else:
            z = jnp.zeros_like(arr)
            window = jnp.concatenate([z, arr, z], axis=0)
        diags = self._sq(self.diags)  # (nd, L)
        y = None
        for j, off in enumerate(self.offsets):
            seg = jax.lax.slice_in_dim(window, L + off, 2 * L + off, axis=0)
            term = diags[j][:, None] * seg
            y = term if y is None else y + term
        y = y * self._sq(self.row_valid)[:, None]
        return restore_1d(y, was_1d)

    def extract_diagonal_local(self):
        if 0 in self.offsets:
            j = self.offsets.index(0)
            diag = self._sq(self.diags)[j]
        else:
            diag = jnp.zeros((self.local_size,), self.dtype)
        return jnp.where(self._sq(self.row_valid) > 0, diag, 1)


def build_banded_partition(n: int, num_parts: int) -> Partition:
    """Equal contiguous blocks of ceil(n / P) rows (the DistDia contract:
    row r lives on part r // L)."""
    L = -(-n // num_parts)
    bounds = np.minimum(np.arange(num_parts + 1) * L, n)
    return Partition.build_from_contiguous(bounds)

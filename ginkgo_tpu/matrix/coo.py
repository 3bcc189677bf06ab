"""COO sparse matrix (reference include/ginkgo/core/matrix/coo.hpp:372,
common/cuda_hip/matrix/coo_kernels.hpp.inc).

Entries are kept row-major sorted (like the reference's canonical order);
SpMV is a sorted segment-sum.  `apply2` (x += A b without zeroing,
core/matrix/coo.cpp:62-65) is preserved."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData, DeviceMatrixData
from ..base import types
from ..ops import spmv as spmv_ops


@linop_dataclass
class Coo(LinOp):
    rows: jnp.ndarray
    cols: jnp.ndarray
    values: jnp.ndarray
    shape: tuple = static_field(default=(0, 0))

    @staticmethod
    def from_matrix_data(data: MatrixData, index_dtype=types.DEFAULT_INDEX_TYPE):
        d = data.sum_duplicates()
        return Coo(
            rows=jnp.asarray(d.rows, dtype=index_dtype),
            cols=jnp.asarray(d.cols, dtype=index_dtype),
            values=jnp.asarray(d.values),
            shape=tuple(d.shape),
        )

    read = from_matrix_data

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self):
        return self.values.shape[0]

    def apply(self, b):
        arr, was_1d = as_2d(b)
        out = spmv_ops.try_streaming(self, arr)
        if out is None:
            out = spmv_ops.coo_spmv(
                self.rows, self.cols, self.values, arr, self.shape[0]
            )
        return restore_1d(out, was_1d)

    def apply2(self, b, x):
        """x += A @ b  (reference coo apply2/spmv2)."""
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        out = xa + spmv_ops.coo_spmv(
            self.rows, self.cols, self.values, arr, self.shape[0]
        )
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        out = spmv_ops.advanced(self.apply(arr), alpha, beta, xa)
        return restore_1d(out, was_1d)

    def transpose(self) -> "Coo":
        order = jnp.lexsort((self.rows, self.cols))
        return Coo(
            rows=self.cols[order],
            cols=self.rows[order],
            values=self.values[order],
            shape=(self.shape[1], self.shape[0]),
        )

    def conj_transpose(self) -> "Coo":
        t = self.transpose()
        return t.replace(values=jnp.conj(t.values))

    def scale(self, alpha) -> "Coo":
        return self.replace(values=self.values * jnp.asarray(alpha).reshape(()))

    def compute_absolute(self) -> "Coo":
        return self.replace(values=jnp.abs(self.values))

    def extract_diagonal(self):
        from .diagonal import Diagonal

        n = min(self.shape)
        on_diag = (self.rows == self.cols) & (self.rows < n)
        diag = jax.ops.segment_sum(
            jnp.where(on_diag, self.values, 0),
            jnp.where(on_diag, self.rows, 0).astype(jnp.int32),
            num_segments=n,
        )
        return Diagonal(values=diag)

    def to_matrix_data(self) -> MatrixData:
        return MatrixData(
            self.shape,
            to_host(self.rows),
            to_host(self.cols),
            to_host(self.values),
        )

    write = to_matrix_data

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        counts = jax.ops.segment_sum(
            jnp.ones_like(self.rows),
            self.rows,
            num_segments=self.shape[0],
            indices_are_sorted=True,
        )
        row_ptrs = jnp.concatenate(
            [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)]
        ).astype(self.rows.dtype)
        return Csr(
            row_ptrs=row_ptrs,
            col_idxs=self.cols,
            values=self.values,
            shape=self.shape,
            strategy=strategy,
        )

    def to_dense(self):
        from .dense import Dense

        vals = jnp.zeros(self.shape, dtype=self.dtype).at[self.rows, self.cols].add(
            self.values
        )
        return Dense(values=vals)

    def to_coo(self):
        return self

    def astype(self, dtype) -> "Coo":
        return self.replace(values=self.values.astype(dtype))

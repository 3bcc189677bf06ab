"""SparsityCsr — pattern-only CSR with one implicit value.

Reference: include/ginkgo/core/matrix/sparsity_csr.hpp (348) — used by
ISAI/symbolic machinery and as an adjacency structure; supports SpMV with the
implicit value, diagonal-element removal, and transposition."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from ..ops import spmv as spmv_ops


@linop_dataclass
class SparsityCsr(LinOp):
    row_ptrs: jnp.ndarray
    col_idxs: jnp.ndarray
    value: jnp.ndarray  # scalar implicit value (default 1)
    shape: tuple = static_field(default=(0, 0))

    @staticmethod
    def from_matrix_data(data: MatrixData, value=1.0) -> "SparsityCsr":
        from .csr import Csr

        c = Csr.from_matrix_data(data)
        return SparsityCsr(
            row_ptrs=c.row_ptrs,
            col_idxs=c.col_idxs,
            value=jnp.asarray(value, dtype=np.asarray(data.values).dtype),
            shape=c.shape,
        )

    read = from_matrix_data

    @property
    def dtype(self):
        return self.value.dtype

    @property
    def nnz(self):
        return self.col_idxs.shape[0]

    num_nonzeros = nnz

    def apply(self, b):
        arr, was_1d = as_2d(b)
        out = spmv_ops.try_streaming(self, arr)
        if out is None:
            ones = jnp.broadcast_to(self.value, (self.nnz,))
            out = spmv_ops.csr_spmv_classical(
                self.row_ptrs, self.col_idxs, ones, arr, self.shape[0]
            )
        return restore_1d(out, was_1d)

    def transpose(self) -> "SparsityCsr":
        from .csr import Csr

        t = Csr(
            row_ptrs=self.row_ptrs,
            col_idxs=self.col_idxs,
            values=jnp.ones((self.nnz,), self.dtype),
            shape=self.shape,
        ).transpose()
        return SparsityCsr(
            row_ptrs=t.row_ptrs,
            col_idxs=t.col_idxs,
            value=self.value,
            shape=t.shape,
        )

    def to_adjacency_matrix(self) -> "SparsityCsr":
        """Remove diagonal entries (sparsity_csr to_adjacency_matrix)."""
        rp = to_host(self.row_ptrs)
        ci = to_host(self.col_idxs)
        n = self.shape[0]
        rows = np.repeat(np.arange(n), rp[1:] - rp[:-1])
        keep = rows != ci
        data = MatrixData.from_coo(
            self.shape, rows[keep], ci[keep], np.ones(keep.sum())
        )
        return SparsityCsr.from_matrix_data(data, value=to_host(self.value))

    def astype(self, dtype):
        return self.replace(value=self.value.astype(dtype))

    def to_matrix_data(self) -> MatrixData:
        rp = to_host(self.row_ptrs)
        rows = np.repeat(np.arange(self.shape[0]), rp[1:] - rp[:-1])
        return MatrixData.from_coo(
            self.shape,
            rows,
            to_host(self.col_idxs),
            np.full(len(rows), float(to_host(self.value))),
        )

    write = to_matrix_data

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        return Csr(
            row_ptrs=self.row_ptrs,
            col_idxs=self.col_idxs,
            values=jnp.broadcast_to(self.value, (self.nnz,)),
            shape=self.shape,
            strategy=strategy,
        )

    def to_dense(self):
        return self.to_csr().to_dense()

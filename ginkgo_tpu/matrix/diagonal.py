"""Diagonal, Identity, Permutation, RowGatherer — small structural LinOps.

Reference: include/ginkgo/core/matrix/diagonal.hpp:270, identity.hpp:131/166,
permutation.hpp:271, row_gatherer.hpp:176."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData


@linop_dataclass
class Diagonal(LinOp):
    """Diagonal matrix; left apply scales rows, rapply scales columns
    (reference diagonal.hpp: apply = row scaling, rapply = column scaling)."""

    values: jnp.ndarray  # (n,)

    @staticmethod
    def create(values):
        return Diagonal(values=jnp.asarray(values))

    @staticmethod
    def from_matrix_data(data: MatrixData):
        n = min(data.shape)
        diag = np.zeros(n, dtype=data.values.dtype)
        mask = data.rows == data.cols
        np.add.at(diag, data.rows[mask], data.values[mask])
        return Diagonal(values=jnp.asarray(diag))

    read = from_matrix_data

    @property
    def shape(self):
        n = self.values.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self.values.dtype

    def apply(self, b):
        arr, was_1d = as_2d(b)
        return restore_1d(self.values[:, None] * arr, was_1d)

    def rapply(self, b):
        """Column scaling: b @ D."""
        arr, was_1d = as_2d(b)
        return restore_1d(arr * self.values[None, :], was_1d)

    def inverse_apply(self, b):
        arr, was_1d = as_2d(b)
        return restore_1d(arr / self.values[:, None], was_1d)

    def transpose(self):
        return self

    def conj_transpose(self):
        return Diagonal(values=jnp.conj(self.values))

    def compute_absolute(self):
        return Diagonal(values=jnp.abs(self.values))

    def inverse(self):
        return Diagonal(values=1.0 / self.values)

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        n = self.shape[0]
        return Csr(
            row_ptrs=jnp.arange(n + 1, dtype=jnp.int32),
            col_idxs=jnp.arange(n, dtype=jnp.int32),
            values=self.values,
            shape=self.shape,
            strategy=strategy,
        )

    def to_dense(self):
        from .dense import Dense

        return Dense(values=jnp.diag(self.values))

    def to_matrix_data(self) -> MatrixData:
        n = self.shape[0]
        idx = np.arange(n)
        return MatrixData(self.shape, idx, idx, to_host(self.values))

    write = to_matrix_data


@linop_dataclass
class Identity(LinOp):
    """Identity LinOp; the default preconditioner (identity.hpp:131)."""

    n: int = static_field(default=0)
    _dtype: str = static_field(default="float32")

    @staticmethod
    def create(n, dtype=jnp.float32):
        return Identity(n=int(n), _dtype=str(np.dtype(dtype)))

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return np.dtype(self._dtype)

    def apply(self, b):
        arr = getattr(b, "values", b)
        return arr

    def apply_advanced(self, alpha, b, beta, x):
        arr = getattr(b, "values", b)
        xa = getattr(x, "values", x)
        return jnp.asarray(alpha).reshape(()) * arr + jnp.asarray(beta).reshape(()) * xa

    def transpose(self):
        return self

    conj_transpose = transpose


class IdentityFactory:
    """Factory analog (identity.hpp:131): generate(A) -> Identity(A rows)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype

    def generate(self, A):
        return Identity.create(A.shape[0], self.dtype)


@linop_dataclass
class Permutation(LinOp):
    """Permutation LinOp (permutation.hpp:271).  apply(b) = b[perm]."""

    permutation: jnp.ndarray  # (n,)

    @staticmethod
    def create(perm):
        return Permutation(permutation=jnp.asarray(perm, dtype=jnp.int32))

    @property
    def shape(self):
        n = self.permutation.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self.permutation.dtype

    def apply(self, b):
        arr, was_1d = as_2d(b)
        return restore_1d(arr[self.permutation], was_1d)

    def inverse_apply(self, b):
        arr, was_1d = as_2d(b)
        out = jnp.zeros_like(arr).at[self.permutation].set(arr)
        return restore_1d(out, was_1d)

    def transpose(self):
        inv = jnp.zeros_like(self.permutation).at[self.permutation].set(
            jnp.arange(self.permutation.shape[0], dtype=self.permutation.dtype)
        )
        return Permutation(permutation=inv)

    def to_host(self) -> np.ndarray:
        return to_host(self.permutation)


@linop_dataclass
class RowGatherer(LinOp):
    """Gather rows as a LinOp (row_gatherer.hpp:176); rectangular (k, n)."""

    row_idxs: jnp.ndarray  # (k,)
    n_cols: int = static_field(default=0)

    @staticmethod
    def create(row_idxs, n_cols):
        return RowGatherer(
            row_idxs=jnp.asarray(row_idxs, dtype=jnp.int32), n_cols=int(n_cols)
        )

    @property
    def shape(self):
        return (self.row_idxs.shape[0], self.n_cols)

    @property
    def dtype(self):
        return self.row_idxs.dtype

    def apply(self, b):
        arr, was_1d = as_2d(b)
        return restore_1d(arr[self.row_idxs], was_1d)

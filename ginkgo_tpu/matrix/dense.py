"""Dense matrix / multivector.

TPU-native analog of reference Dense (include/ginkgo/core/matrix/dense.hpp,
core/matrix/dense.cpp; 42 kernels declared in core/matrix/dense_kernels.hpp).
Doubles as the multivector type used by all solvers, exactly like the
reference.  Apply is a plain MXU matmul; the BLAS-1 surface
(dot/conj_dot/norm1/norm2, scale/add_scaled) are column-wise ops that XLA
fuses; permutes/row_gather are takes.  Strides are not modeled — XLA owns
layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from ..base import types


@linop_dataclass
class Dense(LinOp):
    values: jnp.ndarray  # (n, k)

    # -- construction --------------------------------------------------------

    @staticmethod
    def create(values) -> "Dense":
        arr = jnp.asarray(values)
        if arr.ndim == 1:
            arr = arr[:, None]
        return Dense(values=arr)

    @staticmethod
    def zeros(shape, dtype=types.DEFAULT_VALUE_TYPE) -> "Dense":
        return Dense(values=jnp.zeros(shape, dtype=dtype))

    @staticmethod
    def from_matrix_data(data: MatrixData) -> "Dense":
        return Dense(values=jnp.asarray(data.to_dense()))

    # ReadableFromMatrixData analog (lin_op.hpp:610)
    read = from_matrix_data

    # -- core ----------------------------------------------------------------

    @property
    def shape(self):
        return tuple(self.values.shape)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def num_stored_elements(self):
        return self.values.size

    def apply(self, b):
        arr, was_1d = as_2d(b)
        out = jnp.dot(
            self.values,
            arr,
            preferred_element_type=_acc_dtype(self.dtype),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.result_type(self.dtype, arr.dtype))
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        out = jnp.asarray(alpha).reshape(()) * jnp.dot(
            self.values,
            arr,
            preferred_element_type=_acc_dtype(self.dtype),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(xa.dtype) + jnp.asarray(beta).reshape(()) * xa
        return restore_1d(out, was_1d)

    # -- BLAS-1 column-wise (dense_kernels.hpp compute_dot/conj_dot/norm2/norm1,
    #    scale/inv_scale/add_scaled/sub_scaled) -------------------------------

    def compute_dot(self, other) -> jnp.ndarray:
        o, _ = as_2d(other)
        s, _ = as_2d(self)
        return jnp.sum(s * o, axis=0)

    def compute_conj_dot(self, other) -> jnp.ndarray:
        o, _ = as_2d(other)
        s, _ = as_2d(self)
        return jnp.sum(jnp.conj(s) * o, axis=0)

    def compute_norm2(self) -> jnp.ndarray:
        s, _ = as_2d(self)
        return jnp.sqrt(jnp.sum(jnp.abs(s) ** 2, axis=0).real)

    def compute_norm1(self) -> jnp.ndarray:
        s, _ = as_2d(self)
        return jnp.sum(jnp.abs(s), axis=0).real

    def compute_mean(self) -> jnp.ndarray:
        s, _ = as_2d(self)
        return jnp.mean(s, axis=0)

    def scale(self, alpha) -> "Dense":
        return Dense(values=self.values * _col_scalar(alpha, self.values))

    def inv_scale(self, alpha) -> "Dense":
        return Dense(values=self.values / _col_scalar(alpha, self.values))

    def add_scaled(self, alpha, other) -> "Dense":
        o, _ = as_2d(other)
        return Dense(values=self.values + _col_scalar(alpha, self.values) * o)

    def sub_scaled(self, alpha, other) -> "Dense":
        o, _ = as_2d(other)
        return Dense(values=self.values - _col_scalar(alpha, self.values) * o)

    # -- structure ops --------------------------------------------------------

    def transpose(self) -> "Dense":
        return Dense(values=self.values.T)

    def conj_transpose(self) -> "Dense":
        return Dense(values=jnp.conj(self.values).T)

    def row_gather(self, indices) -> "Dense":
        return Dense(values=self.values[jnp.asarray(indices)])

    def row_permute(self, perm) -> "Dense":
        # row i of result = row perm[i] of self (reference permute semantics)
        return Dense(values=self.values[jnp.asarray(perm)])

    def inverse_row_permute(self, perm) -> "Dense":
        p = jnp.asarray(perm)
        return Dense(values=jnp.zeros_like(self.values).at[p].set(self.values))

    def column_permute(self, perm) -> "Dense":
        return Dense(values=self.values[:, jnp.asarray(perm)])

    def inverse_column_permute(self, perm) -> "Dense":
        p = jnp.asarray(perm)
        out = jnp.zeros_like(self.values).at[:, p].set(self.values)
        return Dense(values=out)

    def symm_permute(self, perm) -> "Dense":
        p = jnp.asarray(perm)
        return Dense(values=self.values[p][:, p])

    def extract_diagonal(self):
        from .diagonal import Diagonal

        n = min(self.shape)
        return Diagonal(values=jnp.diagonal(self.values)[:n])

    def compute_absolute(self) -> "Dense":
        return Dense(values=jnp.abs(self.values))

    def make_complex(self) -> "Dense":
        return Dense(values=self.values.astype(types.complex_dtype(self.dtype)))

    def get_real(self) -> "Dense":
        return Dense(values=self.values.real)

    def get_imag(self) -> "Dense":
        return Dense(values=self.values.imag)

    def fill(self, value) -> "Dense":
        return Dense(values=jnp.full_like(self.values, value))

    def add_scaled_identity(self, alpha, beta) -> "Dense":
        # self := alpha * I + beta * self  (ScaledIdentityAddable, lin_op.hpp:823)
        n = min(self.shape)
        eye = jnp.zeros_like(self.values).at[
            jnp.arange(n), jnp.arange(n)
        ].set(1)
        a = jnp.asarray(alpha).reshape(())
        b = jnp.asarray(beta).reshape(())
        return Dense(values=a * eye + b * self.values)

    def astype(self, dtype) -> "Dense":
        return Dense(values=self.values.astype(dtype))

    # -- views / sub-blocks ----------------------------------------------------

    def create_submatrix(self, rows: slice, cols: slice) -> "Dense":
        return Dense(values=self.values[rows, cols])

    def column(self, j) -> "Dense":
        return Dense(values=self.values[:, j : j + 1])

    # -- IO / conversion -------------------------------------------------------

    def to_matrix_data(self, drop_tol: float = 0.0) -> MatrixData:
        return MatrixData.from_dense(to_host(self.values), drop_tol)

    write = to_matrix_data  # WritableToMatrixData analog (lin_op.hpp:665)

    def to_dense(self) -> "Dense":
        return self

    def to_csr(self, **kw):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data(), **kw)

    def to_coo(self, **kw):
        from .coo import Coo

        return Coo.from_matrix_data(self.to_matrix_data(), **kw)

    def __getitem__(self, idx):
        return self.values[idx]


def _col_scalar(alpha, values):
    """alpha may be a python scalar, a (k,) per-column vector, or a (1,k)
    Dense row (reference uses 1×k Dense scalars)."""
    a = jnp.asarray(getattr(alpha, "values", alpha))
    if a.ndim == 0:
        return a
    return a.reshape(1, -1)


def _acc_dtype(dtype):
    d = np.dtype(dtype)
    if d == np.dtype(jnp.bfloat16) or d == np.float16:
        return jnp.float32
    return d

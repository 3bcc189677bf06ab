"""ELL and SELL-P padded sparse formats.

Reference: include/ginkgo/core/matrix/ell.hpp (417; column-major padded rows,
subwarp-per-row SpMV) and sellp.hpp (399; `default_slice_size=64`,
`stride_factor`, slice-local padding via the slice_sets prefix sum).

TPU design: both are *fully static* forms — the padding that costs memory on
GPUs buys shape stability on TPU.  ELL stores (n, K) row-major so the
per-slot column gather is an embedding-style take; SELL-P keeps the
reference's slice layout as a (total_slots, slice_size) stack whose ragged
per-slice reduction is a sorted segment-sum over slot-rows (ops/spmv.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from ..ops import spmv as spmv_ops


@linop_dataclass
class Ell(LinOp):
    col_idxs: jnp.ndarray  # (n, K) pad col 0
    values: jnp.ndarray  # (n, K) pad val 0
    shape: tuple = static_field(default=(0, 0))

    @staticmethod
    def from_matrix_data(data: MatrixData, max_nnz_per_row: int | None = None):
        from .csr import Csr

        return Ell.from_csr(Csr.from_matrix_data(data), max_nnz_per_row)

    read = from_matrix_data

    @staticmethod
    def from_csr(csr, max_nnz_per_row: int | None = None) -> "Ell":
        rl = csr.host_row_lengths()
        K = int(max_nnz_per_row or (rl.max() if len(rl) else 0))
        K = max(K, 1)
        n = csr.shape[0]
        rp = np.asarray(csr.row_ptrs)
        ci = np.asarray(csr.col_idxs)
        vv = np.asarray(csr.values)
        cols = np.zeros((n, K), np.int32)
        vals = np.zeros((n, K), vv.dtype)
        for k in range(K):
            sel = rl > k
            idx = rp[:-1][sel] + k
            cols[sel, k] = ci[idx]
            vals[sel, k] = vv[idx]
        return Ell(
            col_idxs=jnp.asarray(cols), values=jnp.asarray(vals), shape=csr.shape
        )

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def max_nnz_per_row(self):
        return self.values.shape[1]

    @property
    def nnz(self):
        return self.values.size

    def apply(self, b):
        arr, was_1d = as_2d(b)
        out = spmv_ops.try_streaming(self, arr)
        if out is None:
            out = spmv_ops.ell_spmv(
                self.col_idxs, self.values, arr, self.shape[0]
            )
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        return restore_1d(
            spmv_ops.advanced(self.apply(arr), alpha, beta, xa), was_1d
        )

    def extract_diagonal(self):
        from .diagonal import Diagonal

        n = min(self.shape)
        rows = jnp.arange(self.shape[0])[:, None]
        on_diag = (self.col_idxs == rows) & (self.values != 0)
        diag_full = jnp.sum(jnp.where(on_diag, self.values, 0), axis=1)
        return Diagonal(values=diag_full[:n])

    def compute_absolute(self):
        return self.replace(values=jnp.abs(self.values))

    def scale(self, alpha):
        return self.replace(values=self.values * jnp.asarray(alpha).reshape(()))

    def to_matrix_data(self) -> MatrixData:
        cols = to_host(self.col_idxs)
        vals = to_host(self.values)
        n, K = vals.shape
        rows = np.repeat(np.arange(n), K)
        keep = vals.ravel() != 0
        return MatrixData.from_coo(
            self.shape, rows[keep], cols.ravel()[keep], vals.ravel()[keep]
        ).sort_row_major()

    write = to_matrix_data

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data(), strategy=strategy)

    def astype(self, dtype):
        return self.replace(values=self.values.astype(dtype))

    def to_dense(self):
        from .dense import Dense

        rows = jnp.arange(self.shape[0])[:, None] * jnp.ones(
            (1, self.max_nnz_per_row), jnp.int32
        )
        out = jnp.zeros(self.shape, self.dtype).at[
            rows.astype(jnp.int32), self.col_idxs
        ].add(self.values)
        return Dense(values=out)


@linop_dataclass
class Sellp(LinOp):
    slice_sets: jnp.ndarray  # (num_slices+1,) slot-row prefix sum
    col_idxs: jnp.ndarray  # (total_slots, C)
    values: jnp.ndarray  # (total_slots, C)
    shape: tuple = static_field(default=(0, 0))
    slice_size: int = static_field(default=64)

    default_slice_size = 64  # sellp.hpp:45
    default_stride_factor = 1  # sellp.hpp:47

    @staticmethod
    def from_matrix_data(data: MatrixData, slice_size=64, stride_factor=1):
        from .csr import Csr

        return Sellp.from_csr(Csr.from_matrix_data(data), slice_size, stride_factor)

    read = from_matrix_data

    @staticmethod
    def from_csr(csr, slice_size: int = 64, stride_factor: int = 1) -> "Sellp":
        n = csr.shape[0]
        C = int(slice_size)
        rl = csr.host_row_lengths()
        num_slices = max(-(-n // C), 1)
        rl_pad = np.zeros(num_slices * C, np.int64)
        rl_pad[:n] = rl
        per_slice = rl_pad.reshape(num_slices, C)
        slice_len = per_slice.max(axis=1)
        slice_len = -(-slice_len // stride_factor) * stride_factor  # stride pad
        slice_sets = np.zeros(num_slices + 1, np.int64)
        slice_sets[1:] = np.cumsum(slice_len)
        total = int(slice_sets[-1])
        cols = np.zeros((max(total, 1), C), np.int32)
        vals = np.zeros((max(total, 1), C), np.asarray(csr.values).dtype)
        rp = np.asarray(csr.row_ptrs)
        ci = np.asarray(csr.col_idxs)
        vv = np.asarray(csr.values)
        for s in range(num_slices):
            base = slice_sets[s]
            for lr in range(C):
                r = s * C + lr
                if r >= n:
                    break
                cnt = rl[r]
                cols[base : base + cnt, lr] = ci[rp[r] : rp[r] + cnt]
                vals[base : base + cnt, lr] = vv[rp[r] : rp[r] + cnt]
        return Sellp(
            slice_sets=jnp.asarray(slice_sets, jnp.int32),
            col_idxs=jnp.asarray(cols),
            values=jnp.asarray(vals),
            shape=csr.shape,
            slice_size=C,
        )

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def num_slices(self):
        return self.slice_sets.shape[0] - 1

    @property
    def total_cols(self):  # total slot-rows (reference: total_cols)
        return self.values.shape[0]

    def apply(self, b):
        arr, was_1d = as_2d(b)
        out = spmv_ops.try_streaming(self, arr)
        if out is not None:
            return restore_1d(out, was_1d)
        out = spmv_ops.sellp_spmv(
            self.slice_sets,
            self.col_idxs,
            self.values,
            arr,
            self.shape[0],
            self.slice_size,
        )
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        return restore_1d(
            spmv_ops.advanced(self.apply(arr), alpha, beta, xa), was_1d
        )

    def compute_absolute(self):
        return self.replace(values=jnp.abs(self.values))

    def scale(self, alpha):
        return self.replace(values=self.values * jnp.asarray(alpha).reshape(()))

    def extract_diagonal(self):
        return self.to_csr().extract_diagonal()

    def to_matrix_data(self) -> MatrixData:
        ss = to_host(self.slice_sets)
        cols = to_host(self.col_idxs)
        vals = to_host(self.values)
        C = self.slice_size
        rows_l, cols_l, vals_l = [], [], []
        for s in range(self.num_slices):
            blk_v = vals[ss[s] : ss[s + 1]]  # (L_s, C)
            blk_c = cols[ss[s] : ss[s + 1]]
            L = blk_v.shape[0]
            rr = np.tile(np.arange(C) + s * C, (L, 1))
            keep = blk_v != 0
            rows_l.append(rr[keep])
            cols_l.append(blk_c[keep])
            vals_l.append(blk_v[keep])
        if rows_l:
            rows = np.concatenate(rows_l)
            colsx = np.concatenate(cols_l)
            valsx = np.concatenate(vals_l)
        else:
            rows = colsx = np.zeros(0, np.int64)
            valsx = np.zeros(0, vals.dtype)
        ok = rows < self.shape[0]
        return MatrixData.from_coo(
            self.shape, rows[ok], colsx[ok], valsx[ok]
        ).sort_row_major()

    write = to_matrix_data

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data(), strategy=strategy)

    def astype(self, dtype):
        return self.replace(values=self.values.astype(dtype))

    def to_dense(self):
        return self.to_csr().to_dense()

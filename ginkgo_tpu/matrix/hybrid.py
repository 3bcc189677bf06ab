"""Hybrid (ELL + COO tail) format.

Reference: include/ginkgo/core/matrix/hybrid.hpp (819) — partition strategies
`column_limit` (:206), `imbalance_limit` (:241, default 80th percentile),
`automatic`; rows up to the ELL width go to ELL, the remainder spills into a
COO tail."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from .ell import Ell
from .coo import Coo


def _ell_limit(row_lengths: np.ndarray, strategy: str, arg) -> int:
    if strategy == "column_limit":
        return int(arg)
    if strategy == "imbalance_limit":
        percent = arg if arg is not None else 0.8  # hybrid.hpp default
        if len(row_lengths) == 0:
            return 0
        return int(np.quantile(row_lengths, percent))
    if strategy == "automatic":
        # reference automatic = imbalance with bounded extra storage
        if len(row_lengths) == 0:
            return 0
        return int(np.quantile(row_lengths, 0.8))
    raise ValueError(strategy)


@linop_dataclass
class Hybrid(LinOp):
    ell: Ell
    coo: Coo
    shape: tuple = static_field(default=(0, 0))

    @staticmethod
    def from_matrix_data(
        data: MatrixData, strategy: str = "automatic", strategy_arg=None
    ) -> "Hybrid":
        from .csr import Csr

        return Hybrid.from_csr(Csr.from_matrix_data(data), strategy, strategy_arg)

    read = from_matrix_data

    @staticmethod
    def from_csr(csr, strategy: str = "automatic", strategy_arg=None) -> "Hybrid":
        rl = csr.host_row_lengths()
        limit = max(_ell_limit(rl, strategy, strategy_arg), 0)
        n = csr.shape[0]
        rp = np.asarray(csr.row_ptrs)
        ci = np.asarray(csr.col_idxs)
        vv = np.asarray(csr.values)
        K = max(limit, 1)
        ell_cols = np.zeros((n, K), np.int32)
        ell_vals = np.zeros((n, K), vv.dtype)
        coo_r, coo_c, coo_v = [], [], []
        for k in range(K):
            sel = rl > k
            idx = rp[:-1][sel] + k
            ell_cols[sel, k] = ci[idx]
            ell_vals[sel, k] = vv[idx]
        over = np.nonzero(rl > K)[0]
        for r in over:
            s, e = rp[r] + K, rp[r + 1]
            coo_r.append(np.full(e - s, r))
            coo_c.append(ci[s:e])
            coo_v.append(vv[s:e])
        if coo_r:
            rows = np.concatenate(coo_r)
            cols = np.concatenate(coo_c)
            vals = np.concatenate(coo_v)
        else:
            rows = cols = np.zeros(0, np.int64)
            vals = np.zeros(0, vv.dtype)
        coo = Coo(
            rows=jnp.asarray(rows, jnp.int32),
            cols=jnp.asarray(cols, jnp.int32),
            values=jnp.asarray(vals),
            shape=csr.shape,
        )
        ell = Ell(
            col_idxs=jnp.asarray(ell_cols),
            values=jnp.asarray(ell_vals),
            shape=csr.shape,
        )
        return Hybrid(ell=ell, coo=coo, shape=csr.shape)

    @property
    def dtype(self):
        return self.ell.dtype

    @property
    def nnz(self):
        return self.ell.nnz + self.coo.nnz

    def apply(self, b):
        from ..ops import spmv as spmv_ops

        arr, was_1d = as_2d(b)
        y = spmv_ops.try_streaming(self, arr)  # one plan for ell+coo parts
        if y is None:
            y = as_2d(self.ell.apply(arr))[0]
            if self.coo.nnz > 0:
                y = as_2d(self.coo.apply2(arr, y))[0]
        return restore_1d(y, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        a = jnp.asarray(alpha).reshape(())
        bt = jnp.asarray(beta).reshape(())
        return restore_1d(a * as_2d(self.apply(arr))[0] + bt * xa, was_1d)

    def compute_absolute(self):
        return Hybrid(
            ell=self.ell.compute_absolute(),
            coo=self.coo.compute_absolute(),
            shape=self.shape,
        )

    def extract_diagonal(self):
        return self.to_csr().extract_diagonal()

    def to_matrix_data(self) -> MatrixData:
        de = self.ell.to_matrix_data()
        dc = self.coo.to_matrix_data()
        return MatrixData.from_coo(
            self.shape,
            np.concatenate([de.rows, dc.rows]),
            np.concatenate([de.cols, dc.cols]),
            np.concatenate([de.values, dc.values]),
        ).sort_row_major()

    write = to_matrix_data

    def astype(self, dtype):
        return self.replace(ell=self.ell.astype(dtype), coo=self.coo.astype(dtype))

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data(), strategy=strategy)

    def to_dense(self):
        return self.to_csr().to_dense()

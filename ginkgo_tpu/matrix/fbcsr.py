"""FBCSR — fixed-size block CSR (BSR).

Reference: include/ginkgo/core/matrix/fbcsr.hpp (466) — dense bs x bs blocks
on a block-CSR skeleton.  TPU design: blocks are a (num_blocks, bs, bs)
batch; SpMV gathers the needed x blocks (block-row granular take) and runs
one batched matmul on the MXU, then a sorted segment-sum over block rows —
the dense-block structure is exactly what the MXU wants, making FBCSR the
preferred general format when the matrix has natural block structure."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData


@linop_dataclass
class Fbcsr(LinOp):
    block_row_ptrs: jnp.ndarray  # (nbr+1,)
    block_cols: jnp.ndarray  # (nb,)
    blocks: jnp.ndarray  # (nb, bs, bs)
    shape: tuple = static_field(default=(0, 0))
    block_size: int = static_field(default=1)

    @staticmethod
    def from_matrix_data(data: MatrixData, block_size: int) -> "Fbcsr":
        d = data.sum_duplicates()
        bs = int(block_size)
        n, m = d.shape
        nbr = -(-n // bs)
        nbc = -(-m // bs)
        br = d.rows // bs
        bc = d.cols // bs
        key = br * nbc + bc
        uniq, inv = np.unique(key, return_inverse=True)
        nb = len(uniq)
        blocks = np.zeros((max(nb, 1), bs, bs), d.values.dtype)
        blocks[inv, d.rows % bs, d.cols % bs] = d.values
        ubr = uniq // nbc
        ubc = uniq % nbc
        rp = np.zeros(nbr + 1, np.int64)
        np.add.at(rp, ubr + 1, 1)
        rp = np.cumsum(rp)
        return Fbcsr(
            block_row_ptrs=jnp.asarray(rp, jnp.int32),
            block_cols=jnp.asarray(ubc if nb else np.zeros(1), jnp.int32),
            blocks=jnp.asarray(blocks),
            shape=(n, m),
            block_size=bs,
        )

    read = from_matrix_data

    @staticmethod
    def from_csr(csr, block_size: int) -> "Fbcsr":
        return Fbcsr.from_matrix_data(csr.to_matrix_data(), block_size)

    @property
    def dtype(self):
        return self.blocks.dtype

    @property
    def num_blocks(self):
        return self.blocks.shape[0]

    @property
    def nnz(self):
        return self.blocks.size

    def apply(self, b):
        from ..ops import spmv as spmv_ops
        from ..ops.spmv import row_ids_from_ptrs

        arr, was_1d = as_2d(b)
        out = spmv_ops.try_streaming(self, arr)
        if out is not None:
            return restore_1d(out, was_1d)
        bs = self.block_size
        n, m = self.shape
        k = arr.shape[1]
        nbr = self.block_row_ptrs.shape[0] - 1
        nb = self.num_blocks
        # pad x to whole blocks, view as (nbc, bs, k)
        pad = nbr * 0  # keep lint happy
        mpad = -(-m // bs) * bs
        xp = jnp.concatenate(
            [arr, jnp.zeros((mpad - m, k), arr.dtype)], axis=0
        ) if mpad > m else arr
        xblk = xp.reshape(-1, bs, k)
        gathered = jnp.take(xblk, self.block_cols, axis=0)  # (nb, bs, k)
        prod = jnp.einsum(
            "nij,njk->nik",
            self.blocks,
            gathered,
            precision=jax.lax.Precision.HIGHEST,
        )  # (nb, bs, k)
        brids = row_ids_from_ptrs(self.block_row_ptrs, nb)
        ysum = jax.ops.segment_sum(
            prod, brids, num_segments=nbr, indices_are_sorted=True
        )  # (nbr, bs, k)
        y = ysum.reshape(nbr * bs, k)[:n]
        return restore_1d(y, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        a = jnp.asarray(alpha).reshape(())
        bt = jnp.asarray(beta).reshape(())
        return restore_1d(a * as_2d(self.apply(arr))[0] + bt * xa, was_1d)

    def compute_absolute(self):
        return self.replace(blocks=jnp.abs(self.blocks))

    def extract_diagonal(self):
        return self.to_csr().extract_diagonal()

    def transpose(self) -> "Fbcsr":
        return Fbcsr.from_matrix_data(
            self.to_matrix_data().transpose(), self.block_size
        )

    def to_matrix_data(self) -> MatrixData:
        from ..ops.spmv import row_ids_from_ptrs

        bs = self.block_size
        nb = self.num_blocks
        brids = np.asarray(row_ids_from_ptrs(self.block_row_ptrs, nb))
        bcols = to_host(self.block_cols)
        blocks = to_host(self.blocks)
        li, lj = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
        rows = (brids[:, None, None] * bs + li[None]).ravel()
        cols = (bcols[:, None, None] * bs + lj[None]).ravel()
        vals = blocks.ravel()
        keep = (vals != 0) & (rows < self.shape[0]) & (cols < self.shape[1])
        return MatrixData.from_coo(
            self.shape, rows[keep], cols[keep], vals[keep]
        ).sort_row_major()

    write = to_matrix_data

    def astype(self, dtype):
        return self.replace(blocks=self.blocks.astype(dtype))

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data(), strategy=strategy)

    def to_dense(self):
        return self.to_csr().to_dense()

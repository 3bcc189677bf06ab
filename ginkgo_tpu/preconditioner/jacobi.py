"""(Block-)Jacobi preconditioner with adaptive-precision storage.

Reference: core/preconditioner/jacobi.cpp (:303-311 generate driver),
include/ginkgo/core/preconditioner/jacobi.hpp — `max_block_size` (:338,
default 32), supervariable-agglomeration block detection (find_blocks
kernels), explicit batched block inversion, per-block adaptive-precision
storage via `storage_optimization`/`precision_reduction` (:401-494), scalar
fast path for block size 1 (:203).

TPU design: block detection is host-side setup (numpy over row patterns);
blocks are padded to one static `max_block_size` and stored as a
(num_blocks, bs, bs) tensor — batched inversion and the apply's batched
matmul both run on the MXU.  Variable block sizes are handled by padding the
trailing diagonal with 1s (identity-extending the block), which keeps the
batch fully dense — the pad-to-bucket policy SURVEY §7 calls for.
Adaptive storage keeps the *inverted* blocks in a reduced dtype with a
per-block max-abs scale (bf16/int8 storage, f32 arithmetic) — the accessor
decoupling of §2.12.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.types import precision_reduction


def find_natural_blocks(csr, max_block_size: int) -> np.ndarray:
    """Supervariable agglomeration (jacobi find_blocks kernel analog):
    group consecutive rows with matching sparsity pattern, then agglomerate
    adjacent groups up to max_block_size.  Returns block_pointers (nb+1,).

    Vectorized setup (no per-row Python): pattern equality of adjacent rows
    is one shifted compare over the flat col_idxs + a segment reduction;
    the greedy agglomeration jumps natural-block bounds with searchsorted
    (one step per OUTPUT block, not per row)."""
    rp = np.asarray(csr.row_ptrs).astype(np.int64)
    ci = np.asarray(csr.col_idxs)
    n = csr.shape[0]
    if n <= 1:
        return np.asarray([0, n], dtype=np.int64)
    L = np.diff(rp)  # row lengths
    # adjacent-row pattern equality: element j of row r sits at rp[r]+j,
    # of row r-1 at rp[r]+j-L[r-1]; valid only when L[r-1] == L[r]
    same_len = np.concatenate([[False], L[1:] == L[:-1]])
    nnz = len(ci)
    if nnz:
        rows_of = np.repeat(np.arange(n, dtype=np.int64), L)
        prev_len = np.concatenate([[0], L[:-1]])[rows_of]
        g = np.arange(nnz, dtype=np.int64)
        src = g - prev_len
        valid = (rows_of > 0) & (src >= 0)
        eq = np.zeros(nnz, dtype=np.int64)
        eq[valid] = (ci[g[valid]] == ci[src[valid]]).astype(np.int64)
        eq_per_row = np.zeros(n, dtype=np.int64)
        np.add.at(eq_per_row, rows_of, eq)
        all_eq = eq_per_row == L
    else:
        all_eq = np.ones(n, dtype=bool)
    same = same_len & all_eq  # same[r]: row r matches row r-1
    # natural starts: r == 0, pattern break, or max_block_size rows into a run
    brk = ~same
    brk[0] = True
    run_id = np.cumsum(brk) - 1
    idx = np.arange(n, dtype=np.int64)
    run_start = idx[brk][run_id]
    nat_start_mask = brk | ((idx - run_start) % max_block_size == 0)
    bounds = np.concatenate([idx[nat_start_mask], [n]])
    # greedy agglomeration: from a, jump to the largest bound <= a + mbs
    agg = [0]
    a = 0
    while a < n:
        j = np.searchsorted(bounds, a + max_block_size, side="right") - 1
        b = bounds[j]
        if b <= a:  # single natural block longer than mbs cannot happen
            b = bounds[min(j + 1, len(bounds) - 1)]  # (guard) advance anyway
        agg.append(int(b))
        a = int(b)
    return np.asarray(agg, dtype=np.int64)


@linop_dataclass
class Jacobi(LinOp):
    inv_diag: Any  # scalar path: (n,) inverted diagonal, else None
    inv_blocks: Any  # block path: (nb, bs, bs) in storage dtype, else None
    block_scales: Any  # (nb,) dequant scales (1.0 when storage preserves)
    row_block: Any  # (n,) block id of each row
    row_local: Any  # (n,) local index within block
    block_starts: Any  # (nb,) first row of each block
    n: int = static_field(default=0)
    max_block_size: int = static_field(default=1)

    # -- factory --------------------------------------------------------------

    @staticmethod
    def build(
        max_block_size: int = 1,
        block_pointers=None,
        storage_optimization: precision_reduction | None = None,
        skip_sorting: bool = True,
    ):
        return JacobiFactory(
            max_block_size=max_block_size,
            block_pointers=block_pointers,
            storage_optimization=storage_optimization,
        )

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return (
            self.inv_diag.dtype if self.inv_diag is not None else jnp.float32
        )

    @property
    def num_blocks(self):
        return self.block_starts.shape[0] if self.block_starts is not None else self.n

    def apply(self, b):
        arr, was_1d = as_2d(b)
        if self.inv_diag is not None:  # scalar fast path (jacobi.hpp:203)
            out = self.inv_diag[:, None] * arr
            return restore_1d(out, was_1d)
        bs = self.max_block_size
        k = arr.shape[1]
        # gather rhs rows into (nb, bs, k); pad rows read a zero row
        pad = jnp.zeros((1, k), dtype=arr.dtype)
        arr_pad = jnp.concatenate([arr, pad], axis=0)
        nb = self.block_starts.shape[0]
        idx = self.block_starts[:, None] + jnp.arange(bs)[None, :]  # (nb, bs)
        idx = jnp.where(idx < self.n, idx, self.n)
        r_blk = arr_pad[idx]  # (nb, bs, k)
        inv = self.inv_blocks.astype(arr.dtype) * self.block_scales[:, None, None]
        y_blk = jnp.einsum(
            "nij,njk->nik", inv, r_blk, precision=jax.lax.Precision.HIGHEST
        )
        # scatter-free: each row reads its (block, local) slot
        out = y_blk[self.row_block, self.row_local]  # (n, k)
        return restore_1d(out, was_1d)

    def to_matrix_data(self):
        """WritableToMatrixData (reference jacobi convert_to_dense kernel +
        write, jacobi.cpp:61-74): exports the explicit (block-)diagonal
        inverse WITHOUT densifying the n x n operator."""
        from ..base.matrix_data import MatrixData
        import numpy as np

        if self.inv_diag is not None:  # scalar path: n diagonal entries
            d = np.asarray(self.inv_diag)
            idx = np.arange(self.n)
            return MatrixData.from_coo((self.n, self.n), idx, idx, d)
        # block path: emit only the O(n * bs) block entries
        bs = self.max_block_size
        work = np.promote_types(np.asarray(self.inv_blocks).dtype, np.float32)
        inv = np.asarray(self.inv_blocks).astype(work) * np.asarray(
            self.block_scales
        )[:, None, None].astype(work)
        starts = np.asarray(self.block_starts)
        ends = np.concatenate([starts[1:], [self.n]])
        sizes = ends - starts
        nb = len(starts)
        bi, li, lj = np.meshgrid(
            np.arange(nb), np.arange(bs), np.arange(bs), indexing="ij"
        )
        ok = (li < sizes[bi]) & (lj < sizes[bi])
        rows = (starts[bi] + li)[ok]
        cols = (starts[bi] + lj)[ok]
        vals = inv[bi, li, lj][ok]
        return MatrixData.from_coo(
            (self.n, self.n), rows, cols, vals
        ).sort_row_major()

    write = to_matrix_data

    def transpose(self) -> "Jacobi":
        if self.inv_diag is not None:
            return self
        return self.replace(inv_blocks=jnp.swapaxes(self.inv_blocks, 1, 2))

    conj_transpose = transpose  # real-valued blocks transpose; complex: conj

    def to_dense(self):
        from ..matrix.dense import Dense

        if self.inv_diag is not None:
            return Dense(values=jnp.diag(self.inv_diag))
        work = jnp.promote_types(self.inv_blocks.dtype, jnp.float32)
        inv = self.inv_blocks.astype(work) * self.block_scales[:, None, None].astype(
            work
        )
        out = jnp.zeros((self.n, self.n), dtype=inv.dtype)
        bs = self.max_block_size
        ends = jnp.concatenate(
            [self.block_starts[1:], jnp.asarray([self.n], self.block_starts.dtype)]
        )
        sizes = ends - self.block_starts  # true (unpadded) block sizes
        idx = self.block_starts[:, None] + jnp.arange(bs)[None, :]
        ok = jnp.arange(bs)[None, :] < sizes[:, None]
        idx_c = jnp.where(ok, idx, 0)
        mask = ok[:, :, None] & ok[:, None, :]
        out = out.at[idx_c[:, :, None], idx_c[:, None, :]].add(
            jnp.where(mask, inv, 0)
        )
        return Dense(values=out)


class JacobiFactory:
    """jacobi.hpp factory analog; generate() runs block detection (host) and
    batched inversion (device)."""

    def __init__(
        self,
        max_block_size: int = 1,
        block_pointers=None,
        storage_optimization: precision_reduction | None = None,
    ):
        self.max_block_size = int(max_block_size)
        self.block_pointers = block_pointers
        self.storage_optimization = storage_optimization

    def generate(self, A) -> Jacobi:
        if not hasattr(A, "extract_diagonal"):
            # duck-typed operators that only provide to_csr (mg fine ops)
            A = A.to_csr()
        n = A.shape[0]
        if self.max_block_size == 1:
            diag = A.extract_diagonal().values
            inv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1), 1.0)
            return Jacobi(
                inv_diag=inv,
                inv_blocks=None,
                block_scales=None,
                row_block=None,
                row_local=None,
                block_starts=None,
                n=n,
                max_block_size=1,
            )

        csr = A.to_csr() if hasattr(A, "to_csr") else A
        if self.block_pointers is not None:
            ptrs = np.asarray(self.block_pointers, dtype=np.int64)
        else:
            ptrs = find_natural_blocks(csr, self.max_block_size)
        bs = self.max_block_size
        nb = len(ptrs) - 1
        starts = ptrs[:-1]
        sizes = ptrs[1:] - ptrs[:-1]
        row_block = np.repeat(np.arange(nb), sizes)
        row_local = np.arange(n) - starts[row_block]

        # extract diagonal blocks from CSR on device: keep entries whose row
        # and col fall in the same block
        rids = csr.row_ids()
        rb = jnp.asarray(row_block, jnp.int32)
        rl = jnp.asarray(row_local, jnp.int32)
        st = jnp.asarray(starts, jnp.int32)
        sz = jnp.asarray(sizes, jnp.int32)
        e_blk = rb[rids]
        e_lr = rl[rids]
        e_lc = csr.col_idxs - st[e_blk]
        ok = (e_lc >= 0) & (e_lc < sz[e_blk])
        blocks = jnp.zeros((nb, bs, bs), dtype=csr.values.dtype)
        blocks = blocks.at[
            jnp.where(ok, e_blk, 0),
            jnp.where(ok, e_lr, 0),
            jnp.where(ok, e_lc, 0),
        ].add(jnp.where(ok, csr.values, 0))
        # identity-extend the padding so inversion is well-posed
        lidx = jnp.arange(bs)
        pad_mask = lidx[None, :] >= sz[:, None]  # (nb, bs)
        eye_pad = jnp.where(
            pad_mask[:, :, None] & (lidx[None, None, :] == lidx[None, :, None]),
            1.0,
            0.0,
        ).astype(blocks.dtype)
        blocks = blocks + eye_pad
        inv = jnp.linalg.inv(blocks)  # batched on MXU

        if self.storage_optimization is None:
            storage = inv
            scales = jnp.ones((nb,), dtype=jnp.float32)
        else:
            sd = jnp.dtype(self.storage_optimization.storage_dtype(csr.values.dtype))
            if sd == jnp.int8:
                amax = jnp.max(jnp.abs(inv), axis=(1, 2))
                scales = jnp.where(amax > 0, amax / 127.0, 1.0)
                storage = jnp.clip(
                    jnp.round(inv / scales[:, None, None]), -127, 127
                ).astype(jnp.int8)
            else:
                storage = inv.astype(sd)
                scales = jnp.ones((nb,), dtype=jnp.float32)

        return Jacobi(
            inv_diag=None,
            inv_blocks=storage,
            block_scales=scales.astype(jnp.float32),
            row_block=rb,
            row_local=rl,
            block_starts=st,
            n=n,
            max_block_size=bs,
        )

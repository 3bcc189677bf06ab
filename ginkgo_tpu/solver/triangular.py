"""Sparse triangular solvers (LowerTrs / UpperTrs).

Reference: core/solver/lower_trs.cpp / upper_trs.cpp (269 each),
`trisolve_algorithm {sparselib, syncfree}` (solver/triangular.hpp:67-132).
The CUDA sync-free kernel spins on per-row ready flags — meaningless on TPU.
TPU-native algorithms (SURVEY §7 stage 5):

- 'block_scan' (exact, default): at generate time, pack the factor into
  block-bidiagonal form: dense diagonal blocks (inverted, batched on the MXU)
  plus the strictly-off-diagonal part as CSR.  Solve runs a `lax.scan` over
  block columns: x_b = invD_b @ (rhs_b - offdiag_b @ x_prev).  The sequential
  depth drops from n to n/B; each step is MXU work.
- 'sweeps' (approximate/iterative): Jacobi-Richardson iteration
  x^{m+1} = D^{-1}(b - (T - D) x^m), exact after `level count` sweeps —
  the TPU analog of the iterative triangular solves used on GPUs when
  syncfree is too serial.  `sweeps=None` uses the exact level count computed
  at generate time.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..matrix.csr import Csr


def _level_count(sp, lower: bool) -> int:
    """Longest dependency chain (number of level-scheduling levels)."""
    n = sp.shape[0]
    indptr, indices = sp.indptr, sp.indices
    level = np.zeros(n, np.int64)
    rng = range(n) if lower else range(n - 1, -1, -1)
    for i in rng:
        deps = indices[indptr[i] : indptr[i + 1]]
        deps = deps[deps < i] if lower else deps[deps > i]
        if len(deps):
            level[i] = level[deps].max() + 1
    return int(level.max()) + 1


@linop_dataclass
class TriangularSolver(LinOp):
    inv_diag_blocks: Any  # (nb, B, B) inverted diagonal blocks
    off_csr: Any  # strictly block-off-diagonal part as Csr (padded shape)
    diag: Any  # (n,) diagonal (sweeps algorithm)
    #: block_scan per-block panels: entries of block row bi, padded to the
    #: max per-block count W — step bi touches ONLY its own entries
    #: (O(nnz) total instead of one full SpMV per block)
    off_cols: Any = None  # (nb, W) int32 column of each entry
    off_vals: Any = None  # (nb, W) values (0 padding)
    off_lrow: Any = None  # (nb, W) local row within the block
    n: int = static_field(default=0)
    block: int = static_field(default=64)
    lower: bool = static_field(default=True)
    unit_diag: bool = static_field(default=False)
    algorithm: str = static_field(default="block_scan")
    sweeps: int = static_field(default=0)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.diag.dtype

    def apply(self, b):
        arr, was_1d = as_2d(b)
        if self.algorithm == "sweeps":
            out = self._solve_sweeps(arr)
        else:
            out = self._solve_block_scan(arr)
        return restore_1d(out, was_1d)

    solve = apply

    def _solve_sweeps(self, arr):
        out = self._try_fused_sweeps(arr)
        if out is not None:
            return out
        T = self.off_csr  # here: full strict triangle (built accordingly)
        d = self.diag[:, None]

        def body(_, x):
            return (arr - T.apply(x)) / d

        x0 = arr / d
        return jax.lax.fori_loop(0, self.sweeps, body, x0)

    def _try_fused_sweeps(self, arr):
        """Whole-solve fused sweeps (ops/pallas_trs.py): all
        Jacobi-Richardson sweeps in one kernel with the iterate
        VMEM-resident, when the strict triangle is a Dia and the state
        fits.  Gate consults only env flags already in
        solver_base._env_trace_key.  Returns the solution or None."""
        import os

        from ..matrix.dia import Dia

        if self.algorithm != "sweeps" or not isinstance(self.off_csr, Dia):
            return None
        if arr.dtype != jnp.float32 or self.sweeps < 1:
            return None
        if os.environ.get("GINKGO_TPU_NO_PALLAS"):
            return None
        force = bool(os.environ.get("GINKGO_TPU_FORCE_VMEM_CG"))
        on_tpu = jax.default_backend() == "tpu"
        if os.environ.get("GINKGO_TPU_NO_FUSED_CG") and not force:
            return None
        if not (force or on_tpu):
            return None
        T = self.off_csr
        nd, R, _ = T.diags.shape
        if nd == 0 or T.diags.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        from ..ops.pallas_dia import _plan
        from ..ops.pallas_trs import trs_vmem_fits, trs_vmem_solve
        from ._fused_gate import frame

        _, _, _, p_lo, p_hi = _plan(T.offsets, R)
        if not trs_vmem_fits(nd, R, T.diags.dtype.itemsize,
                             halo_rows=p_lo + p_hi):
            return None
        invd2 = frame((1.0 / self.diag)[:, None].astype(jnp.float32), R)
        cols = []
        for j in range(arr.shape[1]):
            x2 = trs_vmem_solve(
                T, invd2, frame(arr[:, j:j + 1].astype(jnp.float32), R),
                sweeps=self.sweeps, interpret=not on_tpu,
            )
            cols.append(x2.reshape(-1)[: self.n])
        return jnp.stack(cols, axis=1).astype(arr.dtype)

    def _solve_block_scan(self, arr):
        B = self.block
        nb = self.inv_diag_blocks.shape[0]
        k = arr.shape[1]
        npad = nb * B
        rhs = jnp.concatenate(
            [arr, jnp.zeros((npad - self.n, k), arr.dtype)], axis=0
        ) if npad > self.n else arr
        # running solution vector, updated block by block; each step
        # gathers only block bi's off-diagonal entries (per-block panels)
        def step(x_acc, bi):
            cols = self.off_cols[bi]  # (W,)
            vals = self.off_vals[bi].astype(x_acc.dtype)  # (W,)
            lrow = self.off_lrow[bi]  # (W,)
            xg = jnp.take(x_acc, cols, axis=0)  # (W, k)
            seg = jax.ops.segment_sum(
                vals[:, None] * xg, lrow, num_segments=B
            )  # (B, k)
            rb = jax.lax.dynamic_slice(rhs, (bi * B, 0), (B, k))
            xb = self.inv_diag_blocks[bi].astype(x_acc.dtype) @ (rb - seg).astype(
                x_acc.dtype
            )
            x_acc = jax.lax.dynamic_update_slice(x_acc, xb, (bi * B, 0))
            return x_acc, None

        order = (
            jnp.arange(nb) if self.lower else jnp.arange(nb - 1, -1, -1)
        )
        x0 = jnp.zeros((npad, k), arr.dtype)
        x, _ = jax.lax.scan(step, x0, order)
        return x[: self.n]


def _build(csr_mat, lower: bool, unit_diag: bool, algorithm: str, block: int, sweeps):
    sp = csr_mat.to_scipy().tocsr()
    sp.sort_indices()
    n = sp.shape[0]
    dense_diag = sp.diagonal().copy()
    if unit_diag:
        dense_diag = np.ones(n, dense_diag.dtype)
    dense_diag[dense_diag == 0] = 1

    if algorithm == "sweeps":
        import scipy.sparse as sps

        strict = (sps.tril(sp, -1) if lower else sps.triu(sp, 1)).tocoo()
        # fastest suitable format for the strict triangle: ILU/IC factors of
        # banded operators are banded, so the per-sweep SpMV streams via Dia
        # instead of gathering through CSR (~7 ns/element on TPU)
        from ..base.matrix_data import MatrixData
        from ..matrix.auto import choose_format

        T = choose_format(
            MatrixData.from_coo(
                strict.shape, strict.row, strict.col, strict.data
            ).sort_row_major()
        )
        nsweeps = sweeps if sweeps is not None else _level_count(sp, lower)
        return TriangularSolver(
            inv_diag_blocks=jnp.zeros((1, 1, 1), sp.data.dtype),
            off_csr=T,
            diag=jnp.asarray(dense_diag),
            n=n,
            block=block,
            lower=lower,
            unit_diag=unit_diag,
            algorithm="sweeps",
            sweeps=int(nsweeps),
        )

    # block_scan: invert dense diagonal blocks, keep the rest sparse
    B = int(block)
    nb = -(-n // B)
    npad = nb * B
    blocks = np.zeros((nb, B, B), sp.data.dtype)
    rows = np.repeat(np.arange(n), np.diff(sp.indptr))
    cols = sp.indices
    vals = sp.data.copy()
    if unit_diag:
        on_d = rows == cols
        vals = vals.copy()
        vals[on_d] = 1.0
        missing = np.setdiff1d(np.arange(n), rows[on_d])
        rows = np.concatenate([rows, missing])
        cols = np.concatenate([cols, missing])
        vals = np.concatenate([vals, np.ones(len(missing), vals.dtype)])
    in_blk = rows // B == cols // B
    br, lr, lc = rows[in_blk] // B, rows[in_blk] % B, cols[in_blk] % B
    blocks[br, lr, lc] = vals[in_blk]
    # identity-extend padding rows
    for bi in range(nb):
        for l in range(B):
            g = bi * B + l
            if g >= n or blocks[bi, l, l] == 0:
                blocks[bi, l, l] = 1.0
    inv_blocks = jnp.asarray(np.linalg.inv(blocks))
    # off-block part as per-block padded panels
    orows, ocols, ovals = rows[~in_blk], cols[~in_blk], vals[~in_blk]
    blk_of = orows // B
    counts = np.bincount(blk_of, minlength=nb)
    W = max(int(counts.max()) if len(counts) else 0, 1)
    off_cols = np.zeros((nb, W), np.int32)
    off_vals = np.zeros((nb, W), vals.dtype)
    off_lrow = np.zeros((nb, W), np.int32)
    order = np.argsort(blk_of, kind="stable")
    slot = (np.arange(len(orows)) - np.concatenate([[0], np.cumsum(counts)])[
        blk_of[order]
    ])
    off_cols[blk_of[order], slot] = ocols[order]
    off_vals[blk_of[order], slot] = ovals[order]
    off_lrow[blk_of[order], slot] = (orows[order] % B)
    return TriangularSolver(
        inv_diag_blocks=inv_blocks,
        off_csr=None,
        off_cols=jnp.asarray(off_cols),
        off_vals=jnp.asarray(off_vals),
        off_lrow=jnp.asarray(off_lrow),
        diag=jnp.asarray(dense_diag),
        n=n,
        block=B,
        lower=lower,
        unit_diag=unit_diag,
        algorithm="block_scan",
        sweeps=0,
    )


class LowerTrsFactory:
    def __init__(self, algorithm="block_scan", block=64, sweeps=None, unit_diagonal=False):
        self.algorithm = algorithm
        self.block = block
        self.sweeps = sweeps
        self.unit_diagonal = unit_diagonal

    def generate(self, L) -> TriangularSolver:
        csr = L.to_csr() if hasattr(L, "to_csr") else L
        return _build(
            csr, True, self.unit_diagonal, self.algorithm, self.block, self.sweeps
        )


class UpperTrsFactory:
    def __init__(self, algorithm="block_scan", block=64, sweeps=None, unit_diagonal=False):
        self.algorithm = algorithm
        self.block = block
        self.sweeps = sweeps
        self.unit_diagonal = unit_diagonal

    def generate(self, U) -> TriangularSolver:
        csr = U.to_csr() if hasattr(U, "to_csr") else U
        return _build(
            csr, False, self.unit_diagonal, self.algorithm, self.block, self.sweeps
        )


class LowerTrs:
    @staticmethod
    def build(**kw):
        return LowerTrsFactory(**kw)


class UpperTrs:
    @staticmethod
    def build(**kw):
        return UpperTrsFactory(**kw)

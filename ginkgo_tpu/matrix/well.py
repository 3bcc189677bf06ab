"""Well — windowed gather-ELL, the TPU-native locality-free format.

The jit-compatible format wrapper around the WELL plan of
ops/spmv_well.py (see its module docstring for the layout and the
chained-gather fetch).  Fills the reference's load_balance CSR role for
patterns with NO column locality (power-law graphs, circuit matrices):
cuda/matrix/csr_kernels.cu:276-310, hybrid.hpp:206-241.  Sibling of
Pell (matrix/pell.py), which wins when column locality exists.

A Well is a frozen pytree (all storage jax arrays, geometry static), so
solvers can hold one as their operator inside a single jitted solve.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from ..ops import spmv as spmv_ops


@linop_dataclass
class Well(LinOp):
    values: jnp.ndarray  # (slots, 8, 128) zero-padded window cells
    qidx: jnp.ndarray  # (slots, 8, 128) int8 column residue per cell
    rt: jnp.ndarray  # (slots, 8, 128) int8 window-row routed by residue
    bases: jnp.ndarray  # (slots,) int32 aligned window base panel
    tile_of_step: jnp.ndarray  # (n_steps,) int32 output block per grid step
    tsb: jnp.ndarray = None  # (slots, 8, 128) int8 sub-tile id (T > 1 only)
    shape: tuple = static_field(default=(0, 0))
    n_steps: int = static_field(default=0)
    nnz: int = static_field(default=0)
    G: int = static_field(default=4)
    T: int = static_field(default=1)
    NT: int = static_field(default=0)
    NST: int = static_field(default=0)
    NP: int = static_field(default=0)
    NW: int = static_field(default=0)

    # -- construction ---------------------------------------------------------

    @staticmethod
    def from_csr(csr, G="auto", T="auto") -> "Well":
        from ..ops.spmv_well import WellPlan

        plan = WellPlan(
            np.asarray(csr.row_ptrs), np.asarray(csr.col_idxs),
            np.asarray(csr.values), csr.shape, G=G, T=T,
        )
        return Well._from_plan(plan)

    @staticmethod
    def _from_plan(plan) -> "Well":
        return Well(
            values=plan.values,
            qidx=plan.qidx,
            rt=plan.rt,
            bases=plan.bases,
            tile_of_step=plan.tile_of_step,
            tsb=plan.tsb,
            shape=tuple(plan.shape),
            n_steps=plan.n_steps,
            nnz=plan.nnz,
            G=plan.G,
            T=plan.T,
            NT=plan.NT,
            NST=plan.NST,
            NP=plan.NP,
            NW=plan.NW,
        )

    @staticmethod
    def from_matrix_data(data: MatrixData, G="auto", T="auto") -> "Well":
        from .csr import Csr

        return Well.from_csr(Csr.from_matrix_data(data), G=G, T=T)

    read = from_matrix_data

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def inflation(self) -> float:
        return self.values.size / max(self.nnz, 1)

    @property
    def num_stored_elements(self) -> int:
        return self.nnz

    # -- apply ----------------------------------------------------------------

    def apply(self, b):
        import os
        from ..ops.spmv_well import well_spmm, well_spmv

        arr, was_1d = as_2d(b)
        interpret = jax.default_backend() != "tpu" or bool(
            os.environ.get("GINKGO_TPU_NO_PALLAS")
        )
        if arr.shape[1] > 1:
            out = well_spmm(self, arr, interpret=interpret)
        else:
            out = well_spmv(self, arr[:, 0], interpret=interpret)[:, None]
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        out = spmv_ops.advanced(self.apply(arr), alpha, beta, xa)
        return restore_1d(out, was_1d)

    # -- structure ops --------------------------------------------------------

    def extract_diagonal(self):
        return self.to_csr().extract_diagonal()

    def scale(self, alpha) -> "Well":
        return self.replace(
            values=self.values * jnp.asarray(alpha).reshape(())
        )

    def compute_absolute(self) -> "Well":
        return self.replace(values=jnp.abs(self.values))

    def astype(self, dtype) -> "Well":
        return self.replace(values=self.values.astype(dtype))

    def reduce_storage(self, dtype=jnp.bfloat16) -> "Well":
        """bf16 cell values (q/rt are already int8): cuts the dominant
        HBM stream of the kernel; accumulation stays f32 in-register."""
        return self.replace(values=self.values.astype(dtype))

    def transpose(self):
        return Well.from_csr(self.to_csr().transpose(), G=self.G)

    def conj_transpose(self):
        return Well.from_csr(self.to_csr().conj_transpose(), G=self.G)

    # -- conversions ----------------------------------------------------------

    def to_matrix_data(self) -> MatrixData:
        """Reconstruct COO entries from occupied cells through the same
        chained-gather composition the kernel evaluates.  Structural
        zeros stored in the source pattern are dropped (their cells are
        indistinguishable from padding)."""
        vals = np.asarray(self.values)
        q = np.asarray(self.qidx).astype(np.int64)
        rt = np.asarray(self.rt).astype(np.int64)
        bases = np.asarray(self.bases).astype(np.int64)
        tiles = np.asarray(self.tile_of_step)
        slots_per_blk = (
            np.bincount(tiles, minlength=self.NST) * self.G
            if len(tiles) else np.zeros(self.NST, np.int64)
        )
        slot_blk = np.repeat(np.arange(self.NST), slots_per_blk)
        sl, s, lane = np.nonzero(vals)
        sub = (
            np.asarray(self.tsb).astype(np.int64)[sl, s, lane]
            if self.T > 1 else 0
        )
        rows = (slot_blk[sl] * self.T + sub) * 1024 + s * 128 + lane
        qv = q[sl, s, lane]
        wr = rt[sl, s, qv]
        cols = (bases[sl] + wr) * 128 + qv
        order = np.lexsort((cols, rows))
        return MatrixData(
            self.shape, rows[order], cols[order], vals[sl, s, lane][order]
        )

    def to_csr(self):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data())

    def to_dense(self):
        return self.to_csr().to_dense()

    write = to_matrix_data

"""Pell — panel-gathered ELL, the TPU-native general-sparse format.

The jit-compatible format wrapper around the PELL plan of
ops/spmv_pallas.py (see its module docstring for the layout).  Fills the
reference's load_balance/merge_path role
(cuda/matrix/csr_kernels.cu:121-310): fast SpMV on arbitrary unstructured
sparsity — via in-register `dynamic_gather` from a VMEM-resident x rather
than per-element memory gathers, which the TPU does not have.

A Pell is a frozen pytree (all storage is jax arrays; the plan geometry is
static), so solvers can hold one as their operator and the whole solve
still compiles to a single XLA computation.  Build it eagerly
(`Pell.from_csr(A)` / `gko.choose_format`) — construction is a host-side
setup pass like every format conversion.

Defaults (round 4, measured on v5e — benchmark/results/
round2_tpu_r4.jsonl pell_v4_vs_v5): lane indices store as int8 (5 B/cell
vs 8; 17.9 vs 12.3 Gnnz/s on the 262k local-scatter row) and stay int8
in VMEM inside the fused whole-solve kernels (widened per-slot
in-register).  S stays 8 because the fused kernels implement the S=8
tile layout; the pure-streaming plan caches (ops/spmv_pallas._plan_for,
linop_streaming_spmv) pick S from {8,16,32} by the auto-S cost model —
pass S="auto" here too when the operator is only ever applied, not
solved.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from ..ops import spmv as spmv_ops


@linop_dataclass
class Pell(LinOp):
    values: jnp.ndarray  # (slots, S, 128) zero-padded window cells
    qidx: jnp.ndarray  # (slots, S, 128) int32/int8 packed col-within-window
    bases: jnp.ndarray  # (slots,) int32 padded-panel base per slot
    tile_of_step: jnp.ndarray  # (n_steps,) int32 output tile per grid step
    shape: tuple = static_field(default=(0, 0))
    n_steps: int = static_field(default=0)
    nnz: int = static_field(default=0)
    G: int = static_field(default=4)
    NT: int = static_field(default=0)
    NP: int = static_field(default=0)
    S: int = static_field(default=8)  # sublanes per slot tile (v5 knob)

    # -- construction ---------------------------------------------------------

    @staticmethod
    def from_csr(csr, G="auto", S: int = 8, q_dtype=np.int8) -> "Pell":
        from ..ops.spmv_pallas import PellPlan

        plan = PellPlan(
            np.asarray(csr.row_ptrs), np.asarray(csr.col_idxs),
            np.asarray(csr.values), csr.shape, G=G, S=S, q_dtype=q_dtype,
        )
        return Pell._from_plan(plan)

    @staticmethod
    def _from_plan(plan) -> "Pell":
        return Pell(
            values=plan.values,
            qidx=plan.qidx,
            bases=plan.bases,
            tile_of_step=plan.tile_of_step,
            shape=tuple(plan.shape),
            n_steps=plan.n_steps,
            nnz=plan.nnz,
            G=plan.G,
            NT=plan.NT,
            NP=plan.NP,
            S=getattr(plan, "S", 8),
        )

    @staticmethod
    def from_matrix_data(data: MatrixData, G="auto", S: int = 8,
                         q_dtype=np.int8) -> "Pell":
        from .csr import Csr

        return Pell.from_csr(Csr.from_matrix_data(data), G=G, S=S,
                             q_dtype=q_dtype)

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

    def _spmv_one(self, x):
        import os
        from ..ops.spmv_pallas import pell_spmv

        interpret = jax.default_backend() != "tpu" or bool(
            os.environ.get("GINKGO_TPU_NO_PALLAS")
        )
        return pell_spmv(self, x, interpret=interpret)

    def apply(self, b):
        import os
        from ..ops.spmv_pallas import pell_spmm

        arr, was_1d = as_2d(b)
        k = arr.shape[1]
        interpret = jax.default_backend() != "tpu" or bool(
            os.environ.get("GINKGO_TPU_NO_PALLAS")
        )
        if k > 1:
            # multi-RHS kernel: the matrix streams once for all k columns
            # (chunked at tile boundaries beyond the prefetch cap, column-
            # grouped beyond the VMEM budget — no silent per-column loop)
            out = pell_spmm(self, arr, interpret=interpret)
        else:
            out = self._spmv_one(arr[:, 0])[:, None]
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        out = spmv_ops.advanced(self.apply(arr), alpha, beta, xa)
        return restore_1d(out, was_1d)

    # -- structure ops --------------------------------------------------------

    def extract_diagonal(self):
        return self.to_csr().extract_diagonal()

    def scale(self, alpha) -> "Pell":
        return self.replace(
            values=self.values * jnp.asarray(alpha).reshape(())
        )

    def compute_absolute(self) -> "Pell":
        return self.replace(values=jnp.abs(self.values))

    def astype(self, dtype) -> "Pell":
        return self.replace(values=self.values.astype(dtype))

    def reduce_storage(self, dtype=jnp.bfloat16) -> "Pell":
        """bf16 slot values + int8 packed lane indices: halves BOTH
        streams of the kernel (value + index) while it accumulates in
        f32 regardless — mirrors Dia.reduce_storage."""
        return self.replace(
            values=self.values.astype(dtype),
            qidx=self.qidx.astype(jnp.int8),
        )

    def transpose(self):
        return Pell.from_csr(self.to_csr().transpose(), G=self.G, S=self.S,
                             q_dtype=np.dtype(str(self.qidx.dtype)))

    def conj_transpose(self):
        return Pell.from_csr(self.to_csr().conj_transpose(), G=self.G,
                             S=self.S, q_dtype=np.dtype(str(self.qidx.dtype)))

    # -- conversions ----------------------------------------------------------

    def to_matrix_data(self) -> MatrixData:
        """Reconstruct COO entries from occupied plan cells.

        Structural zeros stored in the source pattern are dropped (their
        plan cells are indistinguishable from padding) — acceptable for a
        streaming format whose apply treats them identically."""
        vals = np.asarray(self.values)
        q = np.asarray(self.qidx)
        bases = np.asarray(self.bases)
        tiles = np.asarray(self.tile_of_step)
        pad = self.S - 1
        slots_per_tile = np.bincount(tiles, minlength=tiles.max() + 1 if
                                     len(tiles) else 1) * self.G
        slot_tile = np.repeat(np.arange(len(slots_per_tile)), slots_per_tile)
        occ = vals != 0
        sl, s, lane = np.nonzero(occ)
        rows = slot_tile[sl] * (self.S * 128) + s * 128 + lane
        cols = (
            (bases[sl].astype(np.int64) - pad + s) * 128
            + q[sl, s, lane].astype(np.int64)
        )
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

"""Blocked-ELL (BELL): the TPU-native general-sparse SpMV format.

Reference role: Csr's load_balance/merge_path CUDA strategies
(cuda/matrix/csr_kernels.cu:121-310) exist to make *arbitrary* sparsity fast
on gather-capable hardware.  TPUs have no vector gather (~7 ns/element), so
the equivalent role is played by a panel decomposition (the Blocked-ELL
concept, cf. cuSPARSE blocked-ELL):

- rows are grouped into blocks of ``block_rows`` (sublane-aligned);
- columns are grouped into 128-wide panels (lane-aligned);
- each row block stores its nonzero panels DENSELY, ELL-padded to the max
  panel count K: values (NRB, K, block_rows, 128) + panel ids (NRB, K).

SpMV then reads x in whole 128-lane panels selected by panel id — a coarse
512-byte fetch instead of per-element gather — and contracts each panel on
the VPU/MXU.  Storage inflates by (panel area / nnz in panel), the classic
TPU trade: burn dense FLOPs/bytes to stay on the streaming path.  For
matrices with column locality (FEM, banded, RCM-reordered) inflation is
small; `storage_inflation()` reports it and `suitable_for_bell` gates the
automatic choice.

The Pallas kernel (ops/pallas_bell.py) pipelines panels with the grid;
this module's XLA path uses a coarse take() of x panels (still ~128x
better than element gather).

Measured on TPU v5e (32768^2 block-structured matrix, 7.55M nnz,
inflation 3.3x): 45 Gnnz/s vs 0.008 Gnnz/s for gather-based CSR on the
same matrix — a ~5500x speedup; ~73% of the dense-panel streaming
roofline.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData

LANES = 128


@linop_dataclass
class Bell(LinOp):
    values: jnp.ndarray  # (NRB, K, BR, 128) dense panels
    panel_ids: jnp.ndarray  # (NRB, K) int32 column-panel index, 0-padded
    panel_valid: jnp.ndarray  # (NRB, K) 1.0 for real panels
    #: flat slot (into values.reshape(-1)) of each TRUE nonzero, row-major
    #: sorted — preserves the sparsity pattern (incl. explicitly stored
    #: zeros) across conversions, like every other format's to_matrix_data
    ent_flat: jnp.ndarray = None
    shape: tuple = static_field(default=(0, 0))
    block_rows: int = static_field(default=8)
    nnz_stored: int = static_field(default=0)  # true nnz

    # -- construction -----------------------------------------------------------

    @staticmethod
    def from_matrix_data(data: MatrixData, block_rows: int = 8) -> "Bell":
        d = data.sum_duplicates()
        n, m = d.shape
        BR = int(block_rows)
        assert BR % 8 == 0, "block_rows must be sublane-aligned (multiple of 8)"
        NRB = -(-n // BR)
        NPC = -(-m // LANES)
        rb = d.rows // BR
        pc = d.cols // LANES
        # per row-block: unique panels
        keys = rb * NPC + pc
        order = np.argsort(keys, kind="stable")
        rows_s, cols_s, vals_s = d.rows[order], d.cols[order], d.values[order]
        rb_s, pc_s = rb[order], pc[order]
        uniq, starts = np.unique(rb_s * NPC + pc_s, return_index=True)
        counts = np.diff(np.append(starts, len(rows_s)))
        u_rb, u_pc = uniq // NPC, uniq % NPC
        K = int(np.bincount(u_rb, minlength=NRB).max()) if len(uniq) else 1
        K = max(K, 1)

        panel_ids = np.zeros((NRB, K), np.int32)
        panel_valid = np.zeros((NRB, K), np.float32)
        values = np.zeros((NRB, K, BR, LANES), d.values.dtype)
        # slot of each panel within its row block = rank among the block's
        # panels (uniq is sorted by (rb, pc))
        first_idx = np.searchsorted(u_rb, np.arange(NRB), side="left")
        slot_of_panel = np.arange(len(uniq)) - first_idx[u_rb]
        panel_ids[u_rb, slot_of_panel] = u_pc
        panel_valid[u_rb, slot_of_panel] = 1.0
        panel_of_entry = np.repeat(np.arange(len(uniq)), counts)
        k_of_entry = slot_of_panel[panel_of_entry]
        values[rb_s, k_of_entry, rows_s % BR, cols_s % LANES] = vals_s
        ent_flat = (
            ((rb_s.astype(np.int64) * K + k_of_entry) * BR + rows_s % BR)
            * LANES
            + cols_s % LANES
        )
        if ent_flat.size and ent_flat.max() >= 2**31:
            raise ValueError(
                "Bell slot space exceeds int32 range; use larger block_rows "
                "or a different format"
            )
        # re-sort the pattern row-major (entries arrived panel-grouped)
        order2 = np.lexsort((cols_s, rows_s))
        ent_flat = ent_flat[order2].astype(np.int32)

        return Bell(
            values=jnp.asarray(values),
            panel_ids=jnp.asarray(panel_ids),
            panel_valid=jnp.asarray(panel_valid),
            ent_flat=jnp.asarray(ent_flat),
            shape=(n, m),
            block_rows=BR,
            nnz_stored=int(d.nnz),
        )

    read = from_matrix_data

    @staticmethod
    def from_csr(csr, block_rows: int = 8) -> "Bell":
        return Bell.from_matrix_data(csr.to_matrix_data(), block_rows)

    @property
    def dtype(self):
        return self.values.dtype

    @property
    def nnz(self):
        return self.nnz_stored

    @property
    def num_panels(self):
        return int(self.values.shape[0] * self.values.shape[1])

    def storage_inflation(self) -> float:
        """ALLOCATED dense slots / true nnz — includes the ELL padding to
        the per-block max panel count (what actually occupies memory and
        streams through the kernel)."""
        if self.nnz_stored == 0:
            return 1.0
        return self.values.size / self.nnz_stored

    # -- SpMV --------------------------------------------------------------------

    def apply(self, b):
        arr, was_1d = as_2d(b)
        n, m = self.shape
        k = arr.shape[1]
        NRB, K, BR, _ = self.values.shape
        NPC = -(-m // LANES)
        pad = NPC * LANES - m
        xp = jnp.concatenate(
            [arr, jnp.zeros((pad, k), arr.dtype)], axis=0
        ) if pad else arr
        x_panels = xp.reshape(NPC, LANES, k)
        if k == 1 and self._use_pallas(arr.dtype):
            from ..ops.pallas_bell import bell_spmv_pallas

            y = bell_spmv_pallas(
                self.values, self.panel_ids, self.panel_valid,
                x_panels[..., 0],
            )
            return restore_1d(y.reshape(NRB * BR, 1)[:n], was_1d)
        if (
            1 < k <= 128
            and self._use_pallas(arr.dtype)
            and max(k, 8) * NPC * LANES * 4 <= 6 * (1 << 20)
        ):
            from ..ops.pallas_bell import bell_spmm_pallas

            y = bell_spmm_pallas(self.values, self.panel_ids, xp.T)
            return restore_1d(y[:n], was_1d)
        # XLA path: coarse panel take (512B granules, not element gather);
        # arithmetic in the promoted dtype so bf16 STORAGE keeps f32 math
        work = jnp.promote_types(self.values.dtype, arr.dtype)
        xg = jnp.take(x_panels, self.panel_ids.reshape(-1), axis=0)
        xg = xg.reshape(NRB, K, LANES, k) * self.panel_valid[..., None, None].astype(work)
        y = jnp.einsum(
            "rkbc,rkcj->rbj", self.values.astype(work), xg.astype(work)
        )
        return restore_1d(y.reshape(NRB * BR, k)[:n].astype(work), was_1d)

    def _use_pallas(self, dtype) -> bool:
        import os

        if os.environ.get("GINKGO_TPU_NO_PALLAS"):
            return False
        return (
            jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and self.values.dtype in (jnp.float32, jnp.bfloat16)
        )

    def reduce_storage(self, dtype=jnp.bfloat16) -> "Bell":
        """bf16 panel storage, f32 accumulation in the kernels (accessor
        mode, SURVEY §2.12) — halves panel traffic."""
        return self.replace(values=self.values.astype(dtype))

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        out = jnp.asarray(alpha).reshape(()) * as_2d(self.apply(arr))[0] + (
            jnp.asarray(beta).reshape(()) * xa
        )
        return restore_1d(out, was_1d)

    # -- structure ----------------------------------------------------------------

    def scale(self, alpha):
        return self.replace(values=self.values * jnp.asarray(alpha).reshape(()))

    def compute_absolute(self):
        return self.replace(values=jnp.abs(self.values))

    def astype(self, dtype):
        return self.replace(values=self.values.astype(dtype))

    def extract_diagonal(self):
        """Diagonal straight from the stored slots — no densification
        (required: multigrid smoothers call this on full-size operators)."""
        from .diagonal import Diagonal

        rows, cols, vals = self._decode_entries()
        nmin = min(self.shape)
        diag = np.zeros(nmin, vals.dtype)
        on = (rows == cols) & (rows < nmin)
        diag[rows[on]] = vals[on]
        return Diagonal(values=jnp.asarray(diag))

    def transpose(self) -> "Bell":
        return Bell.from_matrix_data(
            self.to_matrix_data().transpose(), self.block_rows
        )

    def conj_transpose(self) -> "Bell":
        return Bell.from_matrix_data(
            self.to_matrix_data().conj_transpose(), self.block_rows
        )

    # -- conversions ----------------------------------------------------------------

    def _decode_entries(self):
        """(rows, cols, vals) of the true stored entries (inverse of the
        slot encoding in from_matrix_data)."""
        NRB, K, BR, _ = self.values.shape
        flat = to_host(self.ent_flat).astype(np.int64)
        vals = to_host(self.values).reshape(-1)[flat]
        pids = to_host(self.panel_ids)
        cl = flat % LANES
        rest = flat // LANES
        brl = rest % BR
        rest //= BR
        kl = rest % K
        rbl = rest // K
        rows = rbl * BR + brl
        cols = pids[rbl, kl] * LANES + cl
        return rows, cols, vals

    def to_matrix_data(self) -> MatrixData:
        rows, cols, vals = self._decode_entries()
        return MatrixData.from_coo(self.shape, rows, cols, vals).sort_row_major()

    write = to_matrix_data

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data(), strategy=strategy)

    def to_dense(self):
        from .dense import Dense

        return Dense(values=jnp.asarray(self.to_matrix_data().to_dense()))


def bell_inflation_estimate(data: MatrixData, block_rows: int = 8) -> float:
    """TRUE allocated-slot inflation of Bell.from_matrix_data: the ELL
    padding to the per-block MAX panel count is what gets allocated and
    streamed, so one row block touching many panels inflates every block."""
    if data.nnz == 0:
        return 1.0
    NRB = max(1, -(-data.shape[0] // block_rows))
    NPC = max(1, -(-data.shape[1] // LANES))
    rb = data.rows // block_rows
    pc = data.cols // LANES
    keys = np.unique(rb * NPC + pc)
    per_block = np.bincount(keys // NPC, minlength=NRB)
    K = max(int(per_block.max()) if len(per_block) else 1, 1)
    return NRB * K * block_rows * LANES / data.nnz


def suitable_for_bell(data: MatrixData, block_rows: int = 8,
                      max_inflation: float = 40.0) -> bool:
    """BELL pays off when panels are reasonably full: ALLOCATED storage
    inflation below `max_inflation` keeps the dense-panel stream faster
    than element gather (~100-500x off streaming rate on TPU)."""
    return bell_inflation_estimate(data, block_rows) <= max_inflation

"""DIA (diagonal) sparse format — the TPU-native fast path for banded and
stencil matrices.

The reference has no DIA format; its stencil SpMVs go through CSR/ELL with
hardware gather (cuda/matrix/csr_kernels.cu).  TPUs have no vector gather —
measured ~7 ns per gathered element on v5e, which makes any gather-based SpMV
~200x off roofline — so the equivalent *performance* role (fast SpMV for the
benchmark's stencil/banded class, and for RCM-reordered matrices, reference
rcm.hpp) is played by a gather-free diagonal decomposition:

  y = sum_d  diag_d * shift(x, off_d)

with x stored in a (rows, 128)-tiled 2-D layout.  A flat shift by `off`
splits into a sublane (row) shift — a cheap static slice — and a lane shift
by off%128 — executed as a 128x128 permutation matmul on the MXU at HIGHEST
precision (exact for f32, since each output is a single input value).
On real TPU the apply routes to the Pallas kernels (ops/pallas_dia.py):
measured on v5e, 827 GB/s effective (~100% of nominal HBM) / 148-200
Gnnz/s f32, 325 Gnnz/s with bf16 storage (reduce_storage), 475 Gnnz/s
SpMM at k=8 — vs ~0.007 Gnnz/s for gather-based CSR on the same chip.
This XLA permutation-matmul path remains the portable fallback/oracle.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..base.types import to_host
from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData

LANES = 128


def _perm_matrix(s: int) -> np.ndarray:
    p = np.zeros((LANES, LANES), np.float32)
    p[(np.arange(LANES) + s) % LANES, np.arange(LANES)] = 1.0
    return p


def _row_shift(v, q: int):
    """out[r] = v[r+q], zero fill (v: (R, LANES[, k]))."""
    if q == 0:
        return v
    z = jnp.zeros((abs(q),) + v.shape[1:], v.dtype)
    return (
        jnp.concatenate([v[q:], z]) if q > 0 else jnp.concatenate([z, v[:q]])
    )


@linop_dataclass
class Dia(LinOp):
    diags: jnp.ndarray  # (nd, R, LANES) diagonal values, row-aligned, padded
    perms: tuple  # lane-shift permutation matrices for each needed s!=0
    offsets: tuple = static_field(default=())  # static ints, sorted
    shape: tuple = static_field(default=(0, 0))

    # -- construction ---------------------------------------------------------

    @staticmethod
    def from_matrix_data(data: MatrixData) -> "Dia":
        d = data.sum_duplicates()
        n, m = d.shape
        offs = np.unique(d.cols - d.rows)
        # the x frame must cover column index n-1+max_offset (<= m-1): use
        # max(n, m) so wide rectangular operators are never truncated
        R = -(-max(n, m) // LANES)
        nd = len(offs)
        diags = np.zeros((nd, R * LANES), dtype=d.values.dtype)
        off_idx = np.searchsorted(offs, d.cols - d.rows)
        diags[off_idx, d.rows] = d.values
        diags = diags.reshape(nd, R, LANES)
        perm_list = []
        seen = set()
        for o in offs:
            s = int(o) % LANES
            if s != 0 and s not in seen:
                seen.add(s)
                perm_list.append((s, jnp.asarray(_perm_matrix(s))))
        return Dia(
            diags=jnp.asarray(diags),
            perms=tuple(p for _, p in sorted(perm_list)),
            offsets=tuple(int(o) for o in offs),
            shape=(n, m),
        )

    read = from_matrix_data

    @staticmethod
    def from_csr(csr) -> "Dia":
        return Dia.from_matrix_data(csr.to_matrix_data())

    @property
    def dtype(self):
        return self.diags.dtype

    @property
    def num_diags(self):
        return len(self.offsets)

    @property
    def nnz(self):  # stored elements (padded dense diagonals)
        return self.diags.size

    def _use_pallas(self, dtype) -> bool:
        """Use the Pallas kernel (ops/pallas_dia.py) on real TPU; the XLA
        permutation-matmul path remains the portable fallback (and the oracle
        the Pallas kernel is tested against).  Diagonal STORAGE may be bf16
        (reduce_storage) — the kernel accumulates in f32 regardless."""
        import os

        if os.environ.get("GINKGO_TPU_NO_PALLAS"):
            return False
        return (
            jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and self.diags.dtype in (jnp.float32, jnp.bfloat16)
            and self.num_diags > 0
        )

    def reduce_storage(self, dtype=jnp.bfloat16) -> "Dia":
        """Accessor-style storage reduction (SURVEY §2.12): diagonal values
        stored reduced, arithmetic stays f32 in the Pallas kernel — halves
        matrix traffic for bandwidth-bound SpMV."""
        return self.replace(diags=self.diags.astype(dtype))

    def _perm_for(self, s: int):
        keys = sorted({int(o) % LANES for o in self.offsets} - {0})
        return self.perms[keys.index(s)]

    def _flat_shift(self, v, off: int):
        """v: (R, LANES[, k]); shift flat row-major index by off, zero fill."""
        q, s = off // LANES, off % LANES
        if s == 0:
            return _row_shift(v, q)
        P = self._perm_for(s)
        if v.ndim == 3:
            A = jnp.einsum(
                "rlk,lm->rmk", v, P, precision=jax.lax.Precision.HIGHEST
            )
        else:
            A = jnp.dot(
                v,
                P,
                preferred_element_type=v.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        if v.ndim == 3:
            lane = lane[..., None]
        return jnp.where(lane < LANES - s, _row_shift(A, q), _row_shift(A, q + 1))

    def apply(self, b):
        arr, was_1d = as_2d(b)
        n, mcols = self.shape
        k = arr.shape[1]
        R = self.diags.shape[1]
        # pad x (length m) into the (R, LANES) frame of the rows; shifts index
        # x at flat position row + off, so x must live in row-frame length
        pad_len = R * LANES - arr.shape[0]
        xp = jnp.concatenate(
            [arr, jnp.zeros((pad_len, k), arr.dtype)], axis=0
        ) if pad_len > 0 else arr[: R * LANES]
        if k == 1:
            # fast path: keep the VPU-native (R, 128) layout, no trailing dim
            x2 = xp.reshape(R, LANES)
            if self._use_pallas(x2.dtype):
                from ..ops.pallas_dia import dia_spmv_pallas

                y = dia_spmv_pallas(self.diags, self.offsets, x2)
                return restore_1d(y.reshape(R * LANES, 1)[:n], was_1d)
            y = None
            for j, off in enumerate(self.offsets):
                term = self.diags[j] * self._flat_shift(x2, off)
                y = term if y is None else y + term
            if y is None:
                y = jnp.zeros((R, LANES), arr.dtype)
            return restore_1d(y.reshape(R * LANES, 1)[:n], was_1d)
        if self._use_pallas(arr.dtype) and k <= 512:
            from ..ops.pallas_dia import dia_spmm_pallas

            xk = xp.T.reshape(k, R, LANES)
            yk = dia_spmm_pallas(self.diags, self.offsets, xk)
            out = yk.reshape(k, R * LANES).T[:n]
            return restore_1d(out, was_1d)
        x2 = xp.reshape(R, LANES, k)
        y = None
        for j, off in enumerate(self.offsets):
            term = self.diags[j][..., None] * self._flat_shift(x2, off)
            y = term if y is None else y + term
        if y is None:
            y = jnp.zeros((R, LANES, k), arr.dtype)
        out = y.reshape(R * LANES, k)[:n]
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        if arr.shape[1] == 1 and self._use_pallas(arr.dtype):
            from ..ops.pallas_dia import dia_advanced_spmv_pallas

            n = self.shape[0]
            R = self.diags.shape[1]
            pad = R * LANES - arr.shape[0]
            b2 = jnp.pad(arr, ((0, max(pad, 0)), (0, 0)))[: R * LANES]
            y2 = jnp.pad(xa, ((0, max(R * LANES - xa.shape[0], 0)), (0, 0)))[
                : R * LANES
            ]
            out = dia_advanced_spmv_pallas(
                self.diags,
                self.offsets,
                b2.reshape(R, LANES),
                alpha,
                beta,
                y2.reshape(R, LANES),
            )
            return restore_1d(out.reshape(R * LANES, 1)[:n], was_1d)
        out = jnp.asarray(alpha).reshape(()) * as_2d(self.apply(arr))[0] + jnp.asarray(
            beta
        ).reshape(()) * xa
        return restore_1d(out, was_1d)

    # -- structure ops ----------------------------------------------------------

    def extract_diagonal(self):
        from .diagonal import Diagonal

        n = min(self.shape)
        if 0 in self.offsets:
            j = self.offsets.index(0)
            return Diagonal(values=self.diags[j].reshape(-1)[:n])
        return Diagonal(values=jnp.zeros((n,), self.dtype))

    def scale(self, alpha):
        return self.replace(diags=self.diags * jnp.asarray(alpha).reshape(()))

    def compute_absolute(self):
        return self.replace(diags=jnp.abs(self.diags))

    def transpose(self) -> "Dia":
        return Dia.from_matrix_data(self.to_matrix_data().transpose())

    def conj_transpose(self) -> "Dia":
        return Dia.from_matrix_data(self.to_matrix_data().conj_transpose())

    # -- conversions --------------------------------------------------------------

    def to_matrix_data(self) -> MatrixData:
        n, m = self.shape
        rows_l, cols_l, vals_l = [], [], []
        host = to_host(self.diags).reshape(self.num_diags, -1)
        for j, off in enumerate(self.offsets):
            r = np.arange(n)
            c = r + off
            ok = (c >= 0) & (c < m)
            v = host[j, : n][ok]
            keep = v != 0
            rows_l.append(r[ok][keep])
            cols_l.append(c[ok][keep])
            vals_l.append(v[keep])
        return MatrixData.from_coo(
            self.shape,
            np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64),
            np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64),
            np.concatenate(vals_l) if vals_l else np.zeros(0, host.dtype),
        ).sort_row_major()

    write = to_matrix_data

    def to_scipy(self):
        """Direct scipy ``dia_matrix`` view — no triplet sort.

        scipy's DIA data is column-indexed (``data[k, c] = A[c - off, c]``)
        while ours is row-indexed (``diags[k, r] = A[r, r + off]``), so each
        diagonal is one shifted slice copy; ``.tocsr()`` on the result is a
        C pass.  Dtypes scipy rejects (bf16/f16) are widened to float32 —
        use :meth:`to_matrix_data` when exact dtype round-trip matters.
        """
        import scipy.sparse as sps

        n, m = self.shape
        host = np.asarray(to_host(self.diags)).reshape(self.num_diags, -1)
        if host.dtype not in (np.float32, np.float64, np.complex64,
                              np.complex128):
            host = host.astype(np.float32)
        data = np.zeros((self.num_diags, m), host.dtype)
        for k, off in enumerate(self.offsets):
            c0, c1 = max(0, off), min(m, n + off)
            if c1 > c0:
                data[k, c0:c1] = host[k, c0 - off : c1 - off]
        return sps.dia_matrix(
            (data, np.asarray(self.offsets, np.int64)), shape=(n, m)
        )

    def to_csr(self, strategy="auto"):
        from .csr import Csr

        return Csr.from_matrix_data(self.to_matrix_data(), strategy=strategy)

    def to_dense(self):
        from .dense import Dense

        return Dense(values=jnp.asarray(self.to_matrix_data().to_dense()))

    def astype(self, dtype):
        return self.replace(diags=self.diags.astype(dtype))


def suitable_for_dia(data: MatrixData, max_diags: int = 64) -> bool:
    """Heuristic: DIA pays off when distinct offsets are few and diagonals are
    reasonably full (storage = nd * n values)."""
    if data.nnz == 0:
        return False
    offs = np.unique(data.cols - data.rows)
    if len(offs) > max_diags:
        return False
    fill = data.nnz / (len(offs) * data.shape[0])
    return fill > 0.2

"""DistWell — row-distributed LOCALITY-FREE operator on the WELL kernel.

Completes the distributed operator family: DistDia (banded), DistPell
(general sparse with column locality), DistWell (no locality — power-law
graphs, circuit matrices).  Both the local and the non-local (halo)
blocks stream through the WELL windowed-chained-gather Pallas kernel
(ops/spmv_well.py); the halo exchange is identical to DistCsr/DistPell
(ppermute window or all_gather).

Stacked-SPMD layout exactly as distributed/pell.py: per-part plans pad
to common (slots, steps) with zero-value padding slots (window 0 reads
contribute nothing) and padding steps aimed at each part's last tile.

Reference: core/distributed/matrix.cpp:306-335 (overlapped local SpMV +
halo exchange); the load-balanced CSR kernels this layout replaces:
cuda/matrix/csr_kernels.cu:276-310.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..base.matrix_data import MatrixData
from ..ops.spmv_well import WellPlan, _well_call, WIN_PANELS
from ..ops.spmv_pallas import LANES, SUBLANES
from .partition import Partition
from .matrix import DistCsr


def _stack_well_plans(plans):
    """Pad per-part WellPlans to common (slots, steps) and stack on a
    leading parts axis (see distributed/pell._stack_plans)."""
    max_slots = max(p.values.shape[0] for p in plans)
    max_steps = max(p.n_steps for p in plans)
    NT = max(p.NT for p in plans)
    vals, qidx, rt, bases, tiles = [], [], [], [], []
    for p in plans:
        pad_s = max_slots - p.values.shape[0]
        pad3 = ((0, pad_s), (0, 0), (0, 0))
        vals.append(np.pad(np.asarray(p.values), pad3))
        qidx.append(np.pad(np.asarray(p.qidx), pad3))
        rt.append(np.pad(np.asarray(p.rt), pad3))
        bases.append(np.pad(np.asarray(p.bases), (0, pad_s)))
        t = np.asarray(p.tile_of_step)
        last = t[-1] if len(t) else 0
        tiles.append(np.pad(t, (0, max_steps - len(t)),
                            constant_values=last))
    return (
        jnp.asarray(np.stack(vals)),
        jnp.asarray(np.stack(qidx)),
        jnp.asarray(np.stack(rt)),
        jnp.asarray(np.stack(bases)),
        jnp.asarray(np.stack(tiles)),
        max_steps,
        NT,
    )


@linop_dataclass
class DistWell(LinOp):
    """Row-distributed WELL.  All array fields have leading axis =
    num_parts; inside shard_map that axis has extent 1."""

    l_vals: jnp.ndarray  # (P, S, 8, 128)
    l_qidx: jnp.ndarray  # (P, S, 8, 128) int8 residues
    l_rt: jnp.ndarray  # (P, S, 8, 128) int8 routing
    l_bases: jnp.ndarray  # (P, S) int32 window bases
    l_tiles: jnp.ndarray  # (P, steps) int32
    nl_vals: jnp.ndarray
    nl_qidx: jnp.ndarray
    nl_rt: jnp.ndarray
    nl_bases: jnp.ndarray
    nl_tiles: jnp.ndarray
    halo_src: jnp.ndarray  # (P, H)
    row_valid: jnp.ndarray  # (P, L)
    shape: tuple = static_field(default=(0, 0))
    local_size: int = static_field(default=0)
    col_local_size: int = static_field(default=0)
    halo_size: int = static_field(default=0)
    num_parts: int = static_field(default=1)
    axis_name: Any = static_field(default=None)
    halo_mode: str = static_field(default="all_gather")
    l_NT: int = static_field(default=0)
    nl_NT: int = static_field(default=0)
    G: int = static_field(default=8)

    @property
    def dtype(self):
        return self.l_vals.dtype

    @staticmethod
    def from_matrix_data(
        data: MatrixData, partition: Partition, col_partition=None,
        axis_name="rows", halo="auto", G: int = 8,
    ) -> "DistWell":
        """Assemble via DistCsr's local/non-local split, then re-plan
        each block as WELL (fixed G: the per-device program must be
        identical inside shard_map)."""
        base = DistCsr.from_matrix_data(
            data, partition, col_partition=col_partition,
            axis_name=axis_name, halo=halo,
        )
        P = base.num_parts
        L = base.local_size
        Lc = base.col_local_size
        H = base.halo_src.shape[1]
        l_plans, nl_plans = [], []
        for p in range(P):
            # T pinned to 1: the per-device program inside shard_map must
            # be identical across parts, and the stacked layout carries no
            # tsb plane (supertiles are a single-device optimization)
            l_plans.append(WellPlan(
                np.asarray(base.l_row_ptrs[p]), np.asarray(base.l_cols[p]),
                np.asarray(base.l_vals[p]), (L, Lc), G=G, T=1,
            ))
            nl_plans.append(WellPlan(
                np.asarray(base.nl_row_ptrs[p]), np.asarray(base.nl_cols[p]),
                np.asarray(base.nl_vals[p]), (L, H), G=G, T=1,
            ))
        lv, lq, lr, lb, lt, l_steps, lNT = _stack_well_plans(l_plans)
        nv, nq, nr, nb, nt, nl_steps, nNT = _stack_well_plans(nl_plans)
        from ..ops.spmv_pallas import _MAX_PREFETCH_INTS

        step_cap = max(_MAX_PREFETCH_INTS // (G + 1), 1)
        assert max(l_steps, nl_steps) <= step_cap, (
            "per-part plan exceeds the scalar-prefetch budget; use more "
            "parts or a smaller local problem"
        )
        return DistWell(
            l_vals=lv, l_qidx=lq, l_rt=lr, l_bases=lb, l_tiles=lt,
            nl_vals=nv, nl_qidx=nq, nl_rt=nr, nl_bases=nb, nl_tiles=nt,
            halo_src=base.halo_src,
            row_valid=base.row_valid,
            shape=base.shape,
            local_size=L,
            col_local_size=Lc,
            halo_size=H,
            num_parts=P,
            axis_name=axis_name,
            halo_mode=base.halo_mode,
            l_NT=lNT,
            nl_NT=nNT,
            G=G,
        )

    def _sq(self, a):
        return a[0]

    def _well_block(self, vals, qidx, rt, bases, tiles, NT, x, n_cols):
        import os

        interpret = jax.default_backend() != "tpu" or bool(
            os.environ.get("GINKGO_TPU_NO_PALLAS")
        )
        NP = max(-(-n_cols // LANES), 1)
        NW = max(-(-NP // WIN_PANELS), 1)
        npan = NW * WIN_PANELS  # windows are aligned: no left pad
        xp = jnp.zeros((npan * LANES,), x.dtype).at[:n_cols].set(x)
        out = _well_call(
            tiles, bases, vals, qidx, rt, None, xp.reshape(-1, LANES), NT,
            self.G, 1, x.dtype, interpret,
        )
        return out.reshape(-1)[: self.local_size]

    def apply(self, x_local):
        """Distributed SpMV for the local shard; x_local (Lc, k) or
        (Lc,) per the column partition, result (L, k) per the row
        partition."""
        arr, was_1d = as_2d(x_local)
        cols_out = []
        if self.halo_mode == "neighbor":
            P = self.num_parts
            ax = self.axis_name
            from_prev = jax.lax.ppermute(
                arr, ax, [(i, i + 1) for i in range(P - 1)]
            )
            from_next = jax.lax.ppermute(
                arr, ax, [(i + 1, i) for i in range(P - 1)]
            )
            window = jnp.concatenate([from_prev, arr, from_next], axis=0)
            halo = jnp.take(window, self._sq(self.halo_src), axis=0)
        else:
            xg = jax.lax.all_gather(arr, self.axis_name)
            xg = xg.reshape(-1, arr.shape[1])
            halo = jnp.take(xg, self._sq(self.halo_src), axis=0)
        for k in range(arr.shape[1]):
            y = self._well_block(
                self._sq(self.l_vals), self._sq(self.l_qidx),
                self._sq(self.l_rt), self._sq(self.l_bases),
                self._sq(self.l_tiles), self.l_NT,
                arr[:, k], self.col_local_size,
            )
            y = y + self._well_block(
                self._sq(self.nl_vals), self._sq(self.nl_qidx),
                self._sq(self.nl_rt), self._sq(self.nl_bases),
                self._sq(self.nl_tiles), self.nl_NT,
                halo[:, k], self.halo_size,
            )
            cols_out.append(y)
        out = jnp.stack(cols_out, axis=1) * self._sq(self.row_valid)[:, None]
        return restore_1d(out, was_1d)

    def apply_advanced(self, alpha, b, beta, x):
        arr, was_1d = as_2d(b)
        xa, _ = as_2d(x)
        y = self.apply(arr)
        a = jnp.asarray(alpha).reshape(())
        bb = jnp.asarray(beta).reshape(())
        out = (a * y + bb * xa) * self._sq(self.row_valid)[:, None]
        return restore_1d(out, was_1d)

    def extract_diagonal_local(self):
        """(L,) diagonal of the local block via the chained-gather
        composition (jit-safe, pure jnp): cell (sl, s, lane) holds
        column (bases[sl] + rt[sl, s, q]) * 128 + q with q =
        qidx[sl, s, lane]."""
        vals = self._sq(self.l_vals)
        q = self._sq(self.l_qidx).astype(jnp.int32)
        rt = self._sq(self.l_rt).astype(jnp.int32)
        bases = self._sq(self.l_bases)
        tiles = self._sq(self.l_tiles)
        S = vals.shape[0]
        slot_tile = jnp.repeat(tiles, self.G, total_repeat_length=S)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, SUBLANES, LANES), 2)
        subl = jax.lax.broadcasted_iota(jnp.int32, (S, SUBLANES, LANES), 1)
        rows = slot_tile[:, None, None] * 1024 + subl * 128 + lane
        wr = jnp.take_along_axis(rt, q, axis=2)
        cols = (bases[:, None, None] + wr) * 128 + q
        on_diag = (rows == cols) & (vals != 0)
        flat_rows = jnp.where(on_diag, rows, 0).reshape(-1)
        diag = jax.ops.segment_sum(
            jnp.where(on_diag, vals, 0).reshape(-1),
            flat_rows.astype(jnp.int32),
            num_segments=self.l_NT * 1024,
        )[: self.local_size]
        return jnp.where(self._sq(self.row_valid) > 0, diag, 1)

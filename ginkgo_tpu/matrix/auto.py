"""Automatic format selection.

Reference analog: Csr's `automatical` SpMV strategy (csr.hpp:526) picks a
kernel from matrix statistics.  On TPU the decision that matters is the
*format* (it determines whether SpMV gathers): banded/stencil operators go
to DIA (gather-free diagonal streaming), column-local operators go to BELL
(panel streaming), and everything else stays CSR (with a documented
gather penalty) — the same "pick the fast path from sparsity statistics"
contract, one level up.
"""

from __future__ import annotations

from ..base.matrix_data import MatrixData
from .dia import Dia, suitable_for_dia
from .bell import Bell, bell_inflation_estimate
from .csr import Csr


def choose_format(
    data: MatrixData,
    max_diags: int = 64,
    max_inflation: float = 40.0,
    block_rows: int = 8,
):
    """Build the fastest suitable operator for `data` (automatical
    strategy analog).  Preference: Dia > (Pell | Bell, whichever streams
    fewer HBM bytes per nonzero) > Csr.  Candidate inflations are TRUE
    allocated-slot inflations (including padding)."""
    if suitable_for_dia(data, max_diags=max_diags):
        return Dia.from_matrix_data(data)
    if data.nnz:
        best_bell = None
        for br in (block_rows, 2 * block_rows, 4 * block_rows):
            inflation = bell_inflation_estimate(data, block_rows=br)
            if best_bell is None or inflation < best_bell[1]:
                best_bell = (br, inflation)
        import numpy as np

        from ..ops.spmv_pallas import PellPlan
        from .pell import Pell

        csr = Csr.from_matrix_data(data)
        # stats-only plans: selection must not materialize (or upload)
        # the padded slot arrays of a candidate that loses
        stats = PellPlan(
            np.asarray(csr.row_ptrs), np.asarray(csr.col_idxs),
            np.asarray(csr.values), tuple(csr.shape),
            q_dtype=np.int8, materialize=False,
        )
        # HBM bytes per nonzero: Pell streams value + int8 lane index
        # (5 B/cell), Bell streams dense panels (4 B/cell)
        pell_bytes = stats.inflation * 5
        bell_bytes = best_bell[1] * 4
        if pell_bytes <= bell_bytes and stats.inflation <= max_inflation:
            return Pell.from_csr(csr)
        if best_bell[1] <= max_inflation:
            return Bell.from_matrix_data(data, block_rows=best_bell[0])
        if stats.inflation <= 2 * max_inflation:
            return Pell.from_csr(csr)  # far better than gather-speed Csr
        # locality-free tail: the WELL windowed-gather layout
        # (ops/spmv_well.py) replaces the reference's load_balance CSR
        # kernel class — accept it whenever its padded bytes are sane
        from ..ops.spmv_well import WellPlan
        from .well import Well

        wstats = WellPlan(
            np.asarray(csr.row_ptrs), np.asarray(csr.col_idxs),
            np.asarray(csr.values), tuple(csr.shape), materialize=False,
        )
        if (
            wstats.inflation * wstats.bytes_per_cell
            < min(pell_bytes, bell_bytes)
            and wstats.padded_bytes <= 1 << 30
        ):
            return Well.from_csr(csr, T=wstats.T)
    return Csr.from_matrix_data(data)

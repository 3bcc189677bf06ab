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

import numpy as np

from ..base.matrix_data import MatrixData
from .dia import Dia
from .bell import Bell, LANES
from .csr import Csr


def choose_format(
    data: MatrixData,
    max_diags: int = 64,
    max_inflation: float = 40.0,
    block_rows: int = 8,
):
    """Build the fastest suitable operator for `data` (automatical
    strategy analog).  Preference: Dia > Bell > Csr.  The diagonal
    statistics are computed once here (suitable_for_dia's check inlined)
    to avoid a second O(nnz log nnz) pass inside the constructor."""
    if data.nnz:
        offs = np.unique(data.cols - data.rows)
        fill = data.nnz / (len(offs) * data.shape[0])
        if len(offs) <= max_diags and fill > 0.2:
            return Dia.from_matrix_data(data)
        # BELL block-rows auto-tune: pick the candidate with the lowest
        # storage inflation (bigger blocks amortize panels only when rows
        # share columns) — stats-only, no construction
        NPC = max(1, -(-data.shape[1] // LANES))
        pc = data.cols // LANES
        best = None
        for br in (block_rows, 2 * block_rows, 4 * block_rows):
            rb = data.rows // br
            n_panels = len(np.unique(rb * NPC + pc))
            inflation = n_panels * br * LANES / data.nnz
            if best is None or inflation < best[1]:
                best = (br, inflation)
        if best[1] <= max_inflation:
            return Bell.from_matrix_data(data, block_rows=best[0])
    return Csr.from_matrix_data(data)

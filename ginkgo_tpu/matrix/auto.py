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
from .bell import Bell, suitable_for_bell, LANES
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
    if suitable_for_bell(data, block_rows=block_rows, max_inflation=max_inflation):
        return Bell.from_matrix_data(data, block_rows=block_rows)
    return Csr.from_matrix_data(data)

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
    strategy analog).  Preference: Dia > Bell > Csr.  The Bell candidate
    block-rows are tuned by the TRUE allocated-slot inflation (including
    ELL padding to the per-block max panel count)."""
    if suitable_for_dia(data, max_diags=max_diags):
        return Dia.from_matrix_data(data)
    if data.nnz:
        best = None
        for br in (block_rows, 2 * block_rows, 4 * block_rows):
            inflation = bell_inflation_estimate(data, block_rows=br)
            if best is None or inflation < best[1]:
                best = (br, inflation)
        if best[1] <= max_inflation:
            return Bell.from_matrix_data(data, block_rows=best[0])
    return Csr.from_matrix_data(data)

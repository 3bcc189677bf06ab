"""ScaledReordered: wrap a solver with row/column scaling + permutation.

Reference: core/reorder/scaled_reordered.cpp — solves
(R P A P^T C) y = R P b with x = P^T C y, where R/C are diagonal scalings
and P a permutation (e.g. from Rcm)."""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..matrix.diagonal import Permutation, Diagonal


@linop_dataclass
class ScaledReordered(LinOp):
    inner_solver: Any
    permutation: Any  # Permutation or None
    row_scaling: Any  # Diagonal or None
    col_scaling: Any

    @property
    def shape(self):
        return self.inner_solver.shape

    @property
    def dtype(self):
        return self.inner_solver.dtype

    def apply(self, b):
        arr, was_1d = as_2d(b)
        rhs = arr
        if self.row_scaling is not None:
            rhs = self.row_scaling.apply(rhs)
        if self.permutation is not None:
            rhs = self.permutation.apply(rhs)
        y = self.inner_solver.apply(rhs)
        y = getattr(y, "values", y)
        if y.ndim == 1:
            y = y[:, None]
        if self.permutation is not None:
            y = self.permutation.inverse_apply(y)
        if self.col_scaling is not None:
            y = self.col_scaling.apply(y)
        return restore_1d(y, was_1d)

    solve = apply


class ScaledReorderedFactory:
    """scaled_reordered factory: reordering (e.g. RcmFactory), optional
    row/col scaling Diagonals, inner solver factory."""

    def __init__(self, solver, reordering=None, row_scaling=None, col_scaling=None):
        self.solver_factory = solver
        self.reordering = reordering
        self.row_scaling = row_scaling
        self.col_scaling = col_scaling

    def generate(self, A) -> ScaledReordered:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        work = csr
        if self.row_scaling is not None:
            from ..base.matrix_data import MatrixData

            d = np.asarray(self.row_scaling.values)
            sp = work.to_scipy().tocoo()
            work = type(csr).from_matrix_data(
                MatrixData.from_coo(
                    sp.shape, sp.row, sp.col, d[sp.row] * sp.data
                )
            )
        if self.col_scaling is not None:
            from ..base.matrix_data import MatrixData

            d = np.asarray(self.col_scaling.values)
            sp = work.to_scipy().tocoo()
            work = type(csr).from_matrix_data(
                MatrixData.from_coo(
                    sp.shape, sp.row, sp.col, sp.data * d[sp.col]
                )
            )
        perm = None
        if self.reordering is not None:
            perm = self.reordering.generate(work)
            work = work.symm_permute(perm.to_host())
        inner = self.solver_factory.generate(work)
        return ScaledReordered(
            inner_solver=inner,
            permutation=perm,
            row_scaling=self.row_scaling,
            col_scaling=self.col_scaling,
        )

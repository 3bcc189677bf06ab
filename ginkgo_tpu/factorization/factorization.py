"""Factorization container: holds L/U (or L/L^H) factors.

Reference: include/ginkgo/core/factorization/factorization.hpp:104 and the
Composition<V> output convention of the ilu/ic/par_ilu factories
(factorization/ilu.hpp:71)."""

from __future__ import annotations

from typing import Any

from ..base.linop import LinOp, linop_dataclass, static_field, Composition


@linop_dataclass
class Factorization(LinOp):
    l_factor: Any
    u_factor: Any
    #: optional row permutation indices p with (P A) = L U, i.e.
    #: (A x = b)  <=>  (L U x = b[p]).  None for pivot-free factorizations.
    #: With a fill-reducing reorder the row pivots are folded in: p maps
    #: b to the permuted-system right-hand side in one gather.
    row_perm: Any = None
    #: optional back-permutation for a symmetrically reordered factor
    #: (P A P^T = L U): the permuted solution y maps back as x = y[col_perm]
    #: (col_perm = inverse of the reorder permutation).  None when the
    #: factor is of A itself.
    col_perm: Any = None
    shape: tuple = static_field(default=(0, 0))

    @property
    def dtype(self):
        return self.l_factor.dtype

    def get_l_factor(self):
        return self.l_factor

    def get_u_factor(self):
        return self.u_factor

    def get_lower_factor(self):
        return self.l_factor

    def get_upper_factor(self):
        return self.u_factor

    def apply(self, b):
        """Apply L @ U (the composed operator, like Composition(L, U))."""
        return self.l_factor.apply(self.u_factor.apply(b))

    def to_composition(self) -> Composition:
        return Composition(operators=(self.l_factor, self.u_factor))

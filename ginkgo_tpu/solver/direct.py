"""Direct solver: LU factorization + two triangular solves.

Reference: core/solver/direct.cpp (299; experimental::solver::Direct =
factorization::Lu + lower/upper trs)."""

from __future__ import annotations

from typing import Any

from ..base.linop import LinOp, linop_dataclass, static_field
from ..factorization.lu import LuFactory
from .triangular import LowerTrsFactory, UpperTrsFactory


@linop_dataclass
class Direct(LinOp):
    l_solver: Any
    u_solver: Any
    #: optional pivot permutation from the factorization (P A = L U):
    #: apply solves L U x = b[row_perm]
    row_perm: Any = None
    #: optional back-permutation of a symmetrically reordered factor
    #: (P A P^T = L U, e.g. reorder='rcm'): x = y[col_perm]
    col_perm: Any = None

    @property
    def shape(self):
        return self.l_solver.shape

    @property
    def dtype(self):
        return self.l_solver.dtype

    def apply(self, b):
        import jax.numpy as jnp

        if self.row_perm is not None:
            b = jnp.take(jnp.asarray(b), self.row_perm, axis=0)
        y = self.u_solver.apply(self.l_solver.apply(b))
        if self.col_perm is not None:
            y = jnp.take(y, self.col_perm, axis=0)
        return y

    def solve(self, b, x0=None):
        from .solver_base import SolveInfo
        import jax.numpy as jnp

        x = self.apply(b)
        k = x.shape[1] if x.ndim > 1 else 1
        return x, SolveInfo(
            iterations=jnp.asarray(1, jnp.int32),
            residual_norm=jnp.zeros((k,)),
            converged=jnp.ones((k,), bool),
            history=None,
        )

    @staticmethod
    def build(factorization=None, l_solver=None, u_solver=None, **kw):
        return DirectFactory(factorization, l_solver, u_solver)


class DirectFactory:
    def __init__(self, factorization=None, l_solver=None, u_solver=None):
        self.ff = factorization or LuFactory()
        self.lf = l_solver or LowerTrsFactory()
        self.uf = u_solver or UpperTrsFactory()

    def generate(self, A) -> Direct:
        fact = self.ff.generate(A) if not hasattr(A, "get_l_factor") else A
        return Direct(
            l_solver=self.lf.generate(fact.get_l_factor()),
            u_solver=self.uf.generate(fact.get_u_factor()),
            row_perm=getattr(fact, "row_perm", None),
            col_perm=getattr(fact, "col_perm", None),
        )

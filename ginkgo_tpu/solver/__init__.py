from .solver_base import SolveInfo, SolverFactory
from .cg import Cg, Fcg
from .ir import Ir, Richardson
from .bicgstab import Bicgstab, Cgs, Bicg
from .gmres import Gmres, CbGmres
from .idr import Idr
from .direct import Direct, DirectFactory
from .multigrid import Multigrid, MultigridFactory
from .triangular import LowerTrs, UpperTrs, LowerTrsFactory, UpperTrsFactory, TriangularSolver

__all__ = [
    "SolveInfo",
    "SolverFactory",
    "Cg",
    "Fcg",
    "Ir",
    "Richardson",
    "Bicgstab",
    "Cgs",
    "Bicg",
    "Gmres",
    "CbGmres",
    "Idr",
    "LowerTrs",
    "UpperTrs",
    "LowerTrsFactory",
    "UpperTrsFactory",
    "TriangularSolver",
    "Direct",
    "Multigrid",
    "MultigridFactory",
    "DirectFactory",
]

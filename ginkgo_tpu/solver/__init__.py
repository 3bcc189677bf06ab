from .solver_base import SolveInfo, SolverFactory
from .cg import Cg, Fcg
from .ir import Ir, Richardson

__all__ = ["SolveInfo", "SolverFactory", "Cg", "Fcg", "Ir", "Richardson"]

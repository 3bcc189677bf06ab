from .factorization import Factorization
from .par_ilu import ParIlu, ParIc, ParIluFactory, ParIcFactory
from .ilu import Ilu, Ic, IluFactory, IcFactory
from .par_ilut import ParIlut, ParIct, ParIlutFactory, ParIctFactory
from .lu import Lu, Cholesky, LuFactory, CholeskyFactory, elimination_forest, symbolic_cholesky

__all__ = [
    "Factorization",
    "ParIlu",
    "ParIc",
    "ParIluFactory",
    "ParIcFactory",
    "Ilu",
    "Ic",
    "IluFactory",
    "IcFactory",
    "ParIlut",
    "ParIct",
    "ParIlutFactory",
    "ParIctFactory",
    "Lu",
    "Cholesky",
    "LuFactory",
    "CholeskyFactory",
    "elimination_forest",
    "symbolic_cholesky",
]

from .partition import Partition
from .matrix import DistCsr, read_distributed
from .pell import DistPell
from .well import DistWell
from .dia import DistDia, build_banded_partition
from .vector import DistVector
from .solve import distributed_solve, make_mesh, pad_global, unpad_global
from . import comm
from . import vector

__all__ = [
    "Partition",
    "DistCsr",
    "DistPell",
    "DistWell",
    "DistDia",
    "build_banded_partition",
    "DistVector",
    "distributed_solve",
    "make_mesh",
    "pad_global",
    "unpad_global",
    "comm",
    "vector",
]

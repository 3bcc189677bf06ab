from .partition import Partition
from .matrix import DistCsr
from .solve import distributed_solve, make_mesh, pad_global, unpad_global

__all__ = [
    "Partition",
    "DistCsr",
    "distributed_solve",
    "make_mesh",
    "pad_global",
    "unpad_global",
]

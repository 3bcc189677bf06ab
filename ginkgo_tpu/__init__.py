"""ginkgo_tpu — a TPU-native sparse linear-algebra framework.

Re-designed from scratch with the capability surface of Ginkgo v1.5.0
(/root/reference): sparse formats, SpMV/SpGEMM, Krylov solvers,
preconditioners, incomplete/direct factorizations, algebraic multigrid,
reordering, stopping criteria, logging, MatrixMarket IO, and a
mesh-distributed layer — built on jax/XLA/Pallas/shard_map instead of the
reference's Executor/Operation C++ dispatch (see SURVEY.md §7 for the design
mapping).
"""

__version__ = "0.1.0"

from .base import types
from .base import accessor
from .base import exceptions
from .base.types import precision_reduction
from .base.precision_dispatch import (
    precision_dispatch,
    precision_dispatch_advanced,
)
from .base.index_set import IndexSet
from .base.linop import LinOp, Combination, Composition, Perturbation
from .base.matrix_data import MatrixData, DeviceMatrixData
from .base.executor import (
    Executor,
    ReferenceExecutor,
    OmpExecutor,
    TpuExecutor,
    MeshExecutor,
    default_executor,
)

from .matrix.dense import Dense
from .matrix.csr import Csr
from .matrix.coo import Coo
from .matrix.dia import Dia
from .matrix.ell import Ell, Sellp
from .matrix.hybrid import Hybrid
from .matrix.fbcsr import Fbcsr
from .matrix.bell import Bell
from .matrix.pell import Pell
from .matrix.well import Well
from .matrix.auto import choose_format
from .matrix.sparsity_csr import SparsityCsr
from .matrix.fft import Fft, Fft2, Fft3
from .matrix.diagonal import Diagonal, Identity, IdentityFactory, Permutation, RowGatherer

from .io.mtx_io import (
    read,
    write,
    read_raw,
    write_raw,
    read_binary_raw,
    write_binary_raw,
    layout_type,
)

from .log import logger as log
from .utils import generators

from . import stop
from . import solver
from . import preconditioner
from . import factorization
from . import multigrid
from . import reorder
from .solver import Cg, Fcg, Ir, Richardson, Bicgstab, Cgs, Bicg, Gmres, CbGmres, Idr, Multigrid, Direct
from .preconditioner import Jacobi, JacobiFactory

__all__ = [
    "types",
    "precision_reduction",
    "LinOp",
    "Combination",
    "Composition",
    "Perturbation",
    "MatrixData",
    "DeviceMatrixData",
    "Executor",
    "ReferenceExecutor",
    "OmpExecutor",
    "TpuExecutor",
    "MeshExecutor",
    "default_executor",
    "Dense",
    "Csr",
    "Coo",
    "Dia",
    "Ell",
    "Sellp",
    "Hybrid",
    "Fbcsr",
    "Bell",
    "choose_format",
    "SparsityCsr",
    "Fft",
    "Fft2",
    "Fft3",
    "Richardson",
    "Bicgstab",
    "Cgs",
    "Bicg",
    "Gmres",
    "CbGmres",
    "Idr",
    "Multigrid",
    "Direct",
    "Diagonal",
    "Identity",
    "IdentityFactory",
    "Permutation",
    "RowGatherer",
    "read",
    "write",
    "read_raw",
    "write_raw",
    "read_binary_raw",
    "write_binary_raw",
    "layout_type",
    "log",
    "generators",
]

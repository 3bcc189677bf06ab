from .jacobi import Jacobi, JacobiFactory, find_natural_blocks
from .ilu import (
    Ilu,
    Ic,
    IluPreconditioner,
    IluPreconditionerFactory,
    IcPreconditionerFactory,
)
from .isai import Isai, IsaiFactory, LowerIsai, UpperIsai, GeneralIsai, SpdIsai

__all__ = [
    "Jacobi",
    "JacobiFactory",
    "find_natural_blocks",
    "Ilu",
    "Ic",
    "IluPreconditioner",
    "IluPreconditionerFactory",
    "IcPreconditionerFactory",
    "Isai",
    "IsaiFactory",
    "LowerIsai",
    "UpperIsai",
    "GeneralIsai",
    "SpdIsai",
]

from .pgm import (
    Pgm,
    PgmFactory,
    FixedCoarsening,
    FixedCoarseningFactory,
    MultigridLevel,
    Prolongation,
    Restriction,
)

__all__ = [
    "Pgm",
    "PgmFactory",
    "FixedCoarsening",
    "FixedCoarseningFactory",
    "MultigridLevel",
    "Prolongation",
    "Restriction",
]

from .criterion import (
    Criterion,
    Iteration,
    Time,
    ResidualNorm,
    ImplicitResidualNorm,
    Combined,
    combine,
    default_criteria,
)

__all__ = [
    "Criterion",
    "Iteration",
    "Time",
    "ResidualNorm",
    "ImplicitResidualNorm",
    "Combined",
    "combine",
    "default_criteria",
]

from .rcm import Rcm, RcmFactory, rcm_permutation, bandwidth
from .scaled_reordered import ScaledReordered, ScaledReorderedFactory

__all__ = [
    "Rcm",
    "RcmFactory",
    "rcm_permutation",
    "bandwidth",
    "ScaledReordered",
    "ScaledReorderedFactory",
]

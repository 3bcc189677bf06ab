from .rcm import Rcm, RcmFactory, rcm_permutation, bandwidth
from .nd import NestedDissection, NestedDissectionFactory, nd_permutation
from .scaled_reordered import ScaledReordered, ScaledReorderedFactory

__all__ = [
    "Rcm",
    "RcmFactory",
    "rcm_permutation",
    "bandwidth",
    "NestedDissection",
    "NestedDissectionFactory",
    "nd_permutation",
    "ScaledReordered",
    "ScaledReorderedFactory",
]

from .jacobi import Jacobi, JacobiFactory, find_natural_blocks

__all__ = ["Jacobi", "JacobiFactory", "find_natural_blocks"]

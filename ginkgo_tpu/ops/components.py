"""Reusable kernel components.

Reference: core/components/ — prefix_sum_kernels.hpp, fill_array,
reduce_array, absolute_array, precision_conversion, format_conversion
(row-ptr <-> row-idx) and disjoint_sets.hpp (union-find for symbolic
factorization).  Implemented 5x per backend there; here each is one XLA
expression (the per-backend warp/atomic machinery of
cuda/components/*.cuh dissolves into vector-register semantics).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def prefix_sum_nonnegative(a):
    """Exclusive prefix sum (prefix_sum_kernels.hpp) — the backbone of the
    format conversions; returns array of same length where out[0] = 0."""
    c = jnp.cumsum(a, axis=0)
    return jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)


def inclusive_prefix_sum(a):
    return jnp.cumsum(a, axis=0)


def fill_array(shape, value, dtype=None):
    """fill_array kernel."""
    return jnp.full(shape, value, dtype=dtype)


def fill_seq_array(n, dtype=jnp.int32):
    """fill_seq_array kernel (iota)."""
    return jnp.arange(n, dtype=dtype)


def reduce_add_array(a, init=0):
    """reduce_add_array kernel."""
    return jnp.sum(a) + init


def max_array(a):
    return jnp.max(a)


def absolute_array(a):
    """outplace absolute (absolute_array kernels)."""
    return jnp.abs(a)


def convert_precision(a, dtype):
    """precision_conversion kernel: plain dtype cast."""
    return jnp.asarray(a).astype(dtype)


def convert_ptrs_to_idxs(ptrs, num_entries: int):
    """row_ptrs -> row_idxs (components/format_conversion_kernels.hpp)."""
    from .spmv import row_ids_from_ptrs

    return row_ids_from_ptrs(ptrs, num_entries)


def convert_idxs_to_ptrs(idxs, num_rows: int, dtype=jnp.int32):
    """row_idxs -> row_ptrs via bincount + exclusive scan."""
    counts = jnp.bincount(
        jnp.asarray(idxs).astype(jnp.int32), length=num_rows
    ).astype(dtype)
    c = jnp.cumsum(counts)
    return jnp.concatenate([jnp.zeros((1,), dtype), c.astype(dtype)])


class DisjointSets:
    """Union-find with path halving + union by size
    (core/components/disjoint_sets.hpp; host-side, used by the symbolic
    factorization's elimination forest)."""

    def __init__(self, size: int):
        self.parent = np.full(size, -1, dtype=np.int64)  # negative = -size

    def is_representative(self, x) -> bool:
        return self.parent[x] < 0

    def find(self, x: int) -> int:
        p = self.parent
        while p[x] >= 0:
            # path halving
            if p[p[x]] >= 0:
                p[x] = p[p[x]]
            x_next = p[x]
            if x_next < 0:
                break
            x = x_next
        return x

    def size_of(self, x: int) -> int:
        return int(-self.parent[self.find(x)])

    def join(self, a: int, b: int) -> int:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return ra
        # union by size: attach smaller under larger
        if -self.parent[ra] < -self.parent[rb]:
            ra, rb = rb, ra
        self.parent[ra] += self.parent[rb]
        self.parent[rb] = ra
        return ra

    def __len__(self):
        return len(self.parent)

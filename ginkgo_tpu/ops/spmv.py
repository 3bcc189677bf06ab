"""Sparse matrix-vector product kernels (XLA strategies).

TPU-native re-design of the reference's per-format SpMV kernel families
(reference: cuda/matrix/csr_kernels.cu merge_path :121-186 / classical
:228-272 / load_balance :276-310 / sparselib :332-386; coo SpMV
common/cuda_hip/matrix/coo_kernels.hpp.inc; ell/sellp kernels).  The CUDA
strategies exist to balance ragged rows across warps; on TPU the analogous
problem is keeping the gather of x and the row reduction *static-shaped and
vectorized*.  Strategies here:

- ``classical``    take(x, cols) + sorted segment-sum over rows.  nnz-balanced
                   by construction (the nnz stream is the parallel axis), so it
                   subsumes the reference's load_balance.
- ``merge_path``   take + cumsum-difference: y[r] = cs[ptr[r+1]-1]-cs[ptr[r]-1].
                   One associative scan over the nnz stream + two row gathers;
                   no scatter at all.  The TPU cousin of Merrill-Garland.
- ``sparselib``    jax.experimental.sparse BCOO matmul — the "vendor library"
                   binding, like cuSPARSE in the reference.
- ELL/SELL-P       fully static padded forms (their own functions below); the
                   preferred TPU forms for skew-free matrices.

All functions take raw arrays (not LinOps) so they are shared by single-device
and shard_map distributed paths, and work under vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def row_ids_from_ptrs(row_ptrs: jnp.ndarray, nnz: int) -> jnp.ndarray:
    """Expand CSR row_ptrs to one row id per stored entry.

    Analog of the reference's csr row_ptr → srow/row-index expansion
    (core/components/format_conversion kernels)."""
    k = jnp.arange(nnz, dtype=row_ptrs.dtype)
    return jnp.searchsorted(row_ptrs[1:-1], k, side="right").astype(row_ptrs.dtype)


def _products(values, col_idxs, x):
    """values: (nnz,), col_idxs: (nnz,), x: (m,) or (m, k) -> (nnz[,k])."""
    xg = jnp.take(x, col_idxs, axis=0)
    if x.ndim == 1:
        return values * xg
    return values[:, None] * xg


def csr_spmv_classical(row_ptrs, col_idxs, values, x, n_rows: int):
    """take + sorted segment-sum (reference classical/load_balance analog)."""
    nnz = values.shape[0]
    if nnz == 0:
        out_shape = (n_rows,) if x.ndim == 1 else (n_rows, x.shape[1])
        return jnp.zeros(out_shape, dtype=jnp.result_type(values.dtype, x.dtype))
    rids = row_ids_from_ptrs(row_ptrs, nnz)
    prod = _products(values, col_idxs, x)
    return jax.ops.segment_sum(
        prod, rids, num_segments=n_rows, indices_are_sorted=True
    )


def csr_spmv_merge_path(row_ptrs, col_idxs, values, x, n_rows: int):
    """Scatter-free: cumulative sum over the nnz stream, then row-boundary
    differences.  y[r] = cs[ptr[r+1]] - cs[ptr[r]] with cs exclusive-prefixed.
    """
    nnz = values.shape[0]
    if nnz == 0:
        out_shape = (n_rows,) if x.ndim == 1 else (n_rows, x.shape[1])
        return jnp.zeros(out_shape, dtype=jnp.result_type(values.dtype, x.dtype))
    prod = _products(values, col_idxs, x)
    cs = jnp.cumsum(prod, axis=0)
    zero = jnp.zeros_like(cs[:1])
    cs = jnp.concatenate([zero, cs], axis=0)  # exclusive at row starts
    ptr = row_ptrs.astype(jnp.int32)
    return jnp.take(cs, ptr[1:], axis=0) - jnp.take(cs, ptr[:-1], axis=0)


def coo_spmv(rows, cols, values, x, n_rows: int, sorted_rows: bool = True):
    """COO SpMV (reference common/cuda_hip/matrix/coo_kernels.hpp.inc)."""
    if values.shape[0] == 0:
        out_shape = (n_rows,) if x.ndim == 1 else (n_rows, x.shape[1])
        return jnp.zeros(out_shape, dtype=jnp.result_type(values.dtype, x.dtype))
    prod = _products(values, cols, x)
    return jax.ops.segment_sum(
        prod, rows, num_segments=n_rows, indices_are_sorted=sorted_rows
    )


def ell_spmv(col_idxs, values, x, n_rows: int):
    """ELL SpMV: values/col_idxs are (n, K) padded (pad value 0, pad col 0).

    y = sum_k values[:, k] * x[col_idxs[:, k]] — every take is a static
    embedding-style row gather (reference: ell subwarp-per-row kernel)."""
    xg = jnp.take(x, col_idxs, axis=0)  # (n, K[, k])
    if x.ndim == 1:
        return jnp.sum(values * xg, axis=1)
    return jnp.einsum("nK,nKc->nc", values, xg)


def sellp_spmv(slice_sets, col_idxs, values, x, n_rows: int, slice_size: int):
    """SELL-P SpMV.

    Storage: slices of `slice_size` rows; slice s owns slot-rows
    slice_sets[s]:slice_sets[s+1] of the (total_slots, slice_size) arrays,
    one slot-row = one padded "column" across the slice's rows
    (reference sellp.hpp:45-47 layout, slice-local padding via slice_sets).
    The per-slice ragged reduction is a sorted segment-sum over slot-rows.
    """
    total_slots = values.shape[0]
    num_slices = slice_sets.shape[0] - 1
    if total_slots == 0:
        out_shape = (n_rows,) if x.ndim == 1 else (n_rows, x.shape[1])
        return jnp.zeros(out_shape, dtype=jnp.result_type(values.dtype, x.dtype))
    slot_ids = row_ids_from_ptrs(slice_sets, total_slots)
    xg = jnp.take(x, col_idxs, axis=0)  # (slots, C[, k])
    prod = values[..., None] * xg if x.ndim > 1 else values * xg
    per_slice = jax.ops.segment_sum(
        prod, slot_ids, num_segments=num_slices, indices_are_sorted=True
    )  # (num_slices, C[, k])
    flat = per_slice.reshape((num_slices * slice_size,) + per_slice.shape[2:])
    return flat[:n_rows]


def dense_row_scale(diag, x):
    return diag[:, None] * x if x.ndim > 1 else diag * x


# -- advanced (alpha*A@b + beta*c) wrappers ----------------------------------


def advanced(spmv_out, alpha, beta, c):
    a = jnp.asarray(alpha).reshape(())
    b = jnp.asarray(beta).reshape(())
    return a * spmv_out + b * c


def try_streaming(op, arr):
    """Generic TPU streaming fast path for unstructured formats — one
    cached PELL-plan Pallas kernel replacing the reference's per-format
    CUDA kernel families (see ops.spmv_pallas.linop_streaming_spmv).
    Returns the SpMV result or None (caller falls back to its XLA
    strategy).  Lazy import keeps the XLA strategies importable without
    Pallas."""
    from . import spmv_pallas

    return spmv_pallas.linop_streaming_spmv(op, arr)

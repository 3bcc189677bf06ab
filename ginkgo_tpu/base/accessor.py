"""Accessor library: storage-vs-arithmetic precision decoupling.

Reference: accessor/ (3.7 kLoC header-only C++) — `range<Accessor>`
(range.hpp:48) with `row_major`, `block_col_major`, `reduced_row_major`
(on-the-fly precision conversion on load/store) and
`scaled_reduced_row_major` (per-entry scale factors for integer storage);
this is the machinery behind CB-GMRES's compressed Krylov basis
(core/solver/cb_gmres_accessor.hpp:53-97).

On TPU the analog is a dtype-converting view: data lives in a storage
dtype (bf16/f16/int8/int16) and every read converts to the arithmetic
dtype (f32/f64) — conversions fuse into the consuming XLA op, so a read
costs only the reduced storage bandwidth, exactly like the reference's
accessor loads.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .linop import linop_dataclass, static_field
from . import types


@linop_dataclass
class ReducedRowMajor:
    """reduced_row_major analog: storage in `storage` (any shape), reads
    return `arith_dtype`, writes round to the storage dtype."""

    storage: jnp.ndarray
    arith_dtype: object = static_field(default=jnp.float32)

    @staticmethod
    def create(values, storage_dtype=None, arith_dtype=None):
        arith = arith_dtype or values.dtype
        sdt = storage_dtype or types.reduce_precision(arith)
        return ReducedRowMajor(
            storage=jnp.asarray(values).astype(sdt), arith_dtype=arith
        )

    @property
    def shape(self):
        return self.storage.shape

    @property
    def storage_dtype(self):
        return self.storage.dtype

    def read(self, idx=Ellipsis):
        return self.storage[idx].astype(self.arith_dtype)

    def write(self, idx, values):
        return dataclasses.replace(
            self,
            storage=self.storage.at[idx].set(
                jnp.asarray(values).astype(self.storage.dtype)
            ),
        )


@linop_dataclass
class ScaledReducedRowMajor:
    """scaled_reduced_row_major analog: integer storage with a per-row
    (last-axis-broadcast) scale so value = scale * int_storage.  Used for
    the CB-GMRES `integer`/`ireduce*` modes."""

    storage: jnp.ndarray  # integer dtype
    scale: jnp.ndarray  # broadcastable to storage.shape
    arith_dtype: object = static_field(default=jnp.float32)

    @staticmethod
    def create(values, storage_dtype=jnp.int16, arith_dtype=None, axis=-1):
        arith = arith_dtype or values.dtype
        v = jnp.asarray(values).astype(arith)
        info = jnp.iinfo(storage_dtype)
        amax = jnp.max(jnp.abs(v), axis=axis, keepdims=True)
        scale = jnp.where(amax > 0, amax / info.max, 1.0).astype(arith)
        q = jnp.clip(jnp.round(v / scale), info.min, info.max).astype(storage_dtype)
        return ScaledReducedRowMajor(storage=q, scale=scale, arith_dtype=arith)

    @property
    def shape(self):
        return self.storage.shape

    def read(self, idx=Ellipsis):
        return (
            self.storage[idx].astype(self.arith_dtype)
            * jnp.broadcast_to(self.scale, self.storage.shape)[idx]
        )

    def write(self, idx, values):
        # re-quantize against the existing scale (reference semantics:
        # scale is set per write_scale call, not per element write)
        v = jnp.asarray(values).astype(self.arith_dtype)
        s = jnp.broadcast_to(self.scale, self.storage.shape)[idx]
        info = jnp.iinfo(self.storage.dtype)
        q = jnp.clip(jnp.round(v / s), info.min, info.max).astype(self.storage.dtype)
        return dataclasses.replace(self, storage=self.storage.at[idx].set(q))


def row_major(values):
    """range<row_major> analog — a plain array view (row-major is jnp's
    native layout)."""
    return jnp.asarray(values)


def block_col_major(values, block_size: int):
    """block_col_major analog: (rows, cols) -> (nblocks, cols, block_size)
    so each block's columns are contiguous (the reference uses this for
    block-Jacobi storage)."""
    v = jnp.asarray(values)
    n, m = v.shape
    nb = -(-n // block_size)
    pad = nb * block_size - n
    if pad:
        v = jnp.pad(v, ((0, pad), (0, 0)))
    return v.reshape(nb, block_size, m).transpose(0, 2, 1)

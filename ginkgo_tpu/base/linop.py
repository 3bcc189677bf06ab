"""LinOp protocol — the universal "y = Op(x)" abstraction.

TPU-native re-design of the reference's LinOp hierarchy
(reference: include/ginkgo/core/base/lin_op.hpp:146-881).  The reference
needs PolymorphicObject + Executor double-dispatch because C++ has no JIT;
here a LinOp is a *pytree dataclass*: its array fields are JAX leaves (so an
operator can flow through jit/vmap/shard_map/lax.while_loop), its shape and
strategy knobs are static aux data.  `apply` is traceable and dtype
polymorphic, which replaces the whole Operation/GKO_REGISTER_OPERATION
machinery (executor.hpp:286-510).

Capability mixins of the reference (Transposable lin_op.hpp:456, Permutable
:507, DiagonalExtractable :748, AbsoluteComputable :771, ScaledIdentityAddable
:823) become optional duck-typed methods; `ConvertibleTo<X>` becomes
``to_<x>()`` methods.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp


def linop_dataclass(cls):
    """Register a dataclass as a JAX pytree.

    Fields with ``metadata={'static': True}`` become aux (hashable) data;
    everything else is a child leaf.  This is the whole replacement for
    EnablePolymorphicObject / EnableCreateMethod (polymorphic_object.hpp).
    """
    cls = dataclasses.dataclass(frozen=True, eq=False)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


def static_field(**kw):
    return dataclasses.field(metadata={"static": True}, **kw)


def _not_implemented():
    from .exceptions import NotImplementedError_

    return NotImplementedError_("operation not implemented for this type")


class LinOp:
    """Duck-typed base. Concrete ops are frozen pytree dataclasses."""

    # abstract surface raises the taxonomy's NotImplemented analog
    # (exception.hpp NotImplemented; base/exceptions.py)

    # -- core protocol ------------------------------------------------------

    @property
    def shape(self) -> tuple[int, int]:
        raise _not_implemented()

    @property
    def dtype(self):
        raise _not_implemented()

    def apply(self, b):
        """x = self @ b.  b: (m,) or (m, k) array (or Dense)."""
        raise _not_implemented()

    def apply_advanced(self, alpha, b, beta, x):
        """x := alpha * self @ b + beta * x  (reference lin_op.hpp:236)."""
        return alpha * self.apply(b) + beta * _values_of(x)

    def __matmul__(self, b):
        return self.apply(b)

    # -- generic helpers ----------------------------------------------------

    @property
    def size(self) -> tuple[int, int]:
        return self.shape

    def replace(self, **changes):
        return dataclasses.replace(self, **changes)


def _values_of(x):
    """Accept raw arrays or Dense-like wrappers."""
    return getattr(x, "values", x)


def as_2d(b):
    """Normalize vector input to (n, k); return (array, was_1d)."""
    arr = _values_of(b)
    if arr.ndim == 1:
        return arr[:, None], True
    return arr, False


def restore_1d(x, was_1d):
    return x[:, 0] if was_1d else x


# ---------------------------------------------------------------------------
# Utility LinOps (reference: core/base/combination.hpp:59, composition.hpp:67,
# perturbation.hpp:67)
# ---------------------------------------------------------------------------


@linop_dataclass
class Combination(LinOp):
    """sum_i coef_i * op_i  (reference combination.hpp:59)."""

    coefficients: tuple  # scalars or (1,1) arrays
    operators: tuple  # LinOps, all same shape

    @property
    def shape(self):
        return self.operators[0].shape

    @property
    def dtype(self):
        return self.operators[0].dtype

    def apply(self, b):
        out = None
        for c, op in zip(self.coefficients, self.operators):
            term = jnp.asarray(c).reshape(()) * op.apply(b)
            out = term if out is None else out + term
        return out


@linop_dataclass
class Composition(LinOp):
    """op_0 ∘ op_1 ∘ ... (apply right-to-left; reference composition.hpp:67)."""

    operators: tuple

    @property
    def shape(self):
        return (self.operators[0].shape[0], self.operators[-1].shape[1])

    @property
    def dtype(self):
        return self.operators[0].dtype

    def apply(self, b):
        x = b
        for op in reversed(self.operators):
            x = op.apply(x)
        return x


@linop_dataclass
class Perturbation(LinOp):
    """identity + scalar * basis @ projector  (reference perturbation.hpp:67).

    basis: (n, k) array, projector: (k, n) LinOp/array."""

    scalar: Any
    basis: Any
    projector: Any

    @property
    def shape(self):
        n = self.basis.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self.basis.dtype

    def apply(self, b):
        arr, was_1d = as_2d(b)
        proj = (
            self.projector.apply(arr)
            if hasattr(self.projector, "apply")
            else self.projector @ arr
        )
        out = arr + jnp.asarray(self.scalar).reshape(()) * (self.basis @ proj)
        return restore_1d(out, was_1d)



"""Automatic argument precision conversion at apply boundaries.

Reference: core/base/precision_dispatch.hpp — `precision_dispatch<
ValueType>(fn, args...)` converts Dense arguments to the operator's value
type (make_temporary_conversion), runs the typed kernel, and writes the
result back in the caller's precision, so a float operator applied to
double vectors "just works".

TPU adaptation: conversion is a pure `astype` pair fused by XLA into the
surrounding computation (no temporary-clone bookkeeping needed — buffers
are immutable).  `precision_dispatch` wraps a single apply; the solver
entry (solver_base.IterativeSolverMixin.solve) uses `dispatch_dtype` to
run the whole solve in the operator's precision and hand back x/residual
norms in the caller's precision.

Real↔complex mixes follow the reference's `mixed_precision_dispatch`
constraint: a real operator accepts complex vectors by dispatching on
the real and imaginary parts separately (reference
precision_dispatch.hpp:167-219 real_complex_dispatch); a complex
operator applied to real vectors promotes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .linop import as_2d, restore_1d


def dispatch_dtype(op_dtype, arg_dtype):
    """The compute dtype the reference's dispatch would pick: always the
    OPERATOR's value type — arguments are converted to it
    (core/base/precision_dispatch.hpp; a real operator with complex
    vectors computes per-part in the operator's precision, which is the
    same rule)."""
    del arg_dtype  # the reference converts arguments, never the operator
    return jnp.dtype(op_dtype)


def precision_dispatch(apply_fn, op_dtype, b):
    """y = apply_fn(b) computed in the operator's precision.

    b may be any array (or Dense-like); the result is converted back to
    b's dtype.  A real operator applied to complex b dispatches real and
    imaginary parts separately (real_complex_dispatch analog)."""
    arr, was_1d = as_2d(b)
    op_dtype = jnp.dtype(op_dtype)
    if arr.dtype == op_dtype:
        return apply_fn(restore_1d(arr, was_1d))
    complex_arg = jnp.issubdtype(arr.dtype, jnp.complexfloating)
    complex_op = jnp.issubdtype(op_dtype, jnp.complexfloating)
    if complex_arg and not complex_op:
        re = apply_fn(restore_1d(arr.real.astype(op_dtype), was_1d))
        im = apply_fn(restore_1d(arr.imag.astype(op_dtype), was_1d))
        return (re + 1j * im).astype(arr.dtype)
    out = apply_fn(restore_1d(arr.astype(op_dtype), was_1d))
    return out.astype(arr.dtype)


def precision_dispatch_advanced(apply_advanced_fn, op_dtype, alpha, b, beta,
                                x):
    """x := alpha op b + beta x with arguments converted to the operator's
    precision and the result returned in x's precision."""
    barr, _ = as_2d(b)
    xarr, was_1d = as_2d(x)
    op_dtype = jnp.dtype(op_dtype)
    if barr.dtype == op_dtype and xarr.dtype == op_dtype:
        return apply_advanced_fn(alpha, b, beta, x)
    out = apply_advanced_fn(
        jnp.asarray(alpha).astype(op_dtype),
        barr.astype(op_dtype),
        jnp.asarray(beta).astype(op_dtype),
        xarr.astype(op_dtype),
    )
    return restore_1d(jnp.asarray(out).astype(xarr.dtype), was_1d)

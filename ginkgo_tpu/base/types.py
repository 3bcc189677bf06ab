"""Value/index type system.

TPU-native replacement for the reference's type-instantiation grid
(reference: include/ginkgo/core/base/types.hpp:451-461,
GKO_INSTANTIATE_FOR_EACH_VALUE_TYPE et al.).  In JAX there is no explicit
template instantiation: kernels are traced per dtype.  This module pins down
the supported grids (used by the typed test suites), precision helpers
(the analog of ``r<T>::value`` tolerances used throughout reference tests),
and storage-precision reduction used by the accessor layer / CB-GMRES
(reference: include/ginkgo/core/base/extended_float.hpp,
core/solver/cb_gmres_accessor.hpp:53-97).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# -- dtype grids ------------------------------------------------------------

#: Arithmetic value types (f64/c128 only usable with jax x64 enabled, e.g. in
#: the CPU test tier; TPU arithmetic tier is f32).
VALUE_TYPES = (jnp.float32, jnp.float64, jnp.complex64, jnp.complex128)
REAL_VALUE_TYPES = (jnp.float32, jnp.float64)
#: Storage-only types (accessor-decoupled storage; never arithmetic).
STORAGE_TYPES = (jnp.bfloat16, jnp.float16, jnp.int8)
INDEX_TYPES = (jnp.int32, jnp.int64)
LOCAL_INDEX_TYPES = (jnp.int32,)
GLOBAL_INDEX_TYPES = (jnp.int32, jnp.int64)

DEFAULT_VALUE_TYPE = jnp.float32
DEFAULT_INDEX_TYPE = jnp.int32


def canonical(dtype):
    """Normalize any dtype-like to a numpy dtype."""
    return np.dtype(dtype)


def is_complex(dtype) -> bool:
    return np.issubdtype(canonical(dtype), np.complexfloating)


def real_dtype(dtype):
    """remove_complex<T> analog (types.hpp `remove_complex`)."""
    d = canonical(dtype)
    if d == np.complex64:
        return np.dtype(np.float32)
    if d == np.complex128:
        return np.dtype(np.float64)
    return d


def complex_dtype(dtype):
    """to_complex<T> analog."""
    d = canonical(dtype)
    if d in (np.dtype(np.float32), np.dtype(np.float16), np.dtype(jnp.bfloat16)):
        return np.dtype(np.complex64)
    if d == np.float64:
        return np.dtype(np.complex128)
    return d


def eps(dtype) -> float:
    """Machine epsilon of the arithmetic (real) dtype."""
    return float(np.finfo(real_dtype(dtype)).eps)


def r_value(dtype) -> float:
    """Test-tolerance unit, analog of the reference's ``r<T>::value``
    (core/test/utils.hpp) = sqrt(eps) scaled bound used in GKO_ASSERT_MTX_NEAR.
    """
    return float(np.sqrt(eps(dtype)))


def reduce_precision(dtype):
    """One step of storage-precision reduction
    (reference: core/base/extended_float.hpp `reduce_precision`):
    f64 -> f32 -> bf16(half-analog); complex reduces its real part.
    bfloat16 is the TPU-native half format, so it replaces IEEE half here.
    """
    d = canonical(dtype)
    if d == np.float64:
        return np.dtype(np.float32)
    if d == np.float32:
        return np.dtype(jnp.bfloat16)
    if d == np.complex128:
        return np.dtype(np.complex64)
    return d  # bf16 / complex64 have no further reduction we store


class precision_reduction:
    """Encoded (preserving, nonpreserving) precision-reduction pair, analog of
    reference `precision_reduction` (types.hpp).  Used by adaptive block-Jacobi
    storage_optimization."""

    __slots__ = ("preserving", "nonpreserving")

    def __init__(self, preserving: int = 0, nonpreserving: int = 0):
        self.preserving = int(preserving)
        self.nonpreserving = int(nonpreserving)

    def storage_dtype(self, arithmetic_dtype):
        d = canonical(arithmetic_dtype)
        for _ in range(self.nonpreserving):
            d = reduce_precision(d)
        return d

    def __eq__(self, other):
        return (self.preserving, self.nonpreserving) == (
            other.preserving,
            other.nonpreserving,
        )

    def __hash__(self):
        return hash((self.preserving, self.nonpreserving))

    def __repr__(self):
        return f"precision_reduction({self.preserving},{self.nonpreserving})"

    @staticmethod
    def autodetect():
        return precision_reduction(-1, -1)


def to_host(x):
    """Device->host transfer with an axon-tunnel workaround.

    Reading back a buffer that was UPLOADED from host numpy and never
    produced by a device computation is pathologically slow through the
    tunnel (~40 KB/s — 21 MB took 534 s); a buffer that came out of any
    device computation reads back at ~12 MB/s.  Routing the read through a
    no-op add forces a computed buffer.  No-op for numpy inputs.

    Trace-safety: called on a CONCRETE array while some OUTER jit trace is
    active (e.g. host-side strategy resolution on a closure-captured
    matrix), the no-op add would be STAGED into the trace and return a
    tracer — so when that happens the original concrete buffer is read
    directly instead (the workaround only matters for tunnel readbacks,
    which never happen mid-trace).
    """
    import jax
    import jax.numpy as jnp
    import numpy as _np

    if isinstance(x, jax.Array) and not isinstance(x, jax.core.Tracer):
        try:
            y = x + jnp.zeros((), x.dtype)
        except TypeError:  # e.g. bool
            y = jnp.logical_or(x, False)
        if not isinstance(y, jax.core.Tracer):
            x = y
    return _np.asarray(x)

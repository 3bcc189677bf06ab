"""ctypes binding to the native C++ IO runtime (native/mtx_native.cpp).

Reference analog: core/base/mtx_io.cpp (C++ MatrixMarket parser) and the
binary format of mtx_io.hpp:96 / benchmark/tools/mtx_to_binary.cpp.  The
shared library is built on demand with the repo Makefile (native/Makefile);
every entry point degrades gracefully to the pure-Python parser in
mtx_io.py when the toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..base.matrix_data import MatrixData

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libginkgo_tpu_native.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


class _GkoParseResult(ctypes.Structure):
    _fields_ = [
        ("nrows", ctypes.c_int64),
        ("ncols", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("is_complex", ctypes.c_int32),
        ("rows", ctypes.POINTER(ctypes.c_int64)),
        ("cols", ctypes.POINTER(ctypes.c_int64)),
        ("values", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_char * 256),
    ]


def _build() -> bool:
    if not os.path.isdir(_NATIVE_DIR):
        return False
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_SO_PATH) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _lib_failed = True
            return None
        lib.gko_read_mtx.argtypes = [ctypes.c_char_p, ctypes.POINTER(_GkoParseResult)]
        lib.gko_read_mtx.restype = ctypes.c_int
        lib.gko_read_binary.argtypes = [ctypes.c_char_p, ctypes.POINTER(_GkoParseResult)]
        lib.gko_read_binary.restype = ctypes.c_int
        lib.gko_write_binary.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.gko_write_binary.restype = ctypes.c_int
        lib.gko_free_result.argtypes = [ctypes.POINTER(_GkoParseResult)]
        lib.gko_free_result.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _result_to_matrix_data(lib, res: _GkoParseResult) -> MatrixData:
    try:
        nnz = res.nnz
        rows = np.ctypeslib.as_array(res.rows, shape=(nnz,)).copy() if nnz else np.zeros(0, np.int64)
        cols = np.ctypeslib.as_array(res.cols, shape=(nnz,)).copy() if nnz else np.zeros(0, np.int64)
        if res.is_complex:
            raw = (
                np.ctypeslib.as_array(res.values, shape=(2 * nnz,)).copy()
                if nnz
                else np.zeros(0, np.float64)
            )
            vals = raw[0::2] + 1j * raw[1::2]
        else:
            vals = (
                np.ctypeslib.as_array(res.values, shape=(nnz,)).copy()
                if nnz
                else np.zeros(0, np.float64)
            )
        return MatrixData.from_coo(
            (int(res.nrows), int(res.ncols)), rows, cols, vals
        )
    finally:
        lib.gko_free_result(ctypes.byref(res))


def read_raw_native(path: str) -> MatrixData:
    """Parse a MatrixMarket file with the native parser (pre-sorted
    row-major by the C++ side)."""
    from ..base.exceptions import NotCompiled

    lib = load()
    if lib is None:
        raise NotCompiled("native IO library unavailable")
    res = _GkoParseResult()
    rc = lib.gko_read_mtx(path.encode(), ctypes.byref(res))
    if rc != 0:
        err = res.error.decode(errors="replace")
        raise ValueError(f"native mtx parse failed: {err}")
    return _result_to_matrix_data(lib, res)


def read_binary_native(path: str) -> MatrixData:
    from ..base.exceptions import NotCompiled

    lib = load()
    if lib is None:
        raise NotCompiled("native IO library unavailable")
    res = _GkoParseResult()
    rc = lib.gko_read_binary(path.encode(), ctypes.byref(res))
    if rc != 0:
        err = res.error.decode(errors="replace")
        raise ValueError(f"native binary read failed: {err}")
    return _result_to_matrix_data(lib, res)


def write_binary_native(path: str, data: MatrixData) -> None:
    from ..base.exceptions import NotCompiled

    lib = load()
    if lib is None:
        raise NotCompiled("native IO library unavailable")
    rows = np.ascontiguousarray(data.rows, dtype=np.int64)
    cols = np.ascontiguousarray(data.cols, dtype=np.int64)
    is_cpx = np.issubdtype(data.values.dtype, np.complexfloating)
    if is_cpx:
        vals = np.ascontiguousarray(data.values, dtype=np.complex128).view(np.float64)
    else:
        vals = np.ascontiguousarray(data.values, dtype=np.float64)
    rc = lib.gko_write_binary(
        path.encode(),
        int(data.shape[0]),
        int(data.shape[1]),
        int(data.nnz),
        1 if is_cpx else 0,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise IOError(f"native binary write failed: {path}")


# -- PELL plan builder (native/pell_plan.cpp) ---------------------------------


def _bind_pell(lib):
    if getattr(lib, "_pell_bound", False):
        return True
    try:
        lib.gko_pell_plan_build.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.gko_pell_plan_build.restype = ctypes.c_int
        lib.gko_pell_plan_sizes.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gko_pell_plan_sizes.restype = None
        lib.gko_pell_plan_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gko_pell_plan_fill.restype = ctypes.c_int
        lib.gko_pell_plan_free.argtypes = [ctypes.c_void_p]
        lib.gko_pell_plan_free.restype = None
        try:
            lib.gko_pell_plan_retarget.argtypes = [
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.gko_pell_plan_retarget.restype = ctypes.c_int
        except AttributeError:
            pass  # older .so: auto-G falls back to fixed G
        lib._pell_bound = True
        return True
    except AttributeError:
        return False


def pell_plan_native(indptr, indices, n_cols: int, G, S: int, *,
                     stats_only: bool = False, bytes_per_cell: int = 8):
    """Native PELL layout planning (native/pell_plan.cpp): fused decode
    + one index sort instead of ~20 numpy passes.  Returns None when the
    native library is unavailable, else a dict with NT/NP/total_slots/
    n_steps/G (+ per-nnz gslot/srow/lane/q, bases, tile_of_step when not
    stats_only).

    G may be a tuple of candidates: the plan is built once, the
    G-dependent padding retargeted per candidate (O(NT) each, no
    re-sort), and the winner of the grid-overhead-vs-padded-traffic cost
    model (spmv_pallas._g_cost) is kept."""
    lib = load()
    if lib is None or not _bind_pell(lib):
        return None
    candidates = tuple(G) if isinstance(G, (tuple, list)) else (int(G),)
    if len(candidates) > 1 and not hasattr(lib, "gko_pell_plan_retarget"):
        candidates = (candidates[0],)
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    n_rows = len(indptr) - 1

    def pp(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    handle = ctypes.c_void_p()
    rc = lib.gko_pell_plan_build(
        pp(indptr, ctypes.c_int64), pp(indices, ctypes.c_int64),
        ctypes.c_int64(n_rows), ctypes.c_int64(int(n_cols)),
        ctypes.c_int32(candidates[0]), ctypes.c_int32(S),
        ctypes.byref(handle),
    )
    if rc != 0:
        return None
    try:
        ts = ctypes.c_int64()
        ns = ctypes.c_int64()
        nt = ctypes.c_int64()
        npn = ctypes.c_int64()

        def sizes():
            lib.gko_pell_plan_sizes(
                handle, ctypes.byref(ts), ctypes.byref(ns),
                ctypes.byref(nt), ctypes.byref(npn),
            )
            return ts.value, ns.value

        g_pick = candidates[0]
        if len(candidates) > 1:
            from ..ops.spmv_pallas import _g_cost

            best = None
            for g in candidates:
                lib.gko_pell_plan_retarget(handle, ctypes.c_int32(g))
                slots, steps = sizes()
                c = _g_cost(steps, slots, S, bytes_per_cell)
                if best is None or c < best[0]:
                    best = (c, g)
            g_pick = best[1]
            lib.gko_pell_plan_retarget(handle, ctypes.c_int32(g_pick))
        slots_v, steps_v = sizes()
        out = dict(total_slots=slots_v, n_steps=steps_v, NT=nt.value,
                   NP=npn.value, G=g_pick)
        if stats_only:
            return out
        nnz = len(indices)
        gslot = np.empty(nnz, np.int64)
        srow = np.empty(nnz, np.int32)
        lane = np.empty(nnz, np.int32)
        q = np.empty(nnz, np.int32)
        bases = np.empty(max(ts.value, 1), np.int32)
        tile_of_step = np.empty(max(ns.value, 1), np.int32)
        rc = lib.gko_pell_plan_fill(
            handle, pp(indptr, ctypes.c_int64),
            pp(indices, ctypes.c_int64), pp(gslot, ctypes.c_int64),
            pp(srow, ctypes.c_int32), pp(lane, ctypes.c_int32),
            pp(q, ctypes.c_int32), pp(bases, ctypes.c_int32),
            pp(tile_of_step, ctypes.c_int32),
        )
        if rc != 0:
            return None
        out.update(gslot=gslot, srow=srow, lane=lane, q=q,
                   bases=bases[:ts.value],
                   tile_of_step=tile_of_step[:ns.value])
        return out
    finally:
        lib.gko_pell_plan_free(handle)


# -- sparse Cholesky (native/cholesky.cpp) ------------------------------------


def _bind_chol(lib):
    if getattr(lib, "_chol_bound", False):
        return True
    try:
        lib.gko_chol_factor.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gko_chol_factor.restype = ctypes.c_int
        lib.gko_chol_sizes.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gko_chol_sizes.restype = None
        lib.gko_chol_fill.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.gko_chol_fill.restype = None
        lib.gko_chol_free.argtypes = [ctypes.c_void_p]
        lib.gko_chol_free.restype = None
        lib._chol_bound = True
        return True
    except AttributeError:
        return False


class NotPositiveDefinite(RuntimeError):
    """Cholesky breakdown: non-positive pivot at the reported row."""


def sparse_cholesky_native(indptr, indices, values):
    """Up-looking sparse LL^T of a full symmetric CSR (native/cholesky.cpp).

    Returns (col_ptr, row_idx, val) of L in CSC (equivalently, CSR of
    L^T), or None when the native library is unavailable.  Raises
    NotPositiveDefinite on breakdown.  O(flops(L)) time / O(nnz(L))
    memory — the reference's cholesky_kernels role
    (core/factorization/cholesky_kernels.hpp)."""
    lib = load()
    if lib is None or not _bind_chol(lib):
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    values = np.ascontiguousarray(values, np.float64)
    n = len(indptr) - 1

    def pp(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    handle = ctypes.c_void_p()
    info = ctypes.c_int64()
    rc = lib.gko_chol_factor(
        ctypes.c_int64(n), pp(indptr, ctypes.c_int64),
        pp(indices, ctypes.c_int64), pp(values, ctypes.c_double),
        ctypes.byref(handle), ctypes.byref(info),
    )
    if rc == 1:
        raise NotPositiveDefinite(
            f"matrix is not positive definite (breakdown at row "
            f"{info.value})"
        )
    if rc != 0:
        return None
    try:
        n_out = ctypes.c_int64()
        lnnz = ctypes.c_int64()
        lib.gko_chol_sizes(handle, ctypes.byref(n_out), ctypes.byref(lnnz))
        col_ptr = np.empty(n + 1, np.int64)
        row_idx = np.empty(max(lnnz.value, 1), np.int64)
        val = np.empty(max(lnnz.value, 1), np.float64)
        lib.gko_chol_fill(
            handle, pp(col_ptr, ctypes.c_int64),
            pp(row_idx, ctypes.c_int64), pp(val, ctypes.c_double),
        )
        return col_ptr, row_idx[:lnnz.value], val[:lnnz.value]
    finally:
        lib.gko_chol_free(handle)

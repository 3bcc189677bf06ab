"""MatrixMarket + binary IO.

Reference: core/base/mtx_io.cpp, include/ginkgo/core/base/mtx_io.hpp
(read_raw :61, read_binary_raw :96, gko::read :188, layout_type :121).
Supports coordinate/array layouts × real/complex/integer/pattern fields ×
general/symmetric/skew-symmetric/hermitian symmetries.  The fast binary
format maps to a .npz container (portable + mmap-able), plus the
mtx_to_binary converter tool (benchmark/tools/mtx_to_binary.cpp analog in
benchmark/tools.py)."""

from __future__ import annotations

import io
import numpy as np

from ..base.matrix_data import MatrixData


class layout_type:
    array = "array"
    coordinate = "coordinate"


def read_raw(source) -> MatrixData:
    """Parse MatrixMarket text into MatrixData (mtx_io.hpp:61).

    File paths go through the native C++ parser (native/mtx_native.cpp,
    the analog of the reference's C++ core/base/mtx_io.cpp) when the
    shared library is available; stream inputs and fallback use the
    pure-Python parser below."""
    if isinstance(source, (str,)):
        import os

        if not os.environ.get("GINKGO_TPU_NO_NATIVE"):
            from . import native

            if native.available():
                try:
                    return native.read_raw_native(source).sort_row_major()
                except ValueError:
                    pass  # fall through to the Python parser for diagnostics
        with open(source, "r") as f:
            lines = f.read().splitlines()
    elif isinstance(source, io.IOBase) or hasattr(source, "read"):
        content = source.read()
        if isinstance(content, bytes):
            content = content.decode()
        lines = content.splitlines()
    else:
        raise TypeError(type(source))

    if not lines or not lines[0].startswith("%%MatrixMarket"):
        raise ValueError("missing MatrixMarket banner")
    banner = lines[0].split()
    # %%MatrixMarket matrix <layout> <field> <symmetry>
    if len(banner) < 5 or banner[1].lower() != "matrix":
        raise ValueError(f"bad banner: {lines[0]}")
    layout, field, symmetry = (
        banner[2].lower(),
        banner[3].lower(),
        banner[4].lower(),
    )

    body = [ln for ln in lines[1:] if ln.strip() and not ln.lstrip().startswith("%")]
    header = body[0].split()
    if layout == "coordinate":
        nrows, ncols, nnz = int(header[0]), int(header[1]), int(header[2])
        entries = body[1 : 1 + nnz]
        rows = np.empty(nnz, dtype=np.int64)
        cols = np.empty(nnz, dtype=np.int64)
        if field == "pattern":
            vals = np.ones(nnz, dtype=np.float64)
            for i, ln in enumerate(entries):
                p = ln.split()
                rows[i], cols[i] = int(p[0]) - 1, int(p[1]) - 1
        elif field == "complex":
            vals = np.empty(nnz, dtype=np.complex128)
            for i, ln in enumerate(entries):
                p = ln.split()
                rows[i], cols[i] = int(p[0]) - 1, int(p[1]) - 1
                vals[i] = float(p[2]) + 1j * float(p[3])
        else:  # real / integer / double
            vals = np.empty(nnz, dtype=np.float64)
            for i, ln in enumerate(entries):
                p = ln.split()
                rows[i], cols[i] = int(p[0]) - 1, int(p[1]) - 1
                vals[i] = float(p[2])
        # MatrixMarket is 1-based: a 0 (or out-of-range) index would wrap
        # through numpy fancy indexing downstream — reject (mirrors the
        # native parser's check).
        if nnz and (
            rows.min() < 0 or rows.max() >= nrows
            or cols.min() < 0 or cols.max() >= ncols
        ):
            bad = int(np.argmax(
                (rows < 0) | (rows >= nrows) | (cols < 0) | (cols >= ncols)
            ))
            raise ValueError(
                f"entry {bad}: coordinate ({rows[bad] + 1}, {cols[bad] + 1}) "
                f"outside 1-based [1, {nrows}] x [1, {ncols}]"
            )
    elif layout == "array":
        nrows, ncols = int(header[0]), int(header[1])
        flat = []
        for ln in body[1:]:
            for tok_group in [ln.split()]:
                if field == "complex":
                    flat.append(float(tok_group[0]) + 1j * float(tok_group[1]))
                else:
                    flat.append(float(tok_group[0]))
        if symmetry == "general":
            dense = np.array(flat).reshape((ncols, nrows)).T  # column-major
        else:
            # symmetric array stores lower triangle column-wise
            dense = np.zeros(
                (nrows, ncols),
                dtype=np.complex128 if field == "complex" else np.float64,
            )
            k = 0
            for j in range(ncols):
                for i in range(j, nrows):
                    dense[i, j] = flat[k]
                    k += 1
        d = MatrixData.from_dense(dense)
        rows, cols, vals = d.rows, d.cols, d.values
    else:
        raise ValueError(f"unknown layout {layout}")

    # expand symmetry (mtx_io.cpp symmetry modifiers)
    if symmetry in ("symmetric", "skew-symmetric", "hermitian"):
        off = rows != cols
        r2, c2, v2 = cols[off], rows[off], vals[off]
        if symmetry == "skew-symmetric":
            v2 = -v2
        elif symmetry == "hermitian":
            v2 = np.conj(v2)
        rows = np.concatenate([rows, r2])
        cols = np.concatenate([cols, c2])
        vals = np.concatenate([vals, v2])

    return MatrixData.from_coo((nrows, ncols), rows, cols, vals).sort_row_major()


def write_raw(
    dest, data: MatrixData, layout: str = layout_type.coordinate
) -> None:
    """Write MatrixMarket text (mtx_io.hpp write/`gko::write`)."""
    is_cpx = np.issubdtype(data.values.dtype, np.complexfloating)
    field = "complex" if is_cpx else "real"

    own = False
    if isinstance(dest, str):
        dest = open(dest, "w")
        own = True
    try:
        if layout == layout_type.coordinate:
            dest.write(f"%%MatrixMarket matrix coordinate {field} general\n")
            dest.write(f"{data.shape[0]} {data.shape[1]} {data.nnz}\n")
            for r, c, v in zip(data.rows, data.cols, data.values):
                if is_cpx:
                    dest.write(f"{r + 1} {c + 1} {float(v.real):.17g} {float(v.imag):.17g}\n")
                else:
                    dest.write(f"{r + 1} {c + 1} {float(v):.17g}\n")
        else:
            dense = data.to_dense()
            dest.write(f"%%MatrixMarket matrix array {field} general\n")
            dest.write(f"{data.shape[0]} {data.shape[1]}\n")
            for j in range(data.shape[1]):
                for i in range(data.shape[0]):
                    v = dense[i, j]
                    if is_cpx:
                        dest.write(f"{float(v.real):.17g} {float(v.imag):.17g}\n")
                    else:
                        dest.write(f"{float(v):.17g}\n")
    finally:
        if own:
            dest.close()


def read_binary_raw(path) -> MatrixData:
    """Fast binary format (mtx_io.hpp:96 analog): npz with rows/cols/vals."""
    with np.load(path) as z:
        return MatrixData.from_coo(
            tuple(z["shape"]), z["rows"], z["cols"], z["values"]
        )


def write_binary_raw(path, data: MatrixData) -> None:
    np.savez_compressed(
        path,
        shape=np.asarray(data.shape, dtype=np.int64),
        rows=data.rows,
        cols=data.cols,
        values=data.values,
    )


def read(source, format_cls=None, **kw):
    """gko::read analog (mtx_io.hpp:188): parse + construct a format."""
    data = read_raw(source)
    if format_cls is None:
        from ..matrix.csr import Csr

        format_cls = Csr
    return format_cls.from_matrix_data(data, **kw)


def write(dest, linop, layout: str = layout_type.coordinate) -> None:
    """gko::write analog: any WritableToMatrixData op."""
    write_raw(dest, linop.to_matrix_data(), layout)

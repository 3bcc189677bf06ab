"""Native C++ IO runtime (native/mtx_native.cpp via ginkgo_tpu/io/native.py)
vs the pure-Python parser — the same file must parse identically.

Reference analog: core/base/mtx_io.cpp parser behavior (banner, fields,
symmetries) and the binary format (mtx_io.hpp:96)."""

import numpy as np
import pytest

from ginkgo_tpu.base.matrix_data import MatrixData
from ginkgo_tpu.io import mtx_io, native
from ginkgo_tpu.utils import generators

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)


def _assert_same(a: MatrixData, b: MatrixData):
    a, b = a.sort_row_major(), b.sort_row_major()
    assert a.shape == b.shape
    np.testing.assert_array_equal(a.rows, b.rows)
    np.testing.assert_array_equal(a.cols, b.cols)
    np.testing.assert_allclose(a.values, b.values, rtol=1e-15)


def _python_read(path):
    with open(path) as f:
        return mtx_io.read_raw(f)  # stream input skips the native path


def test_native_matches_python_coordinate_real(tmp_path, rng):
    data = generators.generate_random_matrix(30, 25, 1, 4, rng)
    p = str(tmp_path / "m.mtx")
    mtx_io.write_raw(p, data)
    _assert_same(native.read_raw_native(p), _python_read(p))


def test_native_matches_python_complex(tmp_path, rng):
    d = generators.generate_random_matrix(12, 12, 1, 3, rng)
    vals = d.values + 1j * np.roll(d.values, 1)
    data = MatrixData.from_coo(d.shape, d.rows, d.cols, vals)
    p = str(tmp_path / "c.mtx")
    mtx_io.write_raw(p, data)
    _assert_same(native.read_raw_native(p), _python_read(p))


@pytest.mark.parametrize(
    "sym,field",
    [("symmetric", "real"), ("skew-symmetric", "real"), ("symmetric", "pattern")],
)
def test_native_symmetry_expansion(tmp_path, sym, field):
    lines = [f"%%MatrixMarket matrix coordinate {field} {sym}", "% comment", "3 3 3"]
    entries = [(2, 1), (3, 1), (3, 2)]
    for i, j in entries:
        lines.append(f"{i} {j}" + ("" if field == "pattern" else f" {i}.5"))
    p = str(tmp_path / "s.mtx")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    _assert_same(native.read_raw_native(p), _python_read(p))


def test_native_array_layout(tmp_path):
    text = "%%MatrixMarket matrix array real general\n2 2\n1.0\n2.0\n3.0\n4.0\n"
    p = str(tmp_path / "a.mtx")
    with open(p, "w") as f:
        f.write(text)
    _assert_same(native.read_raw_native(p), _python_read(p))


def test_native_binary_roundtrip(tmp_path, rng):
    data = generators.generate_random_matrix(40, 40, 1, 5, rng)
    p = str(tmp_path / "m.gtb")
    native.write_binary_native(p, data)
    _assert_same(native.read_binary_native(p), data)


def test_native_binary_complex_roundtrip(tmp_path, rng):
    d = generators.generate_random_matrix(10, 10, 1, 2, rng)
    data = MatrixData.from_coo(
        d.shape, d.rows, d.cols, d.values + 1j * d.values
    )
    p = str(tmp_path / "c.gtb")
    native.write_binary_native(p, data)
    _assert_same(native.read_binary_native(p), data)


def test_read_raw_uses_native_for_paths(tmp_path, rng, monkeypatch):
    data = generators.generate_random_matrix(20, 20, 1, 3, rng)
    p = str(tmp_path / "m.mtx")
    mtx_io.write_raw(p, data)
    _assert_same(mtx_io.read_raw(p), data)
    # and with native disabled, same answer
    monkeypatch.setenv("GINKGO_TPU_NO_NATIVE", "1")
    _assert_same(mtx_io.read_raw(p), data)

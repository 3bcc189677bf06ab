"""Benchmark CLI drivers produce valid JSON rows on the CPU oracle tier.

Reference analog: the benchmark binaries' JSON contract
(benchmark/spmv/spmv.cpp etc.); here each driver's main() is invoked
in-process with tiny sizes."""

import json

import pytest

from ginkgo_tpu.benchmark import (
    blas,
    conversions,
    matrix_generator,
    preconditioner,
    solver,
    sparse_blas,
    spmv,
    tools,
)


def _no_errors(rows):
    errs = [r for r in rows if "error" in r]
    assert not errs, errs


def test_spmv_driver(tmp_path):
    rows = spmv.main([
        "--stencil", "5pt:12", "--formats", "csr,coo,ell,sellp,hybrid,dia,dense",
        "--repetitions", "2", "--trials", "1",
        "--json", str(tmp_path / "out.json"),
    ])
    _no_errors(rows)
    assert len(rows) == 7
    saved = json.loads((tmp_path / "out.json").read_text())
    assert saved[0]["benchmark"] == "spmv"
    assert all(r["gnnz_per_s"] > 0 for r in rows)


def test_solver_driver():
    rows = solver.main([
        "--stencil", "tri:40", "--solvers", "cg,bicgstab",
        "--preconditioners", "none,jacobi",
        "--max-iters", "200", "--tolerance", "1e-7",
    ])
    _no_errors(rows)
    assert len(rows) == 4
    for r in rows:
        assert r["converged"], r
        assert r["true_relative_residual"] < 1e-5


def test_blas_driver():
    rows = blas.main([
        "--size", "4096", "--ops", "axpy,dot,norm2,gemv",
        "--repetitions", "2", "--trials", "1",
    ])
    _no_errors(rows)
    assert len(rows) == 4


def test_sparse_blas_driver():
    rows = sparse_blas.main([
        "--stencil", "5pt:8", "--ops", "spgemm,spgeam,transpose",
        "--trials", "1",
    ])
    _no_errors(rows)
    assert rows[0]["out_nnz"] > 0


def test_conversions_driver():
    rows = conversions.main([
        "--stencil", "5pt:8", "--pairs", "csr-coo,csr-dia,dia-csr,csr-dense",
        "--trials", "1",
    ])
    _no_errors(rows)
    assert len(rows) == 4


def test_preconditioner_driver():
    rows = preconditioner.main([
        "--stencil", "tri:32", "--preconditioners", "jacobi,block_jacobi,ilu",
        "--repetitions", "2", "--trials", "1",
    ])
    _no_errors(rows)
    assert len(rows) == 3


def test_matrix_generator_and_tools(tmp_path, capsys):
    mtx = str(tmp_path / "g.mtx")
    matrix_generator.main(["--stencil", "5pt:6", "--out", mtx])
    from ginkgo_tpu.io import mtx_io, native

    data = mtx_io.read_raw(mtx)
    assert data.shape == (36, 36)
    if native.available():
        gtb = str(tmp_path / "g.gtb")
        tools.main([mtx, gtb])
        back = native.read_binary_native(gtb)
        assert back.nnz == data.nnz


def test_distributed_driver():
    from ginkgo_tpu.benchmark import distributed

    rows = distributed.main([
        "--mode", "weak", "--base-side", "10", "--max-iters", "5",
        "--devices", "1,2", "--trials", "1",
    ])
    _no_errors(rows)
    assert len(rows) == 2
    assert rows[0]["devices"] == 1 and rows[1]["devices"] == 2
    assert rows[1]["scaling_efficiency"] > 0

"""Benchmark CLI suite.

Reference analog: benchmark/ (~7.5 kLoC gflags+RapidJSON C++ drivers —
spmv, solver, blas, sparse_blas, conversions, preconditioner,
matrix_generator, tools/mtx_to_binary; benchmark/utils/general.hpp:66-117
protocol flags).  Here each driver is `python -m ginkgo_tpu.benchmark.<name>`
with argparse flags and JSON-lines output.
"""

"""Smallest possible solve (reference: examples/minimal-cuda-solver)."""
import _path_setup  # noqa: F401  (repo-root import shim)
import numpy as np
import ginkgo_tpu as gko

A = gko.Csr.from_matrix_data(gko.generators.poisson_1d(32, dtype=np.float32))
b = np.ones((32, 1), np.float32)
x, info = gko.Cg.build().generate(A).solve(b)
print(f"solved in {int(info.iterations)} iterations")

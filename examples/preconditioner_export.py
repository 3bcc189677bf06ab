"""Generate preconditioners and export them as MatrixMarket files.

Reference: examples/preconditioner-export.cpp."""
import _path_setup  # noqa: F401  (repo-root import shim)
import os
import tempfile

import numpy as np
import ginkgo_tpu as gko
from ginkgo_tpu.preconditioner import JacobiFactory
from ginkgo_tpu.factorization.par_ilu import ParIluFactory


def main():
    data = gko.generators.poisson_2d(8, dtype=np.float64)
    A = gko.Csr.from_matrix_data(data)
    out = tempfile.mkdtemp(prefix="precond_export_")

    J = JacobiFactory(max_block_size=4).generate(A)
    gko.write(os.path.join(out, "jacobi.mtx"), J)

    fact = ParIluFactory(iterations=5).generate(A)
    gko.write(os.path.join(out, "parilu_l.mtx"), fact.l_factor)
    gko.write(os.path.join(out, "parilu_u.mtx"), fact.u_factor)

    for f in sorted(os.listdir(out)):
        back = gko.read_raw(os.path.join(out, f))
        print(f"{f}: {back.shape[0]}x{back.shape[1]}, nnz {back.nnz}")


if __name__ == "__main__":
    main()

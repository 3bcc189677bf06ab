"""Interfacing with an external library.

Reference: examples/external-lib-interfacing — a deal.II finite-element
assembly handed to Ginkgo's CG through a thin adapter.  The Python
ecosystem's deal.II role is played by scipy.sparse: this example

  1. assembles a 2-D FEM-style operator in scipy (external library),
  2. adapts it to ginkgo_tpu (COO triplets -> MatrixData -> Dia/Csr) and
     solves with CG on the default device, and
  3. adapts the OTHER direction: wraps a ginkgo_tpu solver as a
     scipy.sparse.linalg.LinearOperator so scipy-side algorithms can call
     it as a black-box preconditioner/solver.
"""
import _path_setup  # noqa: F401  (repo-root import shim)

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import ginkgo_tpu as gko
from ginkgo_tpu import stop


def assemble_external(m: int) -> sp.csr_matrix:
    """'External library' assembly: 5-point Laplacian via scipy kron."""
    T = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m))
    Eye = sp.identity(m)
    return (sp.kron(Eye, T) + sp.kron(T, Eye)).tocsr()


def main():
    m = 48
    A_sp = assemble_external(m).astype(np.float32)
    n = A_sp.shape[0]

    # scipy -> ginkgo_tpu: COO triplets into MatrixData, then the
    # TPU-native banded format (gather-free SpMV)
    coo = A_sp.tocoo()
    data = gko.MatrixData.from_coo(
        A_sp.shape, coo.row, coo.col, coo.data
    ).sort_row_major()
    A = gko.Dia.from_matrix_data(data)

    b = jnp.ones((n, 1), jnp.float32)
    solver = gko.Cg.build(
        criteria=[stop.Iteration(max_iters=800), stop.ResidualNorm(tolerance=1e-6)]
    ).generate(A)
    x, info = solver.solve(b)
    res = np.linalg.norm(A_sp @ np.asarray(x)[:, 0] - 1.0)
    print(f"ginkgo_tpu CG on scipy-assembled operator: {int(info.iterations)} "
          f"iterations, true residual {res:.2e}")

    # ginkgo_tpu -> scipy: the generated solver as a LinearOperator, used
    # as a preconditioner inside scipy's own GMRES.  The inner operator
    # must be LINEAR for plain (non-flexible) GMRES, so use a
    # fixed-iteration Jacobi-Richardson polynomial preconditioner — a
    # Krylov inner solve (whose coefficients depend on its input) would
    # break the Arnoldi recurrence.
    inner = gko.Ir.build(
        criteria=[stop.Iteration(max_iters=10)],
        preconditioner=gko.JacobiFactory(max_block_size=1),
    ).generate(A)

    def apply_inner(v):
        y, _ = inner.solve(jnp.asarray(v.reshape(n, 1), jnp.float32))
        # np.array (copy): scipy mutates the result in place, and a
        # zero-copy view of a jax buffer is read-only
        return np.array(y).reshape(n)

    M = spla.LinearOperator((n, n), matvec=apply_inner, dtype=np.float32)
    x2, code = spla.gmres(A_sp, np.ones(n, np.float32), M=M, rtol=1e-4,
                          maxiter=300)
    res2 = np.linalg.norm(A_sp @ x2 - 1.0)
    print(f"scipy GMRES with ginkgo_tpu-IR preconditioner: info={code}, "
          f"true residual {res2:.2e}")
    assert code == 0 and res2 < 1e-2 * np.sqrt(n), (code, res2)  # f32


if __name__ == "__main__":
    main()

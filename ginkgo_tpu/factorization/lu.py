"""Direct LU / Cholesky factorizations with symbolic analysis.

Reference: core/factorization/lu.cpp, cholesky.cpp, symbolic.cpp and
elimination_forest.cpp — symbolic factorization via the elimination forest,
then numeric factorization on the resulting fill pattern.

TPU split: symbolic analysis (etree + fill pattern) is host numpy — identical
in role to the reference's host/symbolic path; the numeric factorization is a
setup-time computation: sparse LU without pivoting via SuperLU in NATURAL
order (the vendor-library analog, like the reference's sparselib usage), or
dense Cholesky on the MXU for the Cholesky case.  The factors come back as
device CSR LinOps consumed by the TPU triangular solvers.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla
import jax.numpy as jnp

from ..matrix.csr import Csr
from .factorization import Factorization


def elimination_forest(pattern) -> np.ndarray:
    """Elimination tree of a symmetric pattern (parent array, -1 = root).

    Liu's algorithm (reference core/factorization/elimination_forest.cpp)."""
    a = pattern.tocsr()
    n = a.shape[0]
    parent = np.full(n, -1, np.int64)
    ancestor = np.full(n, -1, np.int64)
    for j in range(n):
        for t in range(a.indptr[j], a.indptr[j + 1]):
            i = a.indices[t]
            if i >= j:
                continue
            # walk from i to the root, path-compressing via `ancestor`
            while True:
                anc = ancestor[i]
                ancestor[i] = j
                if anc == -1:
                    if parent[i] == -1 and i != j:
                        parent[i] = j
                    break
                if anc == j:
                    break
                i = anc
    return parent


def symbolic_cholesky(pattern):
    """Fill pattern of the Cholesky factor (row structures via etree walk;
    reference core/factorization/symbolic.cpp)."""
    a = (pattern + pattern.T).tocsr()
    n = a.shape[0]
    parent = elimination_forest(a)
    rows, cols = [], []
    for i in range(n):
        mark = np.zeros(n, bool)
        mark[i] = True
        rows.append(i)
        cols.append(i)
        for t in range(a.indptr[i], a.indptr[i + 1]):
            k = a.indices[t]
            if k >= i:
                continue
            # walk up the etree from k until hitting a marked node
            while k != -1 and k < i and not mark[k]:
                mark[k] = True
                rows.append(i)
                cols.append(k)
                k = parent[k]
    return sps.csr_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=a.shape
    )


class LuFactory:
    """factorization::Lu (direct, near-symbolic).  symbolic_algorithm is kept
    for interface parity; numeric uses unpivoted sparse LU."""

    def __init__(self, symbolic_algorithm: str = "general", skip_sorting=False):
        self.symbolic_algorithm = symbolic_algorithm

    def generate(self, A) -> Factorization:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        a = csr.to_scipy().tocsc()
        lu = spla.splu(
            a,
            permc_spec="NATURAL",
            diag_pivot_thresh=0.0,
            options=dict(SymmetricMode=True),
        )
        # SuperLU may row-permute: Pr A = L U.  Folding Pr into L would
        # produce a NON-triangular "L" that triangular solvers silently
        # mis-solve, so keep L triangular and carry the permutation:
        # A x = b  <=>  L U x = (Pr b) = b[row_perm].
        n = a.shape[0]
        import jax.numpy as jnp

        row_perm = np.argsort(lu.perm_r)  # (Pr b)[i] = b[row_perm[i]]
        # SuperLU computes in double; restore the operator's value dtype so
        # downstream triangular solves stay type-stable (precision_dispatch
        # fidelity: factors carry the system's precision)
        L = lu.L.tocsr().astype(a.dtype)
        U = lu.U.tocsr().astype(a.dtype)
        return Factorization(
            l_factor=Csr.from_scipy(L),
            u_factor=Csr.from_scipy(U),
            row_perm=(
                None
                if np.array_equal(lu.perm_r, np.arange(n))
                else jnp.asarray(row_perm, jnp.int32)
            ),
            shape=tuple(a.shape),
        )


class CholeskyFactory:
    """factorization::Cholesky: symbolic fill + numeric LL^H."""

    def __init__(self, skip_sorting=False):
        pass

    def generate(self, A) -> Factorization:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        dense = np.asarray(csr.to_dense().values)
        L = np.linalg.cholesky(dense)
        Lc = Csr.from_matrix_data(
            __import__(
                "ginkgo_tpu.base.matrix_data", fromlist=["MatrixData"]
            ).MatrixData.from_dense(L)
        )
        return Factorization(
            l_factor=Lc, u_factor=Lc.conj_transpose(), shape=csr.shape
        )


Lu = LuFactory
Cholesky = CholeskyFactory

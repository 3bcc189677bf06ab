"""Exact ILU(0) / IC(0) factorizations.

Reference: core/factorization/ilu.cpp / ic.cpp — where vendor libraries
provide csrilu0/csric0.  There is no vendor ILU on TPU; the exact sequential
IKJ factorization runs on host at generate time (a setup path, like the
reference's sparselib call), and the factors are device CSR LinOps.
Output is Factorization(L unit-lower, U upper), matching
factorization/ilu.hpp:71's Composition convention.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..matrix.csr import Csr
from .factorization import Factorization


def ilu0_host(sp):
    """Exact ILU(0), IKJ variant on the CSR pattern of sp (scipy csr)."""
    a = sp.tocsr().copy()
    a.sort_indices()
    n = a.shape[0]
    indptr, indices, data = a.indptr, a.indices, a.data
    # column position lookup per row
    for i in range(n):
        row_s, row_e = indptr[i], indptr[i + 1]
        row_cols = indices[row_s:row_e]
        for kk in range(row_s, row_e):
            k = indices[kk]
            if k >= i:
                break
            # diag of row k (must be stored: ILU(0) factors on the
            # original pattern require structural diagonals, like the
            # reference's csrilu0)
            ks, ke = indptr[k], indptr[k + 1]
            dpos = ks + np.searchsorted(indices[ks:ke], k)
            if dpos >= ke or indices[dpos] != k:
                raise ValueError(
                    f"ILU(0) requires a stored diagonal entry in every row; "
                    f"row {k} has none"
                )
            dkk = data[dpos]
            if dkk == 0:
                dkk = 1e-30
            data[kk] = data[kk] / dkk
            lik = data[kk]
            # subtract lik * row k (upper part) restricted to row i's pattern
            for jj in range(dpos + 1, ke):
                j = indices[jj]
                pos = row_s + np.searchsorted(row_cols, j)
                if pos < row_e and indices[pos] == j:
                    data[pos] -= lik * data[jj]
    return a


def split_factors(a, dtype=None):
    """Split in-place ILU storage into L (unit diag) + U."""
    import scipy.sparse as sps

    n = a.shape[0]
    L = sps.tril(a, -1).tocsr() + sps.eye(n, format="csr", dtype=a.dtype)
    U = sps.triu(a, 0).tocsr()
    return Csr.from_scipy(L), Csr.from_scipy(U)


class IluFactory:
    """factorization::Ilu (exact, 'sparselib' analog)."""

    def __init__(self, skip_sorting: bool = False):
        pass

    def generate(self, A) -> Factorization:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        a = ilu0_host(csr.to_scipy())
        L, U = split_factors(a)
        return Factorization(l_factor=L, u_factor=U, shape=tuple(a.shape))


class IcFactory:
    """factorization::Ic (exact IC(0))."""

    def __init__(self, skip_sorting: bool = False):
        pass

    def generate(self, A) -> Factorization:
        import scipy.sparse as sps

        csr = A.to_csr() if hasattr(A, "to_csr") else A
        sp = csr.to_scipy().tocsr()
        sp.sort_indices()
        n = sp.shape[0]
        # IC(0): up-looking on the lower-triangular pattern
        Lpat = sps.tril(sp, 0).tocsr()
        Lpat.sort_indices()
        indptr, indices = Lpat.indptr, Lpat.indices
        data = Lpat.data.astype(np.result_type(Lpat.data.dtype, np.float64)).copy()
        dense_rows = [
            dict(zip(indices[indptr[i] : indptr[i + 1]], range(indptr[i], indptr[i + 1])))
            for i in range(n)
        ]
        for i in range(n):
            s, e = indptr[i], indptr[i + 1]
            for t in range(s, e):
                j = indices[t]
                # l_ij = (a_ij - sum_{k<j} l_ik l_jk) / l_jj ; l_jj = sqrt(...)
                acc = data[t]
                row_i = dense_rows[i]
                js, je = indptr[j], indptr[j + 1]
                for tt in range(js, je):
                    k = indices[tt]
                    if k >= j:
                        break
                    if k in row_i:
                        # l_ij needs l_ik * conj(l_jk) (Hermitian IC)
                        acc -= data[row_i[k]] * np.conj(data[tt])
                if j < i:
                    djj = data[dense_rows[j][j]]
                    data[t] = acc / (djj if djj != 0 else 1e-30)
                else:  # diagonal
                    data[t] = np.sqrt(max(acc, 1e-30)) if not np.iscomplexobj(
                        data
                    ) else np.sqrt(acc)
        Lf = sps.csr_matrix((data.astype(sp.data.dtype), indices, indptr), shape=sp.shape)
        L = Csr.from_scipy(Lf)
        return Factorization(
            l_factor=L, u_factor=L.conj_transpose(), shape=sp.shape
        )


Ilu = IluFactory
Ic = IcFactory

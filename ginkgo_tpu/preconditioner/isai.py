"""ISAI — incomplete sparse approximate inverse preconditioners.

Reference: core/preconditioner/isai.cpp (:66-184), isai.hpp
(`isai_type {lower, upper, general, spd}` :63, `sparsity_power` parameter).
Each row i of the approximate inverse M solves the small dense system
restricted to M's row pattern J_i:  M[i, J_i] · A[J_i, J_i] = e_i[J_i].

TPU design: the reference batches one small solve per GPU subwarp with an
"excess system" fallback for long rows; here all rows are padded to the max
pattern size S and solved as ONE batched (n, S, S) dense solve on the MXU —
the pad-to-bucket policy again.  Pattern extraction and the (setup-time)
gather of A[J_i, J_i] are host-side numpy.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

from ..base.linop import LinOp
from ..base.matrix_data import MatrixData
from ..matrix.csr import Csr


def _pattern(sp, isai_type: str, power: int):
    pa = sp.copy()
    pa.data = np.ones_like(pa.data)
    if isai_type == "lower" or isai_type == "spd":
        pa = sps.tril(pa).tocsr()
    elif isai_type == "upper":
        pa = sps.triu(pa).tocsr()
    pat = pa
    for _ in range(power - 1):
        pat = (pat @ pa).tocsr()
        pat.data = np.ones_like(pat.data)
    pat.sort_indices()
    return pat


def generate_isai(A_csr: Csr, isai_type: str = "general", sparsity_power: int = 1) -> Csr:
    """Build the approximate inverse as a Csr with the requested pattern."""
    sp = A_csr.to_scipy().tocsr()
    sp.sort_indices()
    n = sp.shape[0]
    pat = _pattern(sp, isai_type, sparsity_power)
    lengths = np.diff(pat.indptr)
    S = max(int(lengths.max()) if n else 1, 1)
    dense = None
    # host gather of the (n, S, S) restricted blocks
    G = np.zeros((n, S, S), sp.data.dtype)
    E = np.zeros((n, S), sp.data.dtype)
    sp_lil = sp.tolil()
    for i in range(n):
        J = pat.indices[pat.indptr[i] : pat.indptr[i + 1]]
        m = len(J)
        sub = sp[J][:, J].toarray()
        G[i, :m, :m] = sub
        # identity-extend padding
        for t in range(m, S):
            G[i, t, t] = 1.0
        pos = np.searchsorted(J, i)
        if pos < m and J[pos] == i:
            E[i, pos] = 1.0
    # rows of M: M[i, J] A[J, J] = e_i  =>  A[J,J]^T m^T = e
    Gd = jnp.asarray(G)
    Ed = jnp.asarray(E)
    Mrows = jnp.linalg.solve(jnp.swapaxes(Gd, 1, 2), Ed[..., None])[..., 0]  # (n, S)
    # scatter into CSR with pat pattern
    vals = np.zeros(pat.nnz, sp.data.dtype)
    mhost = np.asarray(Mrows)
    for i in range(n):
        s, e = pat.indptr[i], pat.indptr[i + 1]
        vals[s:e] = mhost[i, : e - s]
    return Csr.create((n, n), pat.indptr, pat.indices, vals)


class IsaiFactory:
    """isai.hpp factory: isai_type in {lower, upper, general, spd},
    sparsity_power."""

    def __init__(self, isai_type: str = "general", sparsity_power: int = 1):
        assert isai_type in ("lower", "upper", "general", "spd")
        self.isai_type = isai_type
        self.sparsity_power = int(sparsity_power)

    def generate(self, A):
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        approx = generate_isai(csr, self.isai_type, self.sparsity_power)
        if self.isai_type == "spd":
            # approximate inverse of the IC factor: M ≈ L^{-1};
            # preconditioner = M^H M (isai.hpp spd semantics)
            from ..base.linop import Composition

            return Composition(operators=(approx.conj_transpose(), approx))
        return approx


class Isai:
    @staticmethod
    def build(isai_type="general", sparsity_power=1, **kw):
        return IsaiFactory(isai_type, sparsity_power)


# convenience aliases mirroring reference typedefs (isai.hpp:316-330)
def LowerIsai(sparsity_power=1):
    return IsaiFactory("lower", sparsity_power)


def UpperIsai(sparsity_power=1):
    return IsaiFactory("upper", sparsity_power)


def GeneralIsai(sparsity_power=1):
    return IsaiFactory("general", sparsity_power)


def SpdIsai(sparsity_power=1):
    return IsaiFactory("spd", sparsity_power)

"""ParILUT / ParICT — threshold-based adaptive incomplete factorizations.

Reference: core/factorization/par_ilut.cpp (ops registered :63-79:
add_candidates -> compute_l_u_factors sweeps -> threshold_select (GPU
sampleselect) -> threshold_filter) and par_ict.cpp.

TPU split: the pattern-adaptive outer loop is host-side (patterns are
dynamic by nature — scipy symbolic ops at generate time, exactly where the
reference spends its SpGEMM/SpGEAM calls), while every numeric sweep runs on
device through the static ParILU product plan (par_ilu.parilu_sweeps).
threshold_select uses a host partition (np.partition = exact sampleselect);
filtering keeps diagonals like the reference.

Parameters mirror par_ilut.hpp: iterations (default 5), fill_in_limit
(default 2.0), approximate_select.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps
import jax.numpy as jnp

from ..matrix.csr import Csr
from ..base.matrix_data import MatrixData
from .factorization import Factorization
from .par_ilu import pad_plan_to_buckets, parilu_sweeps, split_lu_pattern


def _threshold_filter(m, max_nnz: int, keep_diag=True, approximate=False):
    """Keep the max_nnz largest-|.| entries (always keeping the diagonal).

    approximate=True mirrors the reference's sampleselect approximation
    (par_ilut_select kernels): the threshold comes from an 8192-entry
    sample instead of an exact partition of all values."""
    m = m.tocoo()
    absval = np.abs(m.data)
    is_diag = m.row == m.col
    if m.nnz <= max_nnz:
        keep = np.ones(m.nnz, bool)
    else:
        # protect diagonal, select threshold among off-diagonal values
        noff = max(max_nnz - is_diag.sum(), 0)
        off_abs = absval[~is_diag]
        if noff == 0 or len(off_abs) == 0:
            keep = is_diag
        else:
            noff = min(noff, len(off_abs))
            if approximate and len(off_abs) > 8192:
                rng = np.random.default_rng(0)
                sample = rng.choice(off_abs, size=8192, replace=False)
                q = 1.0 - noff / len(off_abs)
                thresh = np.quantile(sample, q)
            else:
                thresh = np.partition(off_abs, -noff)[-noff]
            keep = is_diag | (absval >= thresh)
    return sps.csr_matrix(
        (m.data[keep], (m.row[keep], m.col[keep])), shape=m.shape
    )


def _sweeps_on_pattern(A_sp, pattern_sp, sweeps: int):
    """Run Chow-Patel sweeps with A's values on an explicit pattern
    (pattern entries not in A act as structural zeros)."""
    pat = pattern_sp.tocsr().copy()
    pat.sort_indices()
    pat.data = np.zeros_like(pat.data)
    # embed A values into the pattern (entries of A outside pattern dropped)
    a = A_sp.tocsr()
    both = pat + a.multiply(_pattern_mask(pat))
    both = both.tocsr()
    both.sort_indices()
    A_ext = Csr.from_scipy(both)
    plan = split_lu_pattern(A_ext)
    # bucket-padded shapes: the adaptive pattern changes every iteration,
    # bucketing keeps the jit signature count O(log) instead of O(iters)
    lv, uv = parilu_sweeps(pad_plan_to_buckets(plan), sweeps)
    n = both.shape[0]
    L = sps.csr_matrix(
        (np.asarray(lv)[: plan["nnz_l"]], plan["np_l_cols"],
         plan["np_l_indptr"]),
        shape=(n, n),
    )
    U = sps.csr_matrix(
        (np.asarray(uv)[: plan["nnz_u"]], plan["np_u_cols"],
         plan["np_u_indptr"]),
        shape=(n, n),
    )
    return L, U


def _pattern_mask(pat):
    m = pat.copy()
    m.data = np.ones_like(m.data)
    return m


class ParIlutFactory:
    def __init__(
        self,
        iterations: int = 5,
        fill_in_limit: float = 2.0,
        sweeps_per_iteration: int = 3,
        approximate_select: bool = False,
    ):
        self.iterations = int(iterations)
        self.fill_in_limit = float(fill_in_limit)
        self.sweeps = int(sweeps_per_iteration)
        self.approximate_select = bool(approximate_select)

    def generate(self, A) -> Factorization:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        a = csr.to_scipy().tocsr()
        a.sort_indices()
        n = a.shape[0]
        eye = sps.eye(n, format="csr")
        max_l = int(self.fill_in_limit * (sps.tril(a, 0).nnz))
        max_u = int(self.fill_in_limit * (sps.triu(a, 0).nnz))

        # reference loop order (par_ilut.cpp:63-79): add_candidates ->
        # sweeps on candidate -> threshold filter -> sweeps on filtered;
        # one sweeps call per phase, none duplicated across iterations
        pattern = (a + eye).tocsr()  # ensure diagonal
        L, U = _sweeps_on_pattern(a, pattern, self.sweeps)
        for _ in range(self.iterations):
            # add_candidates: residual pattern of A - L@U
            LU = (L @ U).tocsr()
            cand = (_pattern_mask((a + eye).tocsr()) + _pattern_mask(LU)).tocsr()
            L2, U2 = _sweeps_on_pattern(a, cand, self.sweeps)
            # threshold select + filter on each factor
            Lf = _threshold_filter(
                sps.tril(L2, 0).tocsr(), max_l,
                approximate=self.approximate_select,
            )
            Uf = _threshold_filter(
                sps.triu(U2, 0).tocsr(), max_u,
                approximate=self.approximate_select,
            )
            pattern = (
                _pattern_mask(Lf) + _pattern_mask(Uf) + _pattern_mask(eye)
            ).tocsr()
            L, U = _sweeps_on_pattern(a, pattern, self.sweeps)
        return Factorization(
            l_factor=Csr.from_scipy(L), u_factor=Csr.from_scipy(U), shape=(n, n)
        )


class ParIctFactory:
    """par_ict.cpp analog: threshold IC — symmetric candidates, L only."""

    def __init__(
        self,
        iterations: int = 5,
        fill_in_limit: float = 2.0,
        sweeps_per_iteration: int = 3,
        approximate_select: bool = False,
    ):
        self.iterations = int(iterations)
        self.fill_in_limit = float(fill_in_limit)
        self.sweeps = int(sweeps_per_iteration)
        self.approximate_select = bool(approximate_select)

    def generate(self, A) -> Factorization:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        a = csr.to_scipy().tocsr()
        n = a.shape[0]
        eye = sps.eye(n, format="csr")
        max_l = int(self.fill_in_limit * sps.tril(a, 0).nnz)
        pattern = (a + eye).tocsr()
        L, U = _sweeps_on_pattern(a, pattern, self.sweeps)
        for _ in range(self.iterations):
            du = np.sqrt(np.maximum(U.diagonal(), 1e-30))
            Lic = (L @ sps.diags(du)).tocsr()
            LLt = (Lic @ Lic.T).tocsr()
            cand = (_pattern_mask((a + eye).tocsr()) + _pattern_mask(LLt)).tocsr()
            cand = (_pattern_mask(sps.tril(cand)) + _pattern_mask(
                sps.tril(cand).T
            )).tocsr()
            L2, _ = _sweeps_on_pattern(a, cand, self.sweeps)
            Lf = _threshold_filter(sps.tril(L2, 0).tocsr(), max_l)
            sym = _pattern_mask(Lf) + _pattern_mask(Lf).T
            pattern = (sym + _pattern_mask(eye)).tocsr()
            L, U = _sweeps_on_pattern(a, pattern, self.sweeps)
        du = np.sqrt(np.maximum(U.diagonal(), 1e-30))
        Lic = Csr.from_scipy((L @ sps.diags(du)).tocsr())
        return Factorization(
            l_factor=Lic, u_factor=Lic.conj_transpose(), shape=(n, n)
        )


ParIlut = ParIlutFactory
ParIct = ParIctFactory

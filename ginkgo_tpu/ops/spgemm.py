"""SpGEMM / SpGEAM — sparse x sparse product and sum.

Reference: csr spgemm/advanced spgemm/spgeam kernels
(core/matrix/csr_kernels.hpp, cuda/matrix/csr_kernels.cu).  GPU SpGEMM is a
two-pass size-then-fill with device hash tables; XLA cannot allocate dynamic
outputs, so the TPU-native split is the one SURVEY §7 prescribes:
**symbolic on host, numeric on device**.  The host pass (scipy/numpy,
setup-time) computes the output pattern and a static expansion map; the
numeric pass is a single gather-multiply-segment_sum over the expansion,
fully static and differentiable, and is reused for every numeric update on a
fixed pattern (the pattern-reuse case the reference optimizes for in ParILUT).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sps


class SpgemmPlan:
    """Static expansion map for C = A @ B on fixed patterns.

    prod_a[t], prod_b[t] index into A.values / B.values; prod_out[t] is the
    output slot in C.values receiving the product."""

    def __init__(self, A_csr, B_csr):
        a = A_csr.to_scipy().tocsr()
        b = B_csr.to_scipy().tocsr()
        a.sort_indices()
        b.sort_indices()
        # symbolic: pattern of C
        pa = a.copy()
        pa.data = np.ones_like(pa.data)
        pb = b.copy()
        pb.data = np.ones_like(pb.data)
        c = (pa @ pb).tocsr()
        c.sort_indices()
        c.sum_duplicates()
        self.c_indptr = c.indptr.copy()
        self.c_indices = c.indices.copy()
        self.c_shape = (a.shape[0], b.shape[1])
        # expansion: for each A entry t=(i,k) cross B row k — fully
        # vectorized (one np.repeat/cumsum chain instead of a per-product
        # Python loop; the reference sizes this with device hash tables,
        # cuda/matrix/csr_kernels.cu spgemm)
        a_rows = np.repeat(
            np.arange(a.shape[0], dtype=np.int64), np.diff(a.indptr)
        )
        bL = np.diff(b.indptr).astype(np.int64)
        rep = bL[a.indices]  # products contributed by each A entry
        total = int(rep.sum())
        prod_a = np.repeat(np.arange(a.nnz, dtype=np.int64), rep)
        # position within each A-entry's product group
        grp_off = np.concatenate([[0], np.cumsum(rep)[:-1]])
        within = np.arange(total, dtype=np.int64) - grp_off[prod_a]
        prod_b = b.indptr[a.indices][prod_a] + within
        # slot of (i, j) in C via one sorted-key searchsorted
        i_of = a_rows[prod_a]
        j_of = b.indices[prod_b].astype(np.int64)
        ncols = np.int64(b.shape[1])
        c_rows = np.repeat(
            np.arange(c.shape[0], dtype=np.int64), np.diff(c.indptr)
        )
        ckey = c_rows * (ncols + 1) + c.indices.astype(np.int64)
        prod_out = np.searchsorted(ckey, i_of * (ncols + 1) + j_of)
        order = np.argsort(prod_out, kind="stable")
        self.prod_a = jnp.asarray(prod_a[order], jnp.int32)
        self.prod_b = jnp.asarray(prod_b[order], jnp.int32)
        self.prod_out = jnp.asarray(prod_out[order], jnp.int32)
        self.nnz_c = c.nnz
        # permutation from scipy CSR entry order to our canonical order
        # (both row-major sorted; identical)

    def numeric(self, a_values, b_values):
        contrib = jnp.take(a_values, self.prod_a) * jnp.take(b_values, self.prod_b)
        return jax.ops.segment_sum(
            contrib,
            self.prod_out,
            num_segments=max(self.nnz_c, 1),
            indices_are_sorted=True,
        )


def spgemm(A_csr, B_csr):
    """C = A @ B (csr.cpp:188-191 apply-as-spgemm)."""
    from ..matrix.csr import Csr

    plan = SpgemmPlan(A_csr, B_csr)
    vals = plan.numeric(A_csr.values, B_csr.values)
    return Csr(
        row_ptrs=jnp.asarray(plan.c_indptr, jnp.int32),
        col_idxs=jnp.asarray(plan.c_indices, jnp.int32),
        values=vals,
        shape=plan.c_shape,
        strategy=A_csr.strategy,
    )


def advanced_spgemm(alpha, A_csr, B_csr, beta, C_csr):
    """C := alpha*A@B + beta*C (advanced spgemm kernel)."""
    prod = spgemm(A_csr, B_csr)
    return spgeam(alpha, prod, beta, C_csr)


class SpgeamPlan:
    """Static union-pattern map for alpha*A + beta*B."""

    def __init__(self, A_csr, B_csr):
        a = A_csr.to_scipy().tocsr()
        b = B_csr.to_scipy().tocsr()
        pa = a.copy()
        pa.data = np.ones_like(pa.data)
        pb = b.copy()
        pb.data = np.ones_like(pb.data)
        u = (pa + pb).tocsr()
        u.sort_indices()
        self.u_indptr = u.indptr.copy()
        self.u_indices = u.indices.copy()
        self.shape = a.shape
        self.nnz = u.nnz
        # slot of each A/B entry in the union
        self.a_slots = jnp.asarray(_slots_of(a, u), jnp.int32)
        self.b_slots = jnp.asarray(_slots_of(b, u), jnp.int32)

    def numeric(self, alpha, a_values, beta, b_values):
        out = jnp.zeros((max(self.nnz, 1),), jnp.result_type(a_values, b_values))
        out = out.at[self.a_slots].add(jnp.asarray(alpha).reshape(()) * a_values)
        out = out.at[self.b_slots].add(jnp.asarray(beta).reshape(()) * b_values)
        return out


def _slots_of(m, u):
    """For each entry of csr m, its slot index in union-pattern csr u
    (vectorized: one searchsorted over row-major sorted global keys)."""
    ncols = np.int64(u.shape[1])
    u_rows = np.repeat(np.arange(u.shape[0], dtype=np.int64), np.diff(u.indptr))
    ukey = u_rows * (ncols + 1) + u.indices.astype(np.int64)
    m_rows = np.repeat(np.arange(m.shape[0], dtype=np.int64), np.diff(m.indptr))
    mkey = m_rows * (ncols + 1) + m.indices.astype(np.int64)
    return np.searchsorted(ukey, mkey)


def spgeam(alpha, A_csr, beta, B_csr):
    from ..matrix.csr import Csr

    plan = SpgeamPlan(A_csr, B_csr)
    vals = plan.numeric(alpha, A_csr.values, beta, B_csr.values)
    return Csr(
        row_ptrs=jnp.asarray(plan.u_indptr, jnp.int32),
        col_idxs=jnp.asarray(plan.u_indices, jnp.int32),
        values=vals,
        shape=plan.shape,
        strategy=A_csr.strategy,
    )

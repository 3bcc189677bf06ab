"""Multigrid coarsening: PGM (parallel graph match) and FixedCoarsening.

Reference: core/multigrid/pgm.cpp (244; kernels match_edge / count_unagg /
renumber, reference/multigrid/pgm_kernels.cpp:354) and fixed_coarsening.cpp.

PGM = size-2 aggregation by strongest-neighbor matching on the symmetrized
strength graph, unmatched nodes merged into their strongest aggregated
neighbor, then the coarse operator is the triple product R A P with
piecewise-constant P.  Aggregation runs on host at generate time (setup);
the resulting restrict/prolong are device ops: prolong = take by agg id,
restrict = sorted segment-sum — both static.  The coarse matrix is built
once via the SpGEMM plans.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import scipy.sparse as sps
import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..matrix.csr import Csr


@linop_dataclass
class Prolongation(LinOp):
    """Piecewise-constant prolongation P: (n_fine, n_coarse)."""

    agg: jnp.ndarray  # (n_fine,) aggregate id of each fine row
    n_coarse: int = static_field(default=0)

    @property
    def shape(self):
        return (self.agg.shape[0], self.n_coarse)

    @property
    def dtype(self):
        return jnp.float64

    def apply(self, b):
        arr, was_1d = as_2d(b)
        return restore_1d(jnp.take(arr, self.agg, axis=0), was_1d)


@linop_dataclass
class Restriction(LinOp):
    """R = P^T: segment-sum fine values into aggregates."""

    agg: jnp.ndarray
    n_coarse: int = static_field(default=0)

    @property
    def shape(self):
        return (self.n_coarse, self.agg.shape[0])

    @property
    def dtype(self):
        return jnp.float64

    def apply(self, b):
        arr, was_1d = as_2d(b)
        out = jax.ops.segment_sum(arr, self.agg, num_segments=self.n_coarse)
        return restore_1d(out, was_1d)


@linop_dataclass
class MultigridLevel(LinOp):
    """One level: fine op + restrict/prolong + coarse op
    (reference multigrid_level.hpp: EnableMultigridLevel)."""

    fine_op: Any
    restrict_op: Any
    prolong_op: Any
    coarse_op: Any

    @property
    def shape(self):
        return self.fine_op.shape

    @property
    def dtype(self):
        return self.fine_op.dtype

    def apply(self, b):
        return self.fine_op.apply(b)

    def get_fine_op(self):
        return self.fine_op

    def get_coarse_op(self):
        return self.coarse_op

    def get_restrict_op(self):
        return self.restrict_op

    def get_prolong_op(self):
        return self.prolong_op


def pgm_aggregate(
    sp, deterministic=True, max_iterations=15, max_unassigned_ratio=0.05
) -> np.ndarray:
    """Iterated strongest-neighbor size-2 matching (pgm.cpp match_edge loop
    until the unassigned ratio target), then leftover merge; returns
    renumbered agg ids."""
    n = sp.shape[0]
    W = abs(sp) + abs(sp).T  # symmetrized strength (pgm strength graph)
    W = W.tocsr()
    W.setdiag(0)
    W.eliminate_zeros()
    agg = np.full(n, -1, np.int64)

    for it in range(max_iterations):
        unagg = np.nonzero(agg < 0)[0]
        if len(unagg) <= max_unassigned_ratio * n:
            break
        is_unagg = agg < 0
        progress = False
        if it == 0:
            # round 1: mutual strongest-neighbor pairs (parallel-equivalent)
            strongest = np.full(n, -1, np.int64)
            for i in unagg:
                s, e = W.indptr[i], W.indptr[i + 1]
                nb = W.indices[s:e]
                wt = W.data[s:e]
                sel = is_unagg[nb]
                if sel.any():
                    nbs, wts = nb[sel], wt[sel]
                    strongest[i] = nbs[np.argmax(wts)]
            for i in unagg:
                j = strongest[i]
                if j >= 0 and strongest[j] == i and agg[i] < 0 and agg[j] < 0:
                    root = min(i, j)
                    agg[i] = root
                    agg[j] = root
                    progress = True
        else:
            # later rounds: greedy maximal matching among the remainder
            # (the reference's deterministic sequential handling)
            for i in unagg:
                if agg[i] >= 0:
                    continue
                s, e = W.indptr[i], W.indptr[i + 1]
                nb = W.indices[s:e]
                wt = W.data[s:e]
                sel = agg[nb] < 0
                if sel.any():
                    nbs, wts = nb[sel], wt[sel]
                    j = nbs[np.argmax(wts)]
                    root = min(i, j)
                    agg[i] = root
                    agg[j] = root
                    progress = True
        if not progress:
            break

    # leftover merge into strongest aggregated neighbor (snapshot prevents
    # aggregate-chaining cascades)
    snapshot = agg.copy()
    for i in np.nonzero(agg < 0)[0]:
        s, e = W.indptr[i], W.indptr[i + 1]
        nb = W.indices[s:e]
        wt = W.data[s:e]
        best = -1
        bw = -np.inf
        for j, w in zip(nb, wt):
            if snapshot[j] >= 0 and w > bw:
                best, bw = j, w
        agg[i] = snapshot[best] if best >= 0 else i
    uniq, renum = np.unique(agg, return_inverse=True)
    return renum


@linop_dataclass
class RowSelector(LinOp):
    """Rectangular selection op: picks idx rows (FixedCoarsening restrict)."""

    idx: jnp.ndarray
    n_from: int = static_field(default=0)

    @property
    def shape(self):
        return (self.idx.shape[0], self.n_from)

    def apply(self, b):
        arr, was_1d = as_2d(b)
        return restore_1d(jnp.take(arr, self.idx, axis=0), was_1d)


@linop_dataclass
class RowScatter(LinOp):
    """Adjoint of RowSelector: scatters into idx rows (prolong)."""

    idx: jnp.ndarray
    n_to: int = static_field(default=0)

    @property
    def shape(self):
        return (self.n_to, self.idx.shape[0])

    def apply(self, b):
        arr, was_1d = as_2d(b)
        out = jnp.zeros((self.n_to, arr.shape[1]), arr.dtype)
        out = out.at[self.idx].set(arr)
        return restore_1d(out, was_1d)


class PgmFactory:
    """pgm.hpp factory: max_iterations, max_unassigned_ratio, deterministic."""

    def __init__(
        self,
        max_iterations: int = 15,
        max_unassigned_ratio: float = 0.05,
        deterministic: bool = True,
        skip_sorting: bool = True,
    ):
        self.max_iterations = max_iterations
        self.max_unassigned_ratio = max_unassigned_ratio
        self.deterministic = deterministic

    def generate(self, A) -> MultigridLevel:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        sp = csr.to_scipy().tocsr()
        agg = pgm_aggregate(
            sp,
            self.deterministic,
            self.max_iterations,
            self.max_unassigned_ratio,
        )
        nc = int(agg.max()) + 1 if len(agg) else 0
        # coarse operator: R A P (triple product, host setup like the
        # reference folds it into row-gather + spgemm)
        n = sp.shape[0]
        P = sps.csr_matrix(
            (np.ones(n, sp.data.dtype), (np.arange(n), agg)), shape=(n, nc)
        )
        Ac = (P.T @ sp @ P).tocsr()
        Ac.sort_indices()
        agg_dev = jnp.asarray(agg, jnp.int32)
        return MultigridLevel(
            # keep the caller's operator (e.g. Dia/Bell fast formats) as the
            # fine op so smoother/residual SpMVs stay on the streaming path;
            # csr was only the aggregation input
            fine_op=A,
            restrict_op=Restriction(agg=agg_dev, n_coarse=nc),
            prolong_op=Prolongation(agg=agg_dev, n_coarse=nc),
            coarse_op=Csr.from_scipy(Ac).astype(csr.dtype),
        )


Pgm = PgmFactory


class FixedCoarseningFactory:
    """fixed_coarsening.cpp: keep user-selected rows."""

    def __init__(self, coarse_rows):
        self.coarse_rows = np.asarray(coarse_rows, np.int64)

    def generate(self, A) -> MultigridLevel:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        sp = csr.to_scipy().tocsr()
        n = sp.shape[0]
        rows = self.coarse_rows
        nc = len(rows)
        P = sps.csr_matrix(
            (np.ones(nc), (rows, np.arange(nc))), shape=(n, nc)
        )
        Ac = (P.T @ sp @ P).tocsr()
        sel = jnp.asarray(rows, jnp.int32)
        return MultigridLevel(
            fine_op=A,
            restrict_op=RowSelector(idx=sel, n_from=n),
            prolong_op=RowScatter(idx=sel, n_to=n),
            coarse_op=Csr.from_scipy(Ac).astype(csr.dtype),
        )


FixedCoarsening = FixedCoarseningFactory

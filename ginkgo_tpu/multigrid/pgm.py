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
from ..base.matrix_data import MatrixData
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


def _pair_base(n: int, stride: int) -> np.ndarray:
    """Coarse id of fine row i under perfect stride-S pairing (i, i+S)
    with aggregates renumbered by root: base = (i//(2S))*S + i%S."""
    i = np.arange(n)
    return (i // (2 * stride)) * stride + i % stride


_LANES = 128


def _lane_pair_mats() -> np.ndarray:
    """(2, 128, 128) 0/1 matrices turning two consecutive fine frame rows
    into one coarse frame row for stride-1 pairing:
    coarse[c] = fine[2c] + fine[2c+1] in flat index, i.e.
    C[c_r, m] = sum_a f[2c_r, a] S[0, a, m] + f[2c_r+1, a] S[1, a, m].
    XLA's own reshape/stride lowering for this parity compaction costs
    100-800x a streaming pass on TPU (measured); as a constant matmul it
    rides the (otherwise idle) MXU exactly — each output sums 2 inputs."""
    S = np.zeros((2, _LANES, _LANES), np.float32)
    for m in range(_LANES):
        src = 2 * m
        p, a = (0, src) if m < _LANES // 2 else (1, src - _LANES)
        S[p, a, m] = 1.0
        S[p, a + 1, m] = 1.0
    return S


def _to_frame(col, rows):
    """(n,) -> zero-padded (rows, 128) frame."""
    pad = rows * _LANES - col.shape[0]
    if pad > 0:
        col = jnp.pad(col, (0, pad))
    return col.reshape(rows, _LANES)


@linop_dataclass
class BandedRestriction(LinOp):
    """Gather-free R = P^T for near-stride-pattern aggregations.

    PGM matching on grid-like/banded matrices pairs fine rows (i, i+S)
    for some stride S (S=1: index neighbors; S=row-width: the next grid
    line).  Under root-ordered renumbering the coarse id of row i is then
    base(i) = (i//(2S))*S + i%S plus a small bounded delta, so the
    2:1-slope transfer matrix decomposes like a DIA operator: per distinct
    delta a mask, a (n/(2S), 2, S) reshape-sum, and a static shift — pure
    VPU streaming, no segment_sum/scatter (gathers measured ~7 ns/element
    on v5e, matrix/dia.py)."""

    delta: jnp.ndarray  # (n_fine,) int32: agg[i] - base(i)
    deltas: tuple = static_field(default=())  # distinct shifts, static
    n_coarse: int = static_field(default=0)
    stride: int = static_field(default=1)

    @property
    def shape(self):
        return (self.n_coarse, self.delta.shape[0])

    @property
    def dtype(self):
        return jnp.float64

    @property
    def agg(self):
        """Aggregate ids (Restriction-compatible introspection)."""
        n = self.delta.shape[0]
        return jnp.asarray(_pair_base(n, self.stride), self.delta.dtype) + (
            self.delta
        )

    def apply(self, b):
        arr, was_1d = as_2d(b)
        n, k = arr.shape
        S = self.stride
        if self.deltas == (0,) and k == 1 and (S == 1 or S % _LANES == 0):
            return restore_1d(self._apply_frame(arr[:, 0]), was_1d)
        nb = -(-n // (2 * S))  # pair-blocks
        pad = 2 * S * nb - n
        arr_p = jnp.pad(arr, ((0, pad), (0, 0)))
        delta_p = jnp.pad(self.delta, (0, pad), constant_values=2**30)
        nc = self.n_coarse
        Lb = nb * S  # base-coarse length
        out = jnp.zeros((nc, k), arr.dtype)
        for d in self.deltas:
            m = (delta_p == d)[:, None].astype(arr.dtype)
            t = (arr_p * m).reshape(nb, 2, S, k).sum(axis=1).reshape(Lb, k)
            if d >= 0:
                ln = min(Lb, nc - d)
                out = out.at[d:d + ln].add(t[:ln])
            else:
                ln = min(Lb + d, nc)
                out = out.at[:ln].add(t[-d:-d + ln])
        return restore_1d(out, was_1d)

    def _apply_frame(self, col):
        """Exact-stride, single-RHS fast path on the (rows, 128) frame —
        XLA's (n,1) parity reshapes cost 100-800x a streaming pass on TPU
        (PERF.md); here stride-1 compaction is a constant MXU matmul and
        stride>=128 is a frame-row block sum."""
        n = col.shape[0]
        S = self.stride
        blk = max(2 * S, 2 * _LANES) // _LANES  # frame rows per pair-block
        rows = -(-n // (blk * _LANES)) * blk
        f = _to_frame(col, rows)
        if S == 1:
            mats = jnp.asarray(_lane_pair_mats(), f.dtype)
            f2 = f.reshape(rows // 2, 2, _LANES)
            C = jnp.einsum(
                "rpa,pam->rm", f2, mats,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            Sr = S // _LANES
            C = f.reshape(rows // (2 * Sr), 2, Sr, _LANES).sum(axis=1)
        return C.reshape(-1)[: self.n_coarse][:, None]


@linop_dataclass
class BandedProlongation(LinOp):
    """Gather-free piecewise-constant P for near-stride-pattern
    aggregations: fine[i] = coarse[base(i) + delta_i] via per-delta shift
    + pairwise broadcast + mask (see BandedRestriction)."""

    delta: jnp.ndarray
    deltas: tuple = static_field(default=())
    n_coarse: int = static_field(default=0)
    stride: int = static_field(default=1)

    @property
    def shape(self):
        return (self.delta.shape[0], self.n_coarse)

    @property
    def dtype(self):
        return jnp.float64

    @property
    def agg(self):
        """Aggregate ids (Prolongation-compatible introspection)."""
        n = self.delta.shape[0]
        return jnp.asarray(_pair_base(n, self.stride), self.delta.dtype) + (
            self.delta
        )

    def apply(self, b):
        arr, was_1d = as_2d(b)
        nc, k = arr.shape
        n = self.delta.shape[0]
        S = self.stride
        if self.deltas == (0,) and k == 1 and (S == 1 or S % _LANES == 0):
            return restore_1d(self._apply_frame(arr[:, 0]), was_1d)
        nb = -(-n // (2 * S))
        Lb = nb * S
        out = jnp.zeros((nb * 2 * S, k), arr.dtype)
        delta_p = jnp.pad(
            self.delta, (0, nb * 2 * S - n), constant_values=2**30
        )
        for d in self.deltas:
            # s[c] = coarse[c + d] on the base-coarse frame, zero outside
            s = jnp.zeros((Lb, k), arr.dtype)
            if d >= 0:
                ln = min(Lb, nc - d)
                s = s.at[:ln].set(arr[d:d + ln])
            else:
                ln = min(Lb + d, nc)
                s = s.at[-d:-d + ln].set(arr[:ln])
            expand = jnp.broadcast_to(
                s.reshape(nb, 1, S, k), (nb, 2, S, k)
            ).reshape(nb * 2 * S, k)
            m = (delta_p == d)[:, None].astype(arr.dtype)
            out = out + expand * m
        return restore_1d(out[:n], was_1d)

    def _apply_frame(self, col):
        """Adjoint of BandedRestriction._apply_frame: stride-1 expansion is
        the transposed constant MXU matmul, stride>=128 a frame-row
        broadcast (see that docstring for why XLA reshapes are avoided)."""
        n = self.delta.shape[0]
        S = self.stride
        blk = max(2 * S, 2 * _LANES) // _LANES
        rows = -(-n // (blk * _LANES)) * blk
        crows = rows // 2
        C = _to_frame(col, crows)
        if S == 1:
            mats = jnp.asarray(_lane_pair_mats(), C.dtype)
            f2 = jnp.einsum(
                "rm,pam->rpa", C, mats,
                precision=jax.lax.Precision.HIGHEST,
            )
            f = f2.reshape(rows, _LANES)
        else:
            Sr = S // _LANES
            Cb = C.reshape(crows // Sr, 1, Sr, _LANES)
            f = jnp.broadcast_to(
                Cb, (crows // Sr, 2, Sr, _LANES)
            ).reshape(rows, _LANES)
        return f.reshape(-1)[:n][:, None]


# banded transfers activate when the aggregation stays this close to the
# stride-pattern base
_BANDED_MAX_DELTA = 64
_BANDED_MAX_DISTINCT = 24


def _detect_stride(agg: np.ndarray, nc: int) -> int:
    """Dominant partner distance of the size-2 aggregates (1 if none)."""
    n = len(agg)
    order = np.argsort(agg, kind="stable")
    sorted_agg = agg[order]
    starts = np.searchsorted(sorted_agg, np.arange(nc))
    sizes = np.diff(np.append(starts, n))
    pair = sizes == 2
    if not pair.any():
        return 1
    d = order[starts[pair] + 1] - order[starts[pair]]
    d = d[d > 0]
    if len(d) == 0:
        return 1
    return int(np.bincount(d).argmax())


def _banded_transfer_ops(agg: np.ndarray, nc: int):
    """(restrict, prolong) — banded if the aggregation permits, else the
    general segment_sum/take pair."""
    n = len(agg)
    best = None
    for stride in {1, _detect_stride(agg, nc)}:
        delta = agg - _pair_base(n, stride)
        distinct = np.unique(delta)
        ok = (
            n > 0
            and np.abs(delta).max(initial=0) <= _BANDED_MAX_DELTA
            and len(distinct) <= _BANDED_MAX_DISTINCT
        )
        if ok and (best is None or len(distinct) < best[3]):
            best = (stride, delta, distinct, len(distinct))
    if best is not None:
        stride, delta, distinct, _ = best
        delta_dev = jnp.asarray(delta, jnp.int32)
        ds = tuple(int(d) for d in distinct)
        return (
            BandedRestriction(
                delta=delta_dev, deltas=ds, n_coarse=nc, stride=stride
            ),
            BandedProlongation(
                delta=delta_dev, deltas=ds, n_coarse=nc, stride=stride
            ),
        )
    agg_dev = jnp.asarray(agg, jnp.int32)
    return (
        Restriction(agg=agg_dev, n_coarse=nc),
        Prolongation(agg=agg_dev, n_coarse=nc),
    )


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

    # Tie-breaks inside _strongest_vectorized: index proximity, then a
    # stride-parity direction preference (prefer j > i iff (i // |j-i|) is
    # even).  Both are free w.r.t. matching quality; the direction rule
    # alternates along ANY stride chain (i, i±S, ...), so uniform-weight
    # grid rows form MUTUAL pairs in one parallel round, and the aggregate
    # ids follow the stride pattern that activates the gather-free banded
    # transfer operators.
    all_rows = np.repeat(np.arange(n), np.diff(W.indptr))

    def _seg_starts(rows):
        """Start offsets of equal-row runs in a row-sorted triplet list."""
        return np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])

    def _strongest_vectorized(is_unagg):
        """Strongest-unaggregated-neighbor for ALL rows at once via
        segment reductions (`np.maximum.reduceat` over the row-sorted
        adjacency — ufunc.at scatter passes cost ~7 s at 10^6 rows and a
        4-key lexsort costs seconds; reduceat is a linear C pass)."""
        ok = is_unagg[W.indices] & is_unagg[all_rows]
        rows, cols, wts = all_rows[ok], W.indices[ok], W.data[ok]
        if len(rows) == 0:
            return np.full(n, -1, np.int64)
        # pass 1: per-row max weight (rows stays sorted under the mask)
        starts = _seg_starts(rows)
        wmax_seg = np.maximum.reduceat(wts, starts)
        seg_len = np.diff(np.r_[starts, len(rows)])
        keep = wts >= np.repeat(wmax_seg, seg_len) * (1 - 1e-12)
        rows, cols = rows[keep], cols[keep]
        # pass 2: among max-weight candidates minimize (distance,
        # wrong_direction, col) packed into one int64
        d = np.maximum(np.abs(cols - rows), 1)
        wrong = ((cols > rows) != ((rows // d) % 2 == 0)).astype(np.int64)
        score = (d.astype(np.int64) << 34) | (wrong << 33) | cols
        starts = _seg_starts(rows)
        best = np.minimum.reduceat(score, starts)
        strongest = np.full(n, -1, np.int64)
        strongest[rows[starts]] = best & ((1 << 33) - 1)
        return strongest

    # Every round is a parallel mutual strongest-neighbor match — the
    # reference's own match_edge iteration (pgm_kernels.cpp match_edge is
    # "agree with your strongest neighbor"), so no sequential greedy tier
    # is needed; rounds repeat until the unassigned ratio target.
    for it in range(max_iterations):
        unagg = np.nonzero(agg < 0)[0]
        if len(unagg) <= max_unassigned_ratio * n:
            break
        is_unagg = agg < 0
        strongest = _strongest_vectorized(is_unagg)
        strongest[~is_unagg] = -1
        j = strongest
        valid = j >= 0
        mutual = valid & (np.where(valid, strongest[j], -2) == np.arange(n))
        lower = mutual & (np.arange(n) < j)
        if not lower.any():
            break
        i_lo = np.nonzero(lower)[0]
        agg[i_lo] = i_lo
        agg[j[i_lo]] = i_lo

    # leftover merge into strongest aggregated neighbor (snapshot prevents
    # aggregate-chaining cascades).  Vectorized: scatter-max of weights,
    # then scatter-min of (distance, col)-packed keys among the max-weight
    # candidates — same two-pass shape as _strongest_vectorized.
    snapshot = agg.copy()
    left = agg < 0
    if left.any():
        ok = left[all_rows] & (snapshot[W.indices] >= 0)
        rows, cols, wts = all_rows[ok], W.indices[ok], W.data[ok]
        if len(rows):
            wmax = np.full(n, -np.inf, wts.dtype)
            np.maximum.at(wmax, rows, wts)
            keep = wts >= wmax[rows]
            rows, cols = rows[keep], cols[keep]
            d = np.abs(cols - rows).astype(np.int64)
            score = (d << 33) | cols.astype(np.int64)
            best = np.full(n, np.iinfo(np.int64).max, np.int64)
            np.minimum.at(best, rows, score)
            got = (best != np.iinfo(np.int64).max) & left
            bcol = best[got] & ((1 << 33) - 1)
            agg[got] = snapshot[bcol]
        # isolated leftovers (no aggregated neighbor) become singletons
        agg[agg < 0] = np.nonzero(agg < 0)[0]
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
        # build the scipy strength input straight from triplets: a full
        # to_csr() round-trip (sort + dedup through MatrixData) costs tens
        # of seconds at 10^6 rows, scipy's C dedup does not
        src = A if hasattr(A, "to_matrix_data") or hasattr(A, "to_scipy") \
            else (A.to_csr() if hasattr(A, "to_csr") else A)
        if hasattr(src, "to_scipy"):
            # format-direct conversion (Dia shifted-slice copy, Csr view):
            # no triplet sort at all
            dtype = np.dtype(src.dtype)
            sp = src.to_scipy().tocsr()
            sp.eliminate_zeros()
        elif hasattr(src, "to_matrix_data"):
            md = src.to_matrix_data()
            dtype = md.values.dtype
            vals = md.values
            if vals.dtype not in (np.float32, np.float64, np.complex64,
                                  np.complex128):
                vals = vals.astype(np.float32)  # scipy rejects bf16 etc.
            sp = sps.csr_matrix((vals, (md.rows, md.cols)), shape=md.shape)
        else:
            sp = src.to_scipy().tocsr()
            dtype = np.dtype(src.dtype)
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
        restrict_op, prolong_op = _banded_transfer_ops(agg, nc)
        # coarse operator in the fastest suitable TPU format (Dia/Bell/Csr)
        # — smoother SpMVs at coarse levels would otherwise gather
        from ..matrix.auto import choose_format

        # Ac is canonical CSR (sorted indices, no dups) — expand indptr to
        # rows and the triplets are row-major by construction; downstream
        # sort/dedup passes detect this in O(nnz) and skip their lexsort
        Ac_rows = np.repeat(np.arange(Ac.shape[0]), np.diff(Ac.indptr))
        coarse = choose_format(
            MatrixData.from_coo(
                Ac.shape, Ac_rows, Ac.indices, Ac.data.astype(dtype)
            )
        )
        return MultigridLevel(
            # keep the caller's operator (e.g. Dia/Bell fast formats) as the
            # fine op so smoother/residual SpMVs stay on the streaming path;
            # csr was only the aggregation input
            fine_op=A,
            restrict_op=restrict_op,
            prolong_op=prolong_op,
            coarse_op=coarse,
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

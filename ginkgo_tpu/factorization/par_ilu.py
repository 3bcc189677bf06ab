"""ParILU / ParIC — Chow-Patel fixed-point incomplete factorizations.

Reference: core/factorization/par_ilu.cpp and par_ic.cpp with the
compute_l_u_factors sweep kernels
(common/cuda_hip/factorization/par_ilu_kernels.hpp.inc).

The Chow-Patel iteration is embarrassingly parallel per nonzero — a perfect
TPU fit (SURVEY §7 stage 5).  TPU design: the sparse dependency structure
    l_ij = (a_ij - sum_{k<min(i,j)} l_ik u_kj) / u_jj
is *expanded at generate time on the host* into a static product map
(pl, pu, pout): one entry per (l_ik, u_kj) pair feeding an output nonzero.
Each device sweep is then gather-multiply-segment_sum + elementwise update —
exactly the async-free Jacobi version of the reference's sweeps, fully
jittable, `sweeps` (reference `iterations`) unrolled via lax.fori_loop.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..matrix.csr import Csr
from .factorization import Factorization


def split_lu_pattern(A: Csr):
    """Host: build L (unit diag, strict lower + diag) and U (upper incl diag)
    CSR patterns from A's pattern, plus index maps for the sweeps."""
    a = A.to_scipy().tocsr()
    a.sort_indices()
    n = a.shape[0]
    rows = np.repeat(np.arange(n), np.diff(a.indptr))
    cols = a.indices
    vals = a.data

    lower_mask = rows > cols
    upper_mask = ~lower_mask  # includes diagonal
    # L pattern: strict lower + explicit unit diagonal.  The strict-lower
    # subset is already row-major sorted (subset of sorted A), so the diag
    # entries MERGE in via one searchsorted + np.insert — no lexsort.
    N1 = np.int64(n + 1)
    low_keys = rows[lower_mask].astype(np.int64) * N1 + cols[lower_mask]
    diag_keys = np.arange(n, dtype=np.int64) * (N1 + 1)
    ins = np.searchsorted(low_keys, diag_keys)
    l_rows = np.insert(rows[lower_mask], ins, np.arange(n))
    l_cols = np.insert(cols[lower_mask], ins, np.arange(n))
    l_indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(l_rows, minlength=n))]
    ).astype(np.int64)
    # U pattern: upper incl diagonal (merge in rows lacking one)
    u_rows = rows[upper_mask]
    u_cols = cols[upper_mask]
    have_diag = np.zeros(n, bool)
    have_diag[u_rows[u_rows == u_cols]] = True
    add_d = np.nonzero(~have_diag)[0]
    if len(add_d):
        up_keys = u_rows.astype(np.int64) * N1 + u_cols
        ins = np.searchsorted(up_keys, add_d.astype(np.int64) * (N1 + 1))
        u_rows = np.insert(u_rows, ins, add_d)
        u_cols = np.insert(u_cols, ins, add_d)
    u_indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(u_rows, minlength=n))]
    ).astype(np.int64)

    # Vectorized dependency expansion (no per-nnz Python): sorted global
    # keys row*(n+1)+col turn every (i, j) -> slot lookup into one
    # searchsorted; the product map is built SpGEMM-style from strict-lower
    # L entries crossed with their U rows, filtered to the A pattern.
    lkeys = l_rows.astype(np.int64) * N1 + l_cols.astype(np.int64)
    ukeys = u_rows.astype(np.int64) * N1 + u_cols.astype(np.int64)
    akeys = rows.astype(np.int64) * N1 + cols.astype(np.int64)
    diag_q = np.arange(n, dtype=np.int64) * N1 + np.arange(n, dtype=np.int64)
    l_diag = np.searchsorted(lkeys, diag_q)
    u_diag = np.searchsorted(ukeys, diag_q)

    # products: for strict-lower L entry (i, k) cross U row k -> (k, j);
    # keep j > k (so k < min(i, j)) and (i, j) present in A
    l_strict = l_cols < l_rows
    li = l_rows[l_strict].astype(np.int64)
    lk = l_cols[l_strict].astype(np.int64)
    lslot = np.nonzero(l_strict)[0]
    uL = np.diff(u_indptr)
    rep = uL[lk]
    T = int(rep.sum())
    src = np.repeat(np.arange(len(lk), dtype=np.int64), rep)
    grp = np.concatenate([[0], np.cumsum(rep)[:-1]])
    within = np.arange(T, dtype=np.int64) - grp[src]
    pu_all = u_indptr[lk][src] + within
    pj = u_cols[pu_all].astype(np.int64)
    pk = lk[src]
    # filter j > k BEFORE the searchsorted: roughly halves the lookup
    # (the diagonal/strict-upper-of-U-row products can never land in A's
    # strict pattern slots anyway)
    strict = pj > pk
    src = src[strict]
    pu_all = pu_all[strict]
    pj = pj[strict]
    q = li[src] * N1 + pj
    pos = np.searchsorted(akeys, q)
    posc = np.minimum(pos, max(a.nnz - 1, 0))
    hit = (pos < a.nnz) & (akeys[posc] == q)
    pl = lslot[src][hit]
    pu = pu_all[hit]
    pout = pos[hit]

    a_entry_is_lower = lower_mask.copy()
    a_entry_target = np.where(
        lower_mask,
        np.searchsorted(lkeys, akeys),
        np.searchsorted(ukeys, akeys),
    )
    a_entry_udiag = np.where(lower_mask, u_diag[cols], 0)

    return dict(
        n=n,
        a_vals=jnp.asarray(vals),
        a_rows=jnp.asarray(rows, jnp.int32),
        a_cols=jnp.asarray(cols, jnp.int32),
        l_indptr=jnp.asarray(l_indptr, jnp.int32),
        l_cols=jnp.asarray(l_cols, jnp.int32),
        u_indptr=jnp.asarray(u_indptr, jnp.int32),
        u_cols=jnp.asarray(u_cols, jnp.int32),
        l_diag=jnp.asarray(l_diag, jnp.int32),
        u_diag=jnp.asarray(u_diag, jnp.int32),
        pl=jnp.asarray(np.asarray(pl, np.int64), jnp.int32),
        pu=jnp.asarray(np.asarray(pu, np.int64), jnp.int32),
        pout=jnp.asarray(np.asarray(pout, np.int64), jnp.int32),
        target=jnp.asarray(a_entry_target, jnp.int32),
        is_lower=jnp.asarray(a_entry_is_lower),
        udiag_of_entry=jnp.asarray(a_entry_udiag, jnp.int32),
        nnz_l=len(l_cols),
        nnz_u=len(u_cols),
        shape=a.shape,
        # host copies for callers assembling scipy factors (ParILUT):
        # avoids device->host readbacks of index arrays every iteration
        np_l_cols=np.asarray(l_cols, np.int64),
        np_l_indptr=l_indptr,
        np_u_cols=np.asarray(u_cols, np.int64),
        np_u_indptr=u_indptr,
    )


def _bucket(m: int) -> int:
    """Next power-of-2-ish bucket (1.0/1.25/1.5/1.75 mantissa steps) so the
    adaptive-pattern sweeps reuse jit compilations across iterations."""
    if m <= 256:
        return 256
    p = 1 << (int(m - 1).bit_length() - 1)
    for frac in (1.0, 1.25, 1.5, 1.75, 2.0):
        if m <= int(p * frac):
            return int(p * frac)
    return 2 * p


def pad_plan_to_buckets(plan):
    """Pad the device arrays of a sweep plan to bucketed sizes with inert
    entries (zero values; scatter targets out of bounds, which XLA drops;
    gather sources at slot 0).  parilu_sweeps output is sliced back by
    the caller via plan['nnz_l']/['nnz_u'].  The pattern-adaptive ParILUT
    loop produces a new shape every iteration; bucketing caps the number
    of distinct jit signatures at O(log) instead of O(iterations)."""
    import jax.numpy as jnp

    nnz_a = int(plan["a_vals"].shape[0])
    T = int(plan["pl"].shape[0])
    nnz_l, nnz_u = plan["nnz_l"], plan["nnz_u"]
    ba, bt = _bucket(nnz_a), _bucket(T)
    bl, bu = _bucket(nnz_l), _bucket(nnz_u)
    if (ba, bt, bl, bu) == (nnz_a, T, nnz_l, nnz_u):
        return plan
    p = dict(plan)

    def pad(name, total, fill):
        arr = p[name]
        k = total - arr.shape[0]
        if k > 0:
            p[name] = jnp.concatenate(
                [arr, jnp.full((k,), fill, arr.dtype)]
            )

    pad("a_vals", ba, 0)
    pad("a_rows", ba, 0)
    pad("a_cols", ba, 1)        # not a diagonal slot
    pad("target", ba, max(bl, bu))  # out of bounds -> scatter dropped
    pad("is_lower", ba, False)
    pad("udiag_of_entry", ba, 0)
    pad("pl", bt, 0)
    pad("pu", bt, 0)
    pad("pout", bt, ba)         # segment id >= num_segments -> dropped
    pad("l_cols", bl, 0)
    pad("u_cols", bu, 0)
    # l_diag/u_diag are (n,) per-row maps — length fixed by the matrix,
    # no padding needed (their values index the true slot range)
    p["nnz_l"], p["nnz_u"] = bl, bu
    return p


def parilu_sweeps(plan, sweeps: int):
    """Run Chow-Patel sweeps on device; returns (l_vals, u_vals).

    Dispatches to a module-level jitted kernel keyed on the (bucketed)
    array shapes + static sizes: with pad_plan_to_buckets the adaptive
    ParILUT loop reuses O(log) compilations instead of recompiling the
    fori_loop every call (an unjitted lax.fori_loop closes over concrete
    arrays, so its compile cache never hits)."""
    return _parilu_sweeps_jit(
        plan["a_vals"], plan["a_rows"], plan["a_cols"], plan["l_diag"],
        plan["u_diag"], plan["pl"], plan["pu"], plan["pout"],
        plan["target"], plan["is_lower"], plan["udiag_of_entry"],
        sweeps=int(sweeps), n=int(plan["n"]), nnz_l=int(plan["nnz_l"]),
        nnz_u=int(plan["nnz_u"]),
    )


@functools.partial(
    jax.jit, static_argnames=("sweeps", "n", "nnz_l", "nnz_u")
)
def _parilu_sweeps_jit(a_vals, a_rows, a_cols, l_diag, u_diag, pl, pu,
                       pout, target, is_lower, udiag_of_entry, *, sweeps,
                       n, nnz_l, nnz_u):
    plan = dict(
        a_vals=a_vals, a_rows=a_rows, a_cols=a_cols, l_diag=l_diag,
        u_diag=u_diag, pl=pl, pu=pu, pout=pout, target=target,
        is_lower=is_lower, udiag_of_entry=udiag_of_entry, n=n,
        nnz_l=nnz_l, nnz_u=nnz_u,
    )
    nnz_a = a_vals.shape[0]
    dt = a_vals.dtype

    # initialize: u = upper(A); l = lower(A)/diag(A); unit diag on L
    diag_slots = plan["a_rows"] == plan["a_cols"]
    seg_rows = jnp.where(diag_slots, plan["a_rows"], 0).astype(jnp.int32)
    diag_a = jax.ops.segment_sum(
        jnp.where(diag_slots, a_vals, 0), seg_rows, num_segments=n
    )
    diag_present = jax.ops.segment_sum(
        jnp.where(diag_slots, jnp.ones_like(a_vals), 0), seg_rows, num_segments=n
    )
    diag_a = jnp.where(diag_present > 0, diag_a, 1)  # rows lacking a diagonal

    l0 = jnp.zeros((plan["nnz_l"],), dt).at[plan["l_diag"]].set(1.0)
    safe_diag = jnp.where(diag_a != 0, diag_a, 1)
    l_init_vals = jnp.where(
        plan["is_lower"], a_vals / safe_diag[plan["a_cols"]], 0
    )
    l0 = l0.at[plan["target"]].add(jnp.where(plan["is_lower"], l_init_vals, 0))
    u0 = jnp.zeros((plan["nnz_u"],), dt)
    u0 = u0.at[plan["target"]].add(jnp.where(plan["is_lower"], 0, a_vals))
    # ensure U diagonal nonzero even if A lacks it
    u0 = u0.at[plan["u_diag"]].add(jnp.where(jnp.abs(u0[plan["u_diag"]]) > 0, 0, 1))

    def sweep(_, lu):
        lv, uv = lu
        contrib = jnp.take(lv, plan["pl"]) * jnp.take(uv, plan["pu"])
        s = jax.ops.segment_sum(
            contrib, plan["pout"], num_segments=nnz_a, indices_are_sorted=False
        )
        rhs = a_vals - s
        udiag = jnp.take(uv, plan["udiag_of_entry"])
        udiag = jnp.where(udiag != 0, udiag, 1)
        new_l_entry = rhs / udiag
        # route each A entry to its factor slot; foreign entries are sent
        # out of bounds and dropped (avoids cross-factor index collisions)
        l_idx = jnp.where(plan["is_lower"], plan["target"], plan["nnz_l"])
        u_idx = jnp.where(plan["is_lower"], plan["nnz_u"], plan["target"])
        lv_new = lv.at[l_idx].set(new_l_entry, mode="drop")
        uv_new = uv.at[u_idx].set(rhs, mode="drop")
        return (lv_new, uv_new)

    lv, uv = jax.lax.fori_loop(0, sweeps, sweep, (l0, u0))
    return lv, uv


class ParIluFactory:
    """par_ilu.hpp factory: iterations (sweeps), skip_sorting."""

    def __init__(self, iterations: int = 5, skip_sorting: bool = True):
        self.iterations = int(iterations)

    def generate(self, A) -> Factorization:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        plan = split_lu_pattern(csr)
        lv, uv = parilu_sweeps(plan, self.iterations)
        L = Csr(
            row_ptrs=plan["l_indptr"],
            col_idxs=plan["l_cols"],
            values=lv,
            shape=plan["shape"],
        )
        U = Csr(
            row_ptrs=plan["u_indptr"],
            col_idxs=plan["u_cols"],
            values=uv,
            shape=plan["shape"],
        )
        return Factorization(l_factor=L, u_factor=U, shape=plan["shape"])


class ParIcFactory:
    """par_ic.cpp analog: IC via ParILU sweeps on the symmetric pattern,
    returning L and L^H."""

    def __init__(self, iterations: int = 5, skip_sorting: bool = True):
        self.iterations = int(iterations)

    def generate(self, A) -> Factorization:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        plan = split_lu_pattern(csr)
        lv, uv = parilu_sweeps(plan, self.iterations)
        # IC factor: L_ic = L * sqrt(diag(U)); then A ≈ L_ic L_ic^H
        n = plan["n"]
        du = jnp.take(uv, plan["u_diag"])
        du = jnp.where(du.real > 0, du, 1)
        sq = jnp.sqrt(du)
        lic_vals = lv * jnp.take(sq, plan["l_cols"])
        L = Csr(
            row_ptrs=plan["l_indptr"],
            col_idxs=plan["l_cols"],
            values=lic_vals,
            shape=plan["shape"],
        )
        return Factorization(
            l_factor=L, u_factor=L.conj_transpose(), shape=plan["shape"]
        )


ParIlu = ParIluFactory
ParIc = ParIcFactory

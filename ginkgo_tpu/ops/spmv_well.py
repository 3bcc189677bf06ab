"""Pallas TPU kernel for locality-free SpMV — the WELL plan.

Reference role: the load-balanced / merge-path CSR CUDA kernels and
Hybrid's imbalance split (cuda/matrix/csr_kernels.cu:121-310,
include/ginkgo/core/matrix/hybrid.hpp:206-241) — "stay fast when the
sparsity pattern has NO column locality" (power-law graphs, circuit
matrices, arbitrary permutations).  Those are gather/atomic designs; this
is a from-scratch TPU redesign around CHAINED in-register gathers.

WELL ("windowed gather-ELL") layout
-----------------------------------
PELL (ops/spmv_pallas.py) exploits column locality: its slots share a
DIAGONAL panel base across sublanes, so each slot serves only columns on
one (base + s) diagonal — a locality-free pattern needs ~one slot per
nonzero and inflates ~1000x.  WELL instead gives every slot free
(row, lane) addressing inside an aligned 8-panel window of x:

  slot = values (8,128) + residues q (8,128) int8 + routing rt (8,128)
         int8 + window base b.  Cell (s, l) holds a nonzero of output row
         128 s + l (within the tile) whose column c lies anywhere in
         panels [b, b+8): c = 128 (b + wr) + q.

The fetch is TWO chained `tpu.dynamic_gather`s on one (8,128) window
W = x[b : b+8] (a vreg — the hardware limit: gathers cannot span
multiple source vregs along the gathered dimension, measured on v5e):

    A[s, m] = W[rt[s, m], m]            (sublane gather, axis=0)
    g[s, l] = A[s, q[s, l]]             (lane gather,    axis=1)
            = W[rt[s, q[s, l]], q[s, l]]

Chained gathers read the inner index at the OUTER gather's position
(CLAUDE.md), so storing the window-row ROUTED BY RESIDUE — rt[s, m] =
window-row of the column with residue m used by sublane s — makes the
pair fetch the exact element x[128 (b + wr) + q] for every cell at once.

Constraint per (slot, sublane): at most ONE DISTINCT COLUMN per residue.
Hub columns are natively cheap: a column referenced by many rows of the
tile occupies one routing entry and any number of value cells.  Plan
construction is a vectorized greedy layering (host, numpy): an entry
enters the lowest layer of its (tile, window) where its row-cell is free
and its residue routing is consistent.

Slot count per tile ~ touched windows + hub-row depth: for a Zipf
power-law pattern this is ~25x storage inflation where PELL needs ~1000x
— the difference between streaming at HBM rate and the 7 ns/element
gather floor.  `choose_unstructured_plan` scores PELL vs WELL padded
bytes + grid steps and materializes the cheaper plan; Csr strategy
"pallas" and `linop_streaming_spmv` both route through it.

Supertiles (round 5)
--------------------
The r4 verdict's diagnosis ("hub extraction") measured wrong: removing
the top-k columns leaves inflation at ~40x because the binding floor is
the touched (tile, window) PAIR count — every 1024-row tile of a random
pattern touches nearly every window with ~47 entries each, so one
1024-cell slot per pair wastes 95% of its cells.  The fix is to let a
slot's cells scatter across T consecutive tiles (a SUPERTILE): cell
(s, l) carries an int8 sub-tile id tsb and serves row
1024*tsb + 128 s + l.  The kernel keeps T accumulators and routes each
slot's contribution with T masked adds (`where(tsb == b, contrib, 0)`)
into a (T, 8, 128) output block — measured on v5e: the masks are FREE
(11.7 ns/slot at T=16 vs 13.4 at T=1, both HBM-bound at G=62), while
the pair floor divides by T.  Measured plan stats on the power-law
bench pattern (131k rows, 771k nnz): 40.9x inflation at T=1 -> 10.6x at
T=8 -> 7.2x at T=16.  T is cost-model-chosen per pattern ("auto");
T=1 degenerates to the original WELL layout/kernel.

Reference role unchanged: cuda/matrix/csr_kernels.cu:276-310
(load_balance), include/ginkgo/core/matrix/hybrid.hpp:206-241.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..log.logger import logged_kernel
from .spmv_pallas import (
    LANES,
    SUBLANES,
    _G_CANDIDATES,
    _G_STEP_SECONDS,
    _G_HBM_BYTES_PER_S,
    _MAX_PREFETCH_INTS,
    _step_chunks,
    _SPMM_X_BYTES,
)

TILE_ROWS = SUBLANES * LANES  # 1024
WIN_PANELS = SUBLANES  # hardware: one vreg along the gathered dim


def _assign_layers(t, w, s, q, rows, cols, NW):
    """Greedy layer assignment (vectorized multi-pass).

    Per (tile, window) the layer of each entry satisfies:
    - one entry per (layer, row) cell
    - per (layer, sublane, residue): a single distinct column
    Each pass assigns a maximal consistent set to the next layer:
    within every (t, w, s, q) residue group the lowest remaining column
    is 'chosen'; among chosen-column entries, the first per (t, w, row)
    cell wins.  Progress is guaranteed (the globally first remaining
    entry of each group chain always wins), passes ~ max row degree
    within a window."""
    nnz = len(rows)
    layer = np.zeros(nnz, np.int32)
    if nnz == 0:
        return layer
    resgrp = ((t * NW + w) * SUBLANES + s) * LANES + q
    cellgrp = (t * NW + w) * TILE_ROWS + (rows % TILE_ROWS)
    order = np.lexsort((cols, resgrp))
    rg_s = resgrp[order]
    c_s = cols[order]
    cell_s = cellgrp[order]
    rem = np.ones(nnz, bool)
    lay = 0
    while True:
        pos = np.flatnonzero(rem)
        if len(pos) == 0:
            break
        g = rg_s[pos]
        first = np.ones(len(pos), bool)
        first[1:] = g[1:] != g[:-1]
        grp_id = np.cumsum(first) - 1
        chosen_col = c_s[pos[first]][grp_id]
        elig = np.flatnonzero(c_s[pos] == chosen_col)
        pe = pos[elig]
        ck = cell_s[pe]
        o2 = np.argsort(ck, kind="stable")
        ck_o = ck[o2]
        fc = np.ones(len(ck_o), bool)
        fc[1:] = ck_o[1:] != ck_o[:-1]
        win = pe[o2[fc]]
        layer[order[win]] = lay
        rem[win] = False
        lay += 1
    return layer


# supertile candidates for the auto cost model: T=1 is the classic WELL
# layout (no tsb stream, no masks); larger T divides the (tile, window)
# pair floor on scatter patterns at +1 B/cell and T masked adds.
# Measured per-slot kernel cost on v5e at G=62: 13-15 ns at T in
# {1..16} (masks hidden under the HBM stream), 20.4 ns at T=32,
# 35.6 ns at T=64 — beyond 16 the mask chain shows, so the cost model
# charges it (_SLOT_BASE_SECONDS + _MASK_SECONDS_PER_SUB) and deep
# candidates are only tried at multi-million nnz where the pair-floor
# savings dominate (measured 4.2M-row power-law: 64x at T=16 -> 39.7x
# at T=32).
_T_CANDIDATES = (1, 4, 16)
_T_DEEP_CANDIDATES = (32, 64)
_T_DEEP_MIN_NNZ = 2_000_000
_SLOT_BASE_SECONDS = 7e-9  # slice + chained gathers, any T
_MASK_SECONDS_PER_SUB = 0.4e-9  # per sub-tile beyond 16


class WellPlan:
    """Static WELL expansion of a CSR pattern (host-built, numpy).

    Same interface shape as PellPlan: G slots per grid step ('auto' uses
    the shared cost model), `materialize=False` computes stats only (the
    inflation/memory gates must run before the padded arrays exist),
    `max_cells` declines oversized plans without allocating them.
    T = sub-tiles per supertile ('auto' scores _T_CANDIDATES)."""

    S = SUBLANES  # fixed by the vreg limit of the sublane gather

    def __init__(self, indptr, indices, values, shape, G="auto", *,
                 T="auto", materialize: bool = True,
                 max_cells: int | None = None):
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        values = np.asarray(values)
        nnz_real = int(indptr[-1]) if len(indptr) else 0
        if len(indices) > nnz_real:  # padded storage (e.g. stacked SPMD)
            indices = indices[:nnz_real]
            values = values[:nnz_real]
        n_rows, n_cols = int(shape[0]), int(shape[1])
        nnz = len(indices)
        self.shape = (n_rows, n_cols)
        self.nnz = nnz
        NT = max(-(-n_rows // TILE_ROWS), 1)
        NP = max(-(-n_cols // LANES), 1)
        NW = max(-(-NP // WIN_PANELS), 1)
        self.NT, self.NP, self.NW = NT, NP, NW
        self.val_dtype = values.dtype

        rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr))
        cols = indices.astype(np.int64)
        t_tile = rows // TILE_ROWS
        s = (rows >> 7) % SUBLANES
        lane = (rows & 127).astype(np.int64)
        p = cols >> 7
        w = p // WIN_PANELS
        wr = (p % WIN_PANELS).astype(np.int64)
        q = (cols & 127).astype(np.int64)

        def vbpc(T_):
            return values.dtype.itemsize + 2 + (1 if T_ > 1 else 0)

        def build_stats(T_):
            t_ = t_tile // T_
            layer_ = _assign_layers(t_, w, s, q, rows, cols, NW)
            nlay_ = np.int64(layer_.max() + 1 if nnz else 1)
            K_ = (t_ * NW + w) * nlay_ + layer_
            uniqK_, slot_inv_ = np.unique(K_, return_inverse=True)
            u_t_ = uniqK_ // (np.int64(NW) * nlay_)
            NST_ = max(-(-NT // T_), 1)
            K_t_ = np.zeros(NST_, np.int64)
            if len(uniqK_):
                np.add.at(K_t_, u_t_, 1)
            return t_, layer_, nlay_, K_, uniqK_, slot_inv_, u_t_, NST_, K_t_

        def model_cost(K_t_, g, T_):
            st = int(np.maximum(-(-K_t_ // g), 1).sum())
            slots = st * g
            return (
                st * _G_STEP_SECONDS
                + slots * TILE_ROWS * vbpc(T_) / _G_HBM_BYTES_PER_S
                + slots * (
                    _SLOT_BASE_SECONDS
                    + max(0, T_ - 16) * _MASK_SECONDS_PER_SUB
                )
            )

        auto_g = G == "auto"
        if T == "auto":
            cands = _T_CANDIDATES + (
                _T_DEEP_CANDIDATES if nnz >= _T_DEEP_MIN_NNZ else ()
            )
            best = None
            for T_ in cands:
                stats_ = build_stats(T_)
                gs = _G_CANDIDATES if auto_g else (int(G),)
                for g in gs:
                    c = model_cost(stats_[-1], g, T_)
                    if best is None or c < best[0]:
                        best = (c, T_, g, stats_)
            _, T, G_best, stats = best
            if auto_g:
                G = G_best
        else:
            T = int(T)
            stats = build_stats(T)
            if auto_g:
                best = None
                for g in _G_CANDIDATES:
                    c = model_cost(stats[-1], g, T)
                    if best is None or c < best[0]:
                        best = (c, g)
                G = best[1]
        self.T = T = int(T)
        t, layer, nlay, K, uniqK, slot_inv, u_t, NST, K_t = stats
        self.NST = NST
        bytes_per_cell = vbpc(T)
        self.bytes_per_cell = bytes_per_cell
        self.modeled_seconds = model_cost(K_t, int(G), T)

        self.G = G = int(G)
        steps_t = np.maximum(-(-K_t // G), 1)
        slot_off = np.concatenate([[0], np.cumsum(steps_t * G)])
        total_slots = int(slot_off[-1])
        self.n_steps = int(steps_t.sum())
        self.total_cells = total_slots * TILE_ROWS
        self.inflation = self.total_cells / max(nnz, 1)
        self.padded_bytes = self.total_cells * bytes_per_cell

        self.too_large = max_cells is not None and self.total_cells > max_cells
        if not materialize or self.too_large:
            self.values = self.qidx = self.rt = self.tsb = None
            self.bases = self.tile_of_step = None
            return

        vals_arr = np.zeros((total_slots, SUBLANES, LANES), values.dtype)
        q_arr = np.zeros((total_slots, SUBLANES, LANES), np.int8)
        rt_arr = np.zeros((total_slots, SUBLANES, LANES), np.int8)
        tsb_arr = (
            np.zeros((total_slots, SUBLANES, LANES), np.int8)
            if T > 1 else None
        )
        bases = np.zeros(total_slots, np.int32)
        if nnz:
            # per-supertile dense slot index: rank of the slot's K within
            # its supertile
            t_change = np.ones(len(uniqK), bool)
            t_change[1:] = u_t[1:] != u_t[:-1]
            g_id = np.cumsum(t_change) - 1
            g_start = np.nonzero(t_change)[0][g_id]
            slot_in_t = np.arange(len(uniqK), dtype=np.int64) - g_start
            slot_of_pair = slot_off[u_t] + slot_in_t
            gslot = slot_of_pair[slot_inv]
            vals_arr[gslot, s, lane] = values
            q_arr[gslot, s, lane] = q
            # routing table lives at lane position q; same-column entries
            # overwrite each other with the identical wr (consistent by
            # the layering constraint)
            rt_arr[gslot, s, q] = wr
            if T > 1:
                tsb_arr[gslot, s, lane] = (t_tile % T).astype(np.int8)
            u_w = (uniqK // nlay) % NW
            bases[slot_of_pair] = (u_w * WIN_PANELS).astype(np.int32)
        tile_of_step = np.repeat(np.arange(NST, dtype=np.int32), steps_t)

        with jax.ensure_compile_time_eval():
            self.values = jnp.asarray(vals_arr)
            self.qidx = jnp.asarray(q_arr)
            self.rt = jnp.asarray(rt_arr)
            self.tsb = jnp.asarray(tsb_arr) if T > 1 else None
            self.bases = jnp.asarray(bases)
            self.tile_of_step = jnp.asarray(tile_of_step)


# -- PELL-vs-WELL plan selection ----------------------------------------------


def _plan_cost(n_steps: int, total_cells: int, bytes_per_cell: int,
               gather_factor: float = 1.0) -> float:
    """Modeled apply seconds: grid-step overhead + padded HBM traffic.
    gather_factor > 1 charges WELL's second in-register gather (mostly
    hidden under the HBM stream, so the charge is mild)."""
    return (
        n_steps * _G_STEP_SECONDS
        + total_cells * bytes_per_cell / _G_HBM_BYTES_PER_S * gather_factor
    )


def choose_unstructured_plan(indptr, indices, values, shape, *,
                             q_dtype=np.int8, max_cells=None):
    """Build the cheaper of PELL (diagonal-base, column-locality) and
    WELL (windowed chained-gather, locality-free) for this pattern.

    Returns the materialized winner, or a stats-only plan with
    `.too_large` set when both exceed `max_cells` (caller falls back to
    the XLA gather kernels).  PELL short-circuits when its inflation is
    already streaming-grade (the assignment pass for WELL costs a few
    host seconds on multi-million-nnz patterns and cannot win there —
    PELL's cells are strictly fewer when locality is good)."""
    from .spmv_pallas import PellPlan

    pell_bpc = np.asarray(values).dtype.itemsize + np.dtype(q_dtype).itemsize
    pell = PellPlan(indptr, indices, values, shape, q_dtype=q_dtype,
                    S="auto", materialize=False)
    if pell.inflation <= 4.0:
        return PellPlan(indptr, indices, values, shape, q_dtype=q_dtype,
                        S="auto", max_cells=max_cells)
    well = WellPlan(indptr, indices, values, shape, materialize=False)
    # symmetric per-slot base charge (slice + gather issue) so the deep-T
    # mask charge inside WellPlan.modeled_seconds compares fairly
    pell_cost = (
        _plan_cost(pell.n_steps, pell.total_cells, pell_bpc)
        + pell.n_steps * pell.G * _SLOT_BASE_SECONDS
    )
    well_cost = well.modeled_seconds
    if pell_cost <= well_cost:
        plan = PellPlan(indptr, indices, values, shape, q_dtype=q_dtype,
                        S="auto", max_cells=max_cells)
        if not plan.too_large:
            return plan
        # PELL won the model but cannot fit: WELL may still fit
        alt = WellPlan(indptr, indices, values, shape, T=well.T,
                       max_cells=max_cells)
        return plan if alt.too_large else alt
    plan = WellPlan(indptr, indices, values, shape, T=well.T,
                    max_cells=max_cells)
    if not plan.too_large:
        return plan
    alt = PellPlan(indptr, indices, values, shape, q_dtype=q_dtype,
                   S="auto", max_cells=max_cells)
    return plan if alt.too_large else alt


def plan_spmv(plan, x, *, interpret=False):
    """Dispatch an (n,)-vector SpMV on either plan kind."""
    if isinstance(plan, WellPlan):
        return well_spmv(plan, x, interpret=interpret)
    from .spmv_pallas import pell_spmv

    return pell_spmv(plan, x, interpret=interpret)


def plan_spmm(plan, X, *, interpret=False):
    """Dispatch an (n, k) SpMM on either plan kind."""
    if isinstance(plan, WellPlan):
        return well_spmm(plan, X, interpret=interpret)
    from .spmv_pallas import pell_spmm

    return pell_spmm(plan, X, interpret=interpret)


def _well_kernel(tiles_ref, bases_ref, vals_ref, q_ref, rt_ref, x_ref,
                 out_ref, *, G):
    i = pl.program_id(0)
    prev = tiles_ref[jnp.maximum(i - 1, 0)]
    cur = tiles_ref[i]

    @pl.when((i == 0) | (prev != cur))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc_dt = jnp.promote_types(out_ref.dtype, jnp.float32)
    acc = jnp.zeros((SUBLANES, LANES), acc_dt)
    for g in range(G):
        W = x_ref[pl.ds(bases_ref[i * G + g], WIN_PANELS), :]
        A = jnp.take_along_axis(
            W.astype(acc_dt), rt_ref[g].astype(jnp.int32), axis=0,
            mode="promise_in_bounds",
        )
        gth = jnp.take_along_axis(
            A, q_ref[g].astype(jnp.int32), axis=1,
            mode="promise_in_bounds",
        )
        acc = acc + vals_ref[g].astype(acc_dt) * gth
    out_ref[0] += acc.astype(out_ref.dtype)


def _well_xl_kernel(tiles_ref, bases_ref, vals_ref, q_ref, rt_ref, tsb_ref,
                    x_ref, out_ref, *, G, T):
    """Supertile variant: cell (s, l) routes to sub-tile tsb[s, l] of the
    (T, 8, 128) output block via T masked adds (int8 == compares are
    unsupported on this target: widen tsb in-register first)."""
    i = pl.program_id(0)
    prev = tiles_ref[jnp.maximum(i - 1, 0)]
    cur = tiles_ref[i]

    @pl.when((i == 0) | (prev != cur))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc_dt = jnp.promote_types(out_ref.dtype, jnp.float32)
    accs = [jnp.zeros((SUBLANES, LANES), acc_dt) for _ in range(T)]
    for g in range(G):
        W = x_ref[pl.ds(bases_ref[i * G + g], WIN_PANELS), :]
        A = jnp.take_along_axis(
            W.astype(acc_dt), rt_ref[g].astype(jnp.int32), axis=0,
            mode="promise_in_bounds",
        )
        gth = jnp.take_along_axis(
            A, q_ref[g].astype(jnp.int32), axis=1,
            mode="promise_in_bounds",
        )
        contrib = vals_ref[g].astype(acc_dt) * gth
        tsb = tsb_ref[g].astype(jnp.int32)
        for b in range(T):
            accs[b] = accs[b] + jnp.where(tsb == b, contrib, 0)
    for b in range(T):
        out_ref[0, b] += accs[b].astype(out_ref.dtype)


def _slot_spec(G):
    return pl.BlockSpec(
        (G, SUBLANES, LANES), lambda i, tiles, bs: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _well_call(tiles, bases, values, qidx, rt, tsb, x_panels, NT, G, T,
               dtype, interpret):
    n_steps = tiles.shape[0]
    if T > 1:
        in_specs = [_slot_spec(G)] * 4 + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec(
            (1, T, SUBLANES, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kern = functools.partial(_well_xl_kernel, G=G, T=T)
        out_shape = jax.ShapeDtypeStruct((NT, T, SUBLANES, LANES), dtype)
        operands = (tiles, bases, values, qidx, rt, tsb, x_panels)
        bpc = values.dtype.itemsize + 3
    else:
        in_specs = [_slot_spec(G)] * 3 + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec(
            (1, SUBLANES, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0),
            memory_space=pltpu.VMEM,
        )
        kern = functools.partial(_well_kernel, G=G)
        out_shape = jax.ShapeDtypeStruct((NT, SUBLANES, LANES), dtype)
        operands = (tiles, bases, values, qidx, rt, x_panels)
        bpc = values.dtype.itemsize + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_of_step, bases
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * values.size,
            bytes_accessed=values.size * bpc
            + x_panels.size * x_panels.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)


def _x_panels(plan, x):
    n_cols = plan.shape[1]
    n_pan = plan.NW * WIN_PANELS  # windows are aligned: no left pad needed
    xp = jnp.zeros((n_pan * LANES,), x.dtype).at[:n_cols].set(x)
    return xp.reshape(n_pan, LANES)


@logged_kernel
def well_spmv(plan: WellPlan, x, *, interpret=False):
    """y = A @ x through the WELL plan; x is (n,), returns (n_rows,).

    vmap-safe: batching dispatches to ``well_spmm`` (the matrix then
    streams once for all batched columns)."""

    from .spmv_pallas import _PlanView

    chunks = _step_chunks(plan)  # host metadata, static in the closure

    if plan.T > 1:
        @jax.custom_batching.custom_vmap
        def spmv(x_, values, qidx, rt, tsb, bases, tiles):
            p = _PlanView(plan, values, qidx, bases, tiles, rt=rt, tsb=tsb)
            return _well_spmv_single(p, x_, interpret=interpret,
                                     chunks=chunks)

        @spmv.def_vmap
        def spmv_vmap(axis_size, in_batched, x_b, values, qidx, rt, tsb,
                      bases, tiles):
            p = _PlanView(plan, values, qidx, bases, tiles, rt=rt, tsb=tsb)
            yk = well_spmm(p, x_b.T, interpret=interpret, chunks=chunks)
            return yk.T, True

        return spmv(x, plan.values, plan.qidx, plan.rt, plan.tsb,
                    plan.bases, plan.tile_of_step)

    @jax.custom_batching.custom_vmap
    def spmv(x_, values, qidx, rt, bases, tiles):
        p = _PlanView(plan, values, qidx, bases, tiles, rt=rt)
        return _well_spmv_single(p, x_, interpret=interpret, chunks=chunks)

    @spmv.def_vmap
    def spmv_vmap(axis_size, in_batched, x_b, values, qidx, rt, bases,
                  tiles):
        p = _PlanView(plan, values, qidx, bases, tiles, rt=rt)
        yk = well_spmm(p, x_b.T, interpret=interpret, chunks=chunks)
        return yk.T, True

    return spmv(x, plan.values, plan.qidx, plan.rt, plan.bases,
                plan.tile_of_step)


def _well_spmv_single(plan: WellPlan, x, *, interpret=False, chunks=None):
    n_rows = plan.shape[0]
    G, T = plan.G, plan.T
    x_panels = _x_panels(plan, x)
    if chunks is None:
        chunks = _step_chunks(plan)
    if len(chunks) == 1:
        out = _well_call(
            plan.tile_of_step, plan.bases, plan.values, plan.qidx, plan.rt,
            plan.tsb, x_panels, plan.NST, G, T, x.dtype, interpret,
        )
        return out.reshape(-1)[:n_rows]
    outs = []
    for s0, s1, t0, t1 in chunks:
        out = _well_call(
            plan.tile_of_step[s0:s1] - t0,
            plan.bases[s0 * G: s1 * G],
            plan.values[s0 * G: s1 * G],
            plan.qidx[s0 * G: s1 * G],
            plan.rt[s0 * G: s1 * G],
            plan.tsb[s0 * G: s1 * G] if T > 1 else None,
            x_panels, t1 - t0, G, T, x.dtype, interpret,
        )
        outs.append(out)
    return jnp.concatenate(outs, axis=0).reshape(-1)[:n_rows]


# -- multi-RHS (SpMM) ---------------------------------------------------------


def _well_spmm_kernel(tiles_ref, bases_ref, vals_ref, q_ref, rt_ref, x_ref,
                      out_ref, *, G, k):
    i = pl.program_id(0)
    prev = tiles_ref[jnp.maximum(i - 1, 0)]
    cur = tiles_ref[i]

    @pl.when((i == 0) | (prev != cur))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc_dt = jnp.promote_types(out_ref.dtype, jnp.float32)
    for g in range(G):
        b = bases_ref[i * G + g]
        vals = vals_ref[g].astype(acc_dt)
        rtg = rt_ref[g].astype(jnp.int32)
        qg = q_ref[g].astype(jnp.int32)
        for j in range(k):
            W = x_ref[j, pl.ds(b, WIN_PANELS), :]
            A = jnp.take_along_axis(
                W.astype(acc_dt), rtg, axis=0, mode="promise_in_bounds"
            )
            gth = jnp.take_along_axis(
                A, qg, axis=1, mode="promise_in_bounds"
            )
            out_ref[0, j] += (vals * gth).astype(out_ref.dtype)


def _well_xl_spmm_kernel(tiles_ref, bases_ref, vals_ref, q_ref, rt_ref,
                         tsb_ref, x_ref, out_ref, *, G, k, T):
    i = pl.program_id(0)
    prev = tiles_ref[jnp.maximum(i - 1, 0)]
    cur = tiles_ref[i]

    @pl.when((i == 0) | (prev != cur))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc_dt = jnp.promote_types(out_ref.dtype, jnp.float32)
    for g in range(G):
        b = bases_ref[i * G + g]
        vals = vals_ref[g].astype(acc_dt)
        rtg = rt_ref[g].astype(jnp.int32)
        qg = q_ref[g].astype(jnp.int32)
        tsb = tsb_ref[g].astype(jnp.int32)
        masks = [tsb == bb for bb in range(T)]
        for j in range(k):
            W = x_ref[j, pl.ds(b, WIN_PANELS), :]
            A = jnp.take_along_axis(
                W.astype(acc_dt), rtg, axis=0, mode="promise_in_bounds"
            )
            gth = jnp.take_along_axis(
                A, qg, axis=1, mode="promise_in_bounds"
            )
            contrib = vals * gth
            for bb in range(T):
                out_ref[0, j, bb] += jnp.where(
                    masks[bb], contrib, 0
                ).astype(out_ref.dtype)


def _well_spmm_call(tiles, bases, values, qidx, rt, tsb, x_panels, NT, G,
                    T, k, dtype, interpret):
    n_steps = tiles.shape[0]
    if T > 1:
        in_specs = [_slot_spec(G)] * 4 + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec(
            (1, k, T, SUBLANES, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kern = functools.partial(_well_xl_spmm_kernel, G=G, k=k, T=T)
        out_shape = jax.ShapeDtypeStruct((NT, k, T, SUBLANES, LANES), dtype)
        operands = (tiles, bases, values, qidx, rt, tsb, x_panels)
        bpc = values.dtype.itemsize + 3
    else:
        in_specs = [_slot_spec(G)] * 3 + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_spec = pl.BlockSpec(
            (1, k, SUBLANES, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kern = functools.partial(_well_spmm_kernel, G=G, k=k)
        out_shape = jax.ShapeDtypeStruct((NT, k, SUBLANES, LANES), dtype)
        operands = (tiles, bases, values, qidx, rt, x_panels)
        bpc = values.dtype.itemsize + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * values.size * k,
            bytes_accessed=values.size * bpc
            + x_panels.size * x_panels.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)


@logged_kernel
def well_spmm(plan: WellPlan, X, *, interpret=False, chunks=None):
    """Y = A @ X for (n, k) X: the matrix streams from HBM once for all k
    columns.  Returns (n_rows, k).  Chunked at tile boundaries beyond the
    scalar-prefetch cap; column-grouped beyond the resident-X VMEM
    budget (both exactly as pell_spmm)."""
    n_rows, n_cols = plan.shape
    k = X.shape[1]
    G, T = plan.G, plan.T
    n_pan = plan.NW * WIN_PANELS

    per_col_bytes = n_pan * LANES * X.dtype.itemsize
    k_group = max(1, min(k, _SPMM_X_BYTES // max(per_col_bytes, 1)))
    if k_group < k:
        groups = [
            well_spmm(plan, X[:, j: j + k_group], interpret=interpret,
                      chunks=chunks)
            for j in range(0, k, k_group)
        ]
        return jnp.concatenate(groups, axis=1)

    Xp = jnp.zeros((k, n_pan * LANES), X.dtype)
    Xp = Xp.at[:, :n_cols].set(X.T)
    x_panels = Xp.reshape(k, n_pan, LANES)

    def to_rows(out):
        # (NST, k, [T,] 8, 128) -> (rows, k)
        if T > 1:
            return out.transpose(0, 2, 3, 4, 1).reshape(-1, k)[:n_rows]
        return out.transpose(0, 2, 3, 1).reshape(-1, k)[:n_rows]

    if chunks is None:
        chunks = _step_chunks(plan)
    if len(chunks) == 1:
        out = _well_spmm_call(
            plan.tile_of_step, plan.bases, plan.values, plan.qidx, plan.rt,
            plan.tsb, x_panels, plan.NST, G, T, k, X.dtype, interpret,
        )
        return to_rows(out)
    outs = []
    for s0, s1, t0, t1 in chunks:
        out = _well_spmm_call(
            plan.tile_of_step[s0:s1] - t0,
            plan.bases[s0 * G: s1 * G],
            plan.values[s0 * G: s1 * G],
            plan.qidx[s0 * G: s1 * G],
            plan.rt[s0 * G: s1 * G],
            plan.tsb[s0 * G: s1 * G] if T > 1 else None,
            x_panels, t1 - t0, G, T, k, X.dtype, interpret,
        )
        outs.append(out)
    out = jnp.concatenate(outs, axis=0)
    return to_rows(out)

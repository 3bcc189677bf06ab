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


class WellPlan:
    """Static WELL expansion of a CSR pattern (host-built, numpy).

    Same interface shape as PellPlan: G slots per grid step ('auto' uses
    the shared cost model), `materialize=False` computes stats only (the
    inflation/memory gates must run before the padded arrays exist),
    `max_cells` declines oversized plans without allocating them."""

    S = SUBLANES  # fixed by the vreg limit of the sublane gather

    def __init__(self, indptr, indices, values, shape, G="auto", *,
                 materialize: bool = True, max_cells: int | None = None):
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
        bytes_per_cell = values.dtype.itemsize + 2  # q int8 + rt int8

        rows = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr))
        cols = indices.astype(np.int64)
        t = rows // TILE_ROWS
        s = (rows >> 7) % SUBLANES
        lane = (rows & 127).astype(np.int64)
        p = cols >> 7
        w = p // WIN_PANELS
        wr = (p % WIN_PANELS).astype(np.int64)
        q = (cols & 127).astype(np.int64)

        layer = _assign_layers(t, w, s, q, rows, cols, NW)

        # slot identity: distinct (t, w, layer), ordered by tile
        K = (t * NW + w) * np.int64(layer.max() + 1 if nnz else 1) + layer
        uniqK, slot_inv = np.unique(K, return_inverse=True)
        u_t = uniqK // (np.int64(NW) * (layer.max() + 1 if nnz else 1))
        K_t = np.zeros(NT, np.int64)
        if len(uniqK):
            np.add.at(K_t, u_t, 1)

        auto_g = G == "auto"
        if auto_g:
            best = None
            for g in _G_CANDIDATES:
                st = int(np.maximum(-(-K_t // g), 1).sum())
                c = (
                    st * _G_STEP_SECONDS
                    + st * g * TILE_ROWS * bytes_per_cell
                    / _G_HBM_BYTES_PER_S
                )
                if best is None or c < best[0]:
                    best = (c, g)
            G = best[1]
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
            self.values = self.qidx = self.rt = None
            self.bases = self.tile_of_step = None
            return

        vals_arr = np.zeros((total_slots, SUBLANES, LANES), values.dtype)
        q_arr = np.zeros((total_slots, SUBLANES, LANES), np.int8)
        rt_arr = np.zeros((total_slots, SUBLANES, LANES), np.int8)
        bases = np.zeros(total_slots, np.int32)
        if nnz:
            # per-tile dense slot index: rank of the slot's K within its tile
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
            u_w = (uniqK // (layer.max() + 1)) % NW
            bases[slot_of_pair] = (u_w * WIN_PANELS).astype(np.int32)
        tile_of_step = np.repeat(np.arange(NT, dtype=np.int32), steps_t)

        with jax.ensure_compile_time_eval():
            self.values = jnp.asarray(vals_arr)
            self.qidx = jnp.asarray(q_arr)
            self.rt = jnp.asarray(rt_arr)
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
    well_bpc = np.asarray(values).dtype.itemsize + 2
    pell = PellPlan(indptr, indices, values, shape, q_dtype=q_dtype,
                    S="auto", materialize=False)
    if pell.inflation <= 4.0:
        return PellPlan(indptr, indices, values, shape, q_dtype=q_dtype,
                        S="auto", max_cells=max_cells)
    well = WellPlan(indptr, indices, values, shape, materialize=False)
    pell_cost = _plan_cost(pell.n_steps, pell.total_cells, pell_bpc)
    well_cost = _plan_cost(well.n_steps, well.total_cells, well_bpc,
                           gather_factor=1.15)
    if pell_cost <= well_cost:
        plan = PellPlan(indptr, indices, values, shape, q_dtype=q_dtype,
                        S="auto", max_cells=max_cells)
        if not plan.too_large:
            return plan
        # PELL won the model but cannot fit: WELL may still fit
        alt = WellPlan(indptr, indices, values, shape, max_cells=max_cells)
        return plan if alt.too_large else alt
    plan = WellPlan(indptr, indices, values, shape, max_cells=max_cells)
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


def _well_call(tiles, bases, values, qidx, rt, x_panels, NT, G, dtype,
               interpret):
    n_steps = tiles.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_of_step, bases
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_well_kernel, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, SUBLANES, LANES), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * values.size,
            bytes_accessed=values.size * (values.dtype.itemsize + 2)
            + x_panels.size * x_panels.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tiles, bases, values, qidx, rt, x_panels)


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
    G = plan.G
    x_panels = _x_panels(plan, x)
    if chunks is None:
        chunks = _step_chunks(plan)
    if len(chunks) == 1:
        out = _well_call(
            plan.tile_of_step, plan.bases, plan.values, plan.qidx, plan.rt,
            x_panels, plan.NT, G, x.dtype, interpret,
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
            x_panels, t1 - t0, G, x.dtype, interpret,
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


def _well_spmm_call(tiles, bases, values, qidx, rt, x_panels, NT, G, k,
                    dtype, interpret):
    n_steps = tiles.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # X resident
        ],
        out_specs=pl.BlockSpec(
            (1, k, SUBLANES, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_well_spmm_kernel, G=G, k=k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, k, SUBLANES, LANES), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * values.size * k,
            bytes_accessed=values.size * (values.dtype.itemsize + 2)
            + x_panels.size * x_panels.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tiles, bases, values, qidx, rt, x_panels)


@logged_kernel
def well_spmm(plan: WellPlan, X, *, interpret=False, chunks=None):
    """Y = A @ X for (n, k) X: the matrix streams from HBM once for all k
    columns.  Returns (n_rows, k).  Chunked at tile boundaries beyond the
    scalar-prefetch cap; column-grouped beyond the resident-X VMEM
    budget (both exactly as pell_spmm)."""
    n_rows, n_cols = plan.shape
    k = X.shape[1]
    G = plan.G
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

    if chunks is None:
        chunks = _step_chunks(plan)
    if len(chunks) == 1:
        out = _well_spmm_call(
            plan.tile_of_step, plan.bases, plan.values, plan.qidx, plan.rt,
            x_panels, plan.NT, G, k, X.dtype, interpret,
        )
        return out.transpose(0, 2, 3, 1).reshape(-1, k)[:n_rows]
    outs = []
    for s0, s1, t0, t1 in chunks:
        out = _well_spmm_call(
            plan.tile_of_step[s0:s1] - t0,
            plan.bases[s0 * G: s1 * G],
            plan.values[s0 * G: s1 * G],
            plan.qidx[s0 * G: s1 * G],
            plan.rt[s0 * G: s1 * G],
            x_panels, t1 - t0, G, k, X.dtype, interpret,
        )
        outs.append(out)
    out = jnp.concatenate(outs, axis=0)
    return out.transpose(0, 2, 3, 1).reshape(-1, k)[:n_rows]

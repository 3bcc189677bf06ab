"""Pallas TPU kernel for general unstructured SpMV — the PELL plan.

Reference role: the load-balanced / merge-path CSR CUDA kernels
(cuda/matrix/csr_kernels.cu:121-310) — "make arbitrary sparsity fast".
Those designs are gather/atomic machines and do not map to the TPU; this
is a from-scratch redesign around the one in-register gather the hardware
DOES have: `tpu.dynamic_gather` (jnp.take_along_axis along lanes), where
each of 8 sublanes gathers arbitrary lanes from its OWN 128-lane source
row.

PELL ("panel-gathered ELL") layout
----------------------------------
x is VMEM-resident as (NP, 128) panels (128 consecutive entries each).
Output rows are tiled 1024 at a time as an (8, 128) accumulator tile
(sublane s covers rows [1024 t + 128 s, ... + 128)).  A *slot* is one
(8, 128) values tile + (8, 128) lane-index tile + 8 panel ids: sublane s
of a slot holds up to 128 nonzeros, ONE per output row of its 128-row
group, all addressing the SAME x panel p[slot, s].  The kernel builds the
gather source by stacking the 8 panels (8 cheap dynamic slices of the
resident x), performs one dynamic_gather, multiplies by the values tile,
and adds straight into the output tile — no scatter anywhere.

A row with m nonzeros in panel p occupies m slots of its (tile, sublane)
group (occurrence splitting), so the slot count of a group is
sum_p max_rows(multiplicity).  Storage inflation = slot cells / nnz; it is
~1-2x whenever the matrix has column locality (stencils, FEM, banded,
post-RCM reordering) and degrades toward 128x only for uniformly random
patterns with no locality to exploit (where every format, including the
reference's GPU kernels' coalescing, loses).  `plan.inflation` reports it
and `Csr._resolve_strategy` falls back to other kernels when it is
unacceptable.

Streaming behavior: the values/lane-index operands stream from HBM through
the Pallas pipeline (double-buffered (G, 8, 128) blocks); per-slot panel
ids ride in an SMEM-blocked operand; the only VMEM-resident operand is x.
HBM traffic is 8 B per slot cell -> roofline ~100 Gcell/s on v5e.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
TILE_ROWS = LANES * SUBLANES  # 1024


class PellPlan:
    """Static PELL expansion of a CSR pattern (host-built, numpy)."""

    def __init__(self, indptr, indices, values, shape, G: int = 4):
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        values = np.asarray(values)
        n_rows, n_cols = int(shape[0]), int(shape[1])
        nnz = len(indices)
        self.shape = (n_rows, n_cols)
        self.G = G
        NT = max(-(-n_rows // TILE_ROWS), 1)
        NP = max(-(-n_cols // LANES), 1)
        self.NT, self.NP = NT, NP

        rows = np.repeat(
            np.arange(n_rows, dtype=np.int64), np.diff(indptr)
        )
        cols = indices.astype(np.int64)
        t = rows >> 10
        s = (rows >> 7) & 7
        lane = (rows & 127).astype(np.int64)
        p = cols >> 7
        q = (cols & 127).astype(np.int32)

        # occurrence index within each (row, panel) run (cols sorted within
        # rows, so runs are contiguous); always < 128
        rp_key = rows * NP + p
        new_run = np.ones(nnz, bool)
        new_run[1:] = rp_key[1:] != rp_key[:-1]
        run_id = np.cumsum(new_run) - 1
        run_start = np.nonzero(new_run)[0][run_id] if nnz else run_id
        occ = np.arange(nnz, dtype=np.int64) - run_start

        # slot identity within a (tile, sublane) group: distinct (p, occ)
        ts = t * SUBLANES + s
        K = (ts * NP + p) * 128 + occ
        uniqK, slot_inv = np.unique(K, return_inverse=True)
        n_slots_used = len(uniqK)
        uniq_ts = uniqK // (np.int64(NP) * 128)
        uniq_p = (uniqK // 128) % NP
        ts_change = np.ones(n_slots_used, bool)
        ts_change[1:] = uniq_ts[1:] != uniq_ts[:-1]
        gs_id = np.cumsum(ts_change) - 1
        gstart = (
            np.nonzero(ts_change)[0][gs_id] if n_slots_used else gs_id
        )
        slot_in_ts = np.arange(n_slots_used, dtype=np.int64) - gstart

        # per-tile slot count = max over its 8 sublanes, padded to G
        K_ts = np.zeros(NT * SUBLANES, np.int64)
        if n_slots_used:
            np.add.at(K_ts, uniq_ts, 1)
        K_t = K_ts.reshape(NT, SUBLANES).max(axis=1)
        steps_t = np.maximum(-(-K_t // G), 1)
        K_t_pad = steps_t * G
        slot_off = np.concatenate([[0], np.cumsum(K_t_pad)])
        total_slots = int(slot_off[-1])
        self.n_steps = int(steps_t.sum())
        self.nnz = nnz
        self.inflation = (
            total_slots * TILE_ROWS / max(nnz, 1)
        )

        vals_arr = np.zeros((total_slots, SUBLANES, LANES), values.dtype)
        q_arr = np.zeros((total_slots, SUBLANES, LANES), np.int32)
        panels = np.zeros((total_slots, SUBLANES), np.int32)
        if nnz:
            gslot = slot_off[t] + slot_in_ts[slot_inv]
            vals_arr[gslot, s, lane] = values
            q_arr[gslot, s, lane] = q
            u_slot = slot_off[uniq_ts // SUBLANES] + slot_in_ts
            panels[u_slot, uniq_ts % SUBLANES] = uniq_p.astype(np.int32)
        tile_of_step = np.repeat(
            np.arange(NT, dtype=np.int32), steps_t
        )

        self.values = jnp.asarray(vals_arr)
        self.qidx = jnp.asarray(q_arr)
        self.panels = jnp.asarray(panels)
        self.tile_of_step = jnp.asarray(tile_of_step)

    def tree_flatten(self):  # allow embedding in pytrees if needed
        return (
            (self.values, self.qidx, self.panels, self.tile_of_step),
            (self.shape, self.G, self.NT, self.NP, self.n_steps, self.nnz,
             self.inflation),
        )


def _pell_kernel(tiles_ref, vals_ref, q_ref, panels_ref, x_ref, out_ref, *,
                 G):
    i = pl.program_id(0)
    prev = tiles_ref[jnp.maximum(i - 1, 0)]
    cur = tiles_ref[i]

    @pl.when((i == 0) | (prev != cur))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc = jnp.zeros((SUBLANES, LANES), jnp.float32)
    for g in range(G):
        # gather source: one resident-x panel per sublane
        src = jnp.concatenate(
            [x_ref[pl.ds(panels_ref[g, sl], 1), :] for sl in range(SUBLANES)],
            axis=0,
        )
        gth = jnp.take_along_axis(
            src.astype(jnp.float32), q_ref[g], axis=1,
            mode="promise_in_bounds",
        )
        acc = acc + vals_ref[g].astype(jnp.float32) * gth
    out_ref[0] += acc.astype(out_ref.dtype)


def pell_spmv(plan: PellPlan, x, *, interpret=False):
    """y = A @ x through the PELL plan; x is (n,), returns (n_rows,)."""
    n_rows, n_cols = plan.shape
    G = plan.G
    NP = plan.NP
    xp = jnp.zeros((NP * LANES,), x.dtype).at[: n_cols].set(x)
    x_panels = xp.reshape(NP, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # tile_of_step
        grid=(plan.n_steps,),
        in_specs=[
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, SUBLANES, LANES), lambda i, tiles: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, SUBLANES), lambda i, tiles: (i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES), lambda i, tiles: (tiles[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_pell_kernel, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.NT, SUBLANES, LANES), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.values.size,
            bytes_accessed=plan.values.size
            * (plan.values.dtype.itemsize + 4)
            + NP * LANES * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(plan.tile_of_step, plan.values, plan.qidx, plan.panels, x_panels)
    return out.reshape(-1)[:n_rows]


# -- plan cache + Csr-facing API ----------------------------------------------

_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 16


def _plan_for(row_ptrs, col_idxs, values, shape):
    """Plan cache keyed on the identity of the storage arrays (a Csr is
    immutable; repeated applies of the same matrix reuse the plan).  The
    strong refs kept in the cache entry make the id()s stable."""
    key = (id(row_ptrs), id(col_idxs), id(values), tuple(shape))
    hit = _PLAN_CACHE.get(key)
    if (
        hit is not None and hit[0] is row_ptrs and hit[1] is col_idxs
        and hit[2] is values
    ):
        return hit[3]
    plan = PellPlan(
        np.asarray(row_ptrs), np.asarray(col_idxs), np.asarray(values),
        shape,
    )
    if len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
        _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
    _PLAN_CACHE[key] = (row_ptrs, col_idxs, values, plan)
    return plan


def csr_spmv(row_ptrs, col_idxs, values, arr, n_rows, *, interpret=False):
    """Csr 'pallas' strategy entry (csr.py): multi-RHS by column loop.

    Host-builds (and caches) the PELL plan, so this path must be entered
    OUTSIDE jit; inside jit use a prebuilt plan / the Pell format class."""
    shape = (n_rows, arr.shape[0])
    plan = _plan_for(row_ptrs, col_idxs, values, shape)
    cols = []
    for k in range(arr.shape[1]):
        cols.append(pell_spmv(plan, arr[:, k], interpret=interpret))
    return jnp.stack(cols, axis=1)

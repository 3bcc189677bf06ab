"""Pallas TPU kernel for general unstructured SpMV — the PELL plan.

Reference role: the load-balanced / merge-path CSR CUDA kernels
(cuda/matrix/csr_kernels.cu:121-310) — "make arbitrary sparsity fast".
Those designs are gather/atomic machines and do not map to the TPU; this
is a from-scratch redesign around the one in-register gather the hardware
DOES have: `tpu.dynamic_gather` (jnp.take_along_axis on matching 2-D
tiles along lanes).

PELL ("panel-gathered ELL") layout
---------------------------------
x is VMEM-resident as 128-entry panels (padded by 7 zero panels on both
sides).  Output rows are tiled 1024 at a time as an (8, 128) accumulator
tile (sublane s covers rows [1024 t + 128 s, ..., + 128)).  A *slot* is
one (8, 128) values tile + one (8, 128) lane-index tile + one panel BASE
b: cell (s, l) of the slot holds at most one nonzero of output row
1024 t + 128 s + l whose column lies in panel b + s, at lane q[s, l].

The key observation is the DIAGONAL BASE: for any matrix with column
locality, the panel wanted by sublane s is (to within the band fraction)
`base + s` — row group s sits 128 rows (= exactly one panel) below row
group s-1, so one contiguous 8-panel slice of x lines up with all eight
sublanes at once.  The kernel therefore issues ONE dynamic slice
W = x[b : b+8] and ONE lane-gather
    g[s, l] = W[s, q[s, l]]          (tpu.dynamic_gather along lanes)
then multiplies by the values tile and adds into the output tile — no
scatter anywhere, ~4 vector ops and one VMEM slice per 1024-cell slot.
Slots are shared across sublanes: every cell with the same
(tile, base = panel - sublane, occurrence) lands in the same slot, so
banded/stencil structure collapses to a handful of slots per tile.

A row with m nonzeros in one panel occupies m (base, occurrence) pairs
(occurrence = index among the row's nonzeros in that panel); the slot
count of a tile is its number of distinct (base, occurrence) pairs.
Storage inflation = slot cells / nnz: ~1-2x for matrices with column
locality (stencils, FEM, banded, post-RCM reordering), degrading only
for uniformly random patterns with no locality to exploit (where every
format, including the reference's GPU kernels' coalescing, loses).
`plan.inflation` reports it and `Csr._resolve_strategy` falls back to
other kernels when it is unacceptable.

Streaming behavior: the values/index operands stream from HBM through the
Pallas pipeline (double-buffered (G, 8, 128) blocks); per-slot bases and
per-step output-tile ids ride the scalar-prefetch SMEM operands; the only
VMEM-resident operand is x.  HBM traffic is 8 B per slot cell ->
roofline ~100 Gcell/s on v5e.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..log.logger import logged_kernel

LANES = 128
SUBLANES = 8
TILE_ROWS = LANES * SUBLANES  # 1024
PAD_PANELS = 7  # zero panels either side so any base +- 7 slices validly

# -- auto-G cost model --------------------------------------------------------
# G (slots per grid step) trades Mosaic's ~0.2 us/step grid overhead
# against per-tile padding roundup (slots pad to a multiple of G): BENCH
# r3 found the 1M-row default-G=4 plan was GRID-BOUND (~9k steps ~ 1.8 ms
# of a 2.2 ms apply).  The model scores steps * step-cost + padded cells
# at HBM rate; constants from chip characterization (CLAUDE.md).
_G_STEP_SECONDS = 2e-7
_G_HBM_BYTES_PER_S = 8.3e11
_G_CANDIDATES = (4, 8, 16, 32, 64)
# auto-S candidates: slots share a panel base across S sublanes (the v5
# layout knob); larger S costs fewer grid steps but can pad worse on
# ragged patterns — scored by the same cost model as auto-G.  The fused
# whole-solve kernels implement S=8 only, so Pell operators default to
# S=8 and only the streaming plan caches use "auto".
_S_CANDIDATES = (8, 16, 32)


def _g_cost(n_steps: int, total_slots: int, S: int,
            bytes_per_cell: int) -> float:
    return (
        n_steps * _G_STEP_SECONDS
        + total_slots * S * LANES * bytes_per_cell / _G_HBM_BYTES_PER_S
    )


class PellPlan:
    """Static PELL expansion of a CSR pattern (host-built, numpy).

    S: sublanes per slot tile (tile covers S*128 output rows).  Larger S
    amortizes the per-slot slice+gather over more cells at equal padding
    inflation (slots are base-distinct, not row-distinct) — the v5
    refinement; S=8 is the v4 layout.  q_dtype: storage dtype of the
    packed lane indices (int8 halves index traffic; lanes < 128 always
    fit); the kernel widens to int32 in-register."""

    def __init__(self, indptr, indices, values, shape, G="auto",
                 S: int = SUBLANES, q_dtype=np.int32, *,
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
        auto_g = G == "auto"
        bytes_per_cell = values.dtype.itemsize + np.dtype(q_dtype).itemsize
        if S == "auto":
            # stats-only probe per candidate (auto-G inside each), pick
            # the min modeled apply cost, then build that layout below
            best = None
            for s_c in _S_CANDIDATES:
                p = PellPlan(indptr, indices, values, shape, G=G, S=s_c,
                             q_dtype=q_dtype, materialize=False)
                c = (p.n_steps * _G_STEP_SECONDS
                     + p.total_cells * bytes_per_cell / _G_HBM_BYTES_PER_S)
                if best is None or c < best[0]:
                    best = (c, s_c)
            S = best[1]
        self.G = _G_CANDIDATES[0] if auto_g else int(G)
        G = self.G
        self.S = int(S)
        self.pad = self.S - 1
        tile_rows = self.S * LANES
        NT = max(-(-n_rows // tile_rows), 1)
        NP = max(-(-n_cols // LANES), 1)
        self.NT, self.NP = NT, NP
        self.nnz = nnz

        # native fused planner (native/pell_plan.cpp): one decode pass +
        # one index sort replace the ~20 numpy passes below — decisive on
        # hosts with degraded memory bandwidth (the fallback produces an
        # identical layout; tests assert parity)
        nat = None
        if nnz:
            try:
                from ..io.native import pell_plan_native

                nat = pell_plan_native(
                    indptr, indices, n_cols,
                    _G_CANDIDATES if auto_g else G, self.S,
                    stats_only=not materialize,
                    bytes_per_cell=bytes_per_cell,
                )
            except Exception:
                nat = None
        if nat is not None and (nat["NT"] != NT or nat["NP"] != NP):
            nat = None  # stale/skewed native library: numpy fallback
        if nat is not None:
            self.G = G = int(nat.get("G", G))
            self.n_steps = int(nat["n_steps"])
            total_slots = int(nat["total_slots"])
            self.total_cells = total_slots * tile_rows
            self.inflation = self.total_cells / max(nnz, 1)
            self.val_dtype = values.dtype
            self.q_dtype = np.dtype(q_dtype)
            self.too_large = (
                max_cells is not None and self.total_cells > max_cells
            )
            if not materialize or self.too_large:
                self.values = self.qidx = None
                self.bases = self.tile_of_step = None
                return
            vals_arr = np.zeros((total_slots, self.S, LANES), values.dtype)
            q_arr = np.zeros((total_slots, self.S, LANES), q_dtype)
            gs, sr, ln = nat["gslot"], nat["srow"], nat["lane"]
            vals_arr[gs, sr, ln] = values
            q_arr[gs, sr, ln] = nat["q"]
            # concrete even when a plan is (cache-)built during an outer
            # trace: a traced constant would leak out of that trace
            with jax.ensure_compile_time_eval():
                self.values = jnp.asarray(vals_arr)
                self.qidx = jnp.asarray(q_arr)
                self.bases = jnp.asarray(nat["bases"])
                self.tile_of_step = jnp.asarray(nat["tile_of_step"])
            return

        rows = np.repeat(
            np.arange(n_rows, dtype=np.int64), np.diff(indptr)
        )
        cols = indices.astype(np.int64)
        t = rows // tile_rows
        s = (rows >> 7) % self.S
        lane = (rows & 127).astype(np.int64)
        p = cols >> 7
        q = (cols & 127).astype(np.int64)
        base = p - s + self.pad  # in [0, NP + 2*pad - 1]

        # occurrence index within each (row, panel) run (cols sorted
        # within rows, so runs are contiguous); < 128 by construction
        rp_key = rows * NP + p
        new_run = np.ones(nnz, bool)
        new_run[1:] = rp_key[1:] != rp_key[:-1]
        run_id = np.cumsum(new_run) - 1
        run_start = np.nonzero(new_run)[0][run_id] if nnz else run_id
        occ = np.arange(nnz, dtype=np.int64) - run_start

        # slot identity per tile: distinct (base, occurrence) pairs,
        # shared across the S sublanes (the diagonal-base alignment)
        NB = NP + 2 * self.pad + 1
        K = (t * NB + base) * 128 + occ
        uniqK, slot_inv = np.unique(K, return_inverse=True)
        u_t = uniqK // (np.int64(NB) * 128)
        u_base = (uniqK // 128) % NB
        t_change = np.ones(len(uniqK), bool)
        t_change[1:] = u_t[1:] != u_t[:-1]
        g_id = np.cumsum(t_change) - 1
        g_start = np.nonzero(t_change)[0][g_id] if len(uniqK) else g_id
        slot_in_t = np.arange(len(uniqK), dtype=np.int64) - g_start

        K_t = np.zeros(NT, np.int64)
        if len(uniqK):
            np.add.at(K_t, u_t, 1)
        if auto_g:
            # same model the native path applies (io/native.py): score
            # each candidate's padded layout, keep the cheapest
            best = None
            for g in _G_CANDIDATES:
                st = int(np.maximum(-(-K_t // g), 1).sum())
                c = _g_cost(st, st * g, self.S, bytes_per_cell)
                if best is None or c < best[0]:
                    best = (c, g)
            self.G = G = best[1]
        steps_t = np.maximum(-(-K_t // G), 1)
        K_t_pad = steps_t * G
        slot_off = np.concatenate([[0], np.cumsum(K_t_pad)])
        total_slots = int(slot_off[-1])
        self.n_steps = int(steps_t.sum())
        self.total_cells = total_slots * tile_rows
        self.inflation = self.total_cells / max(nnz, 1)
        self.val_dtype = values.dtype
        self.q_dtype = np.dtype(q_dtype)

        # padding gates run BEFORE the padded arrays exist: a low-locality
        # pattern can inflate to tens of GB, which must be declinable
        # without allocating it (review finding r2).  materialize=False
        # computes stats only (choose_format / strategy resolution).
        self.too_large = max_cells is not None and self.total_cells > max_cells
        if not materialize or self.too_large:
            self.values = self.qidx = self.bases = self.tile_of_step = None
            return

        vals_arr = np.zeros((total_slots, self.S, LANES), values.dtype)
        q_arr = np.zeros((total_slots, self.S, LANES), q_dtype)
        bases = np.zeros(total_slots, np.int32)
        if nnz:
            slot_of_pair = slot_off[u_t] + slot_in_t
            gslot = slot_of_pair[slot_inv]
            vals_arr[gslot, s, lane] = values
            q_arr[gslot, s, lane] = q
            bases[slot_of_pair] = u_base.astype(np.int32)
        tile_of_step = np.repeat(np.arange(NT, dtype=np.int32), steps_t)

        with jax.ensure_compile_time_eval():
            self.values = jnp.asarray(vals_arr)
            self.qidx = jnp.asarray(q_arr)
            self.bases = jnp.asarray(bases)
            self.tile_of_step = jnp.asarray(tile_of_step)


def _pell_kernel(tiles_ref, bases_ref, vals_ref, q_ref, x_ref, out_ref, *,
                 G, S=SUBLANES):
    i = pl.program_id(0)
    prev = tiles_ref[jnp.maximum(i - 1, 0)]
    cur = tiles_ref[i]

    @pl.when((i == 0) | (prev != cur))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # accumulate at >= f32; f64 operands (CPU oracle tier) keep f64 so
    # the interpreted kernel is a faithful oracle (a hard f32 cast here
    # stalled distributed f64 GMRES at 1e-6)
    acc_dt = jnp.promote_types(out_ref.dtype, jnp.float32)
    acc = jnp.zeros((S, LANES), acc_dt)
    for g in range(G):
        # one VMEM slice fetches the slot's S diagonal-aligned panels
        W = x_ref[pl.ds(bases_ref[i * G + g], S), :]
        qv = q_ref[g]
        if qv.dtype != jnp.int32:
            qv = qv.astype(jnp.int32)  # int8 storage widens in-register
        gth = jnp.take_along_axis(
            W.astype(acc_dt), qv, axis=1,
            mode="promise_in_bounds",
        )
        acc = acc + vals_ref[g].astype(acc_dt) * gth
    out_ref[0] += acc.astype(out_ref.dtype)


# cap on scalar-prefetch ints per pallas_call (~256 KB of SMEM); plans
# with more steps are split into tile-aligned chunks of calls
_MAX_PREFETCH_INTS = 64 * 1024


def _pell_call(tiles, bases, values, qidx, x_panels, NT, G, dtype,
               interpret, S=SUBLANES):
    n_steps = tiles.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tile_of_step, bases
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (G, S, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, S, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
        ],
        out_specs=pl.BlockSpec(
            (1, S, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_pell_kernel, G=G, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, S, LANES), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * values.size,
            bytes_accessed=values.size * (values.dtype.itemsize + 4)
            + x_panels.size * x_panels.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tiles, bases, values, qidx, x_panels)


def _step_chunks(plan):
    """Tile-aligned (s0, s1, t0, t1) step/tile ranges, each under the
    prefetch cap.

    Every chunk owns a disjoint, contiguous tile range of the output, so
    independent pallas_calls can each write their own slice.  A single
    tile whose step count alone exceeds the cap is taken whole (the SMEM
    estimate is conservative).  Must be called with a CONCRETE
    tile_of_step when multiple chunks are needed — compute chunk
    metadata on the host BEFORE entering custom_vmap/jit (the wrapped
    kernels receive traced arrays; a single-chunk plan never touches
    the array)."""
    step_cap = max(_MAX_PREFETCH_INTS // (plan.G + 1), 1)
    # out blocks: supertiles for an XL WellPlan (NST), row tiles otherwise
    n_blocks = getattr(plan, "NST", plan.NT)
    if plan.n_steps <= step_cap:
        return [(0, plan.n_steps, 0, n_blocks)]
    tiles_host = np.asarray(plan.tile_of_step)
    chunks = []
    s0 = 0
    while s0 < plan.n_steps:
        s1 = min(s0 + step_cap, plan.n_steps)
        if s1 < plan.n_steps and tiles_host[s1] == tiles_host[s1 - 1]:
            # boundary cuts inside a tile: split before it, or — if that
            # single tile alone exceeds the cap — take it whole
            tile_cut = tiles_host[s1]
            first = int(np.searchsorted(tiles_host, tile_cut, side="left"))
            if first > s0:
                s1 = first
            else:
                s1 = int(np.searchsorted(tiles_host, tile_cut, side="right"))
        chunks.append(
            (s0, s1, int(tiles_host[s0]), int(tiles_host[s1 - 1]) + 1)
        )
        s0 = s1
    return chunks


class _PlanView:
    """Plan proxy with the static geometry of `plan` but explicit array
    leaves.  custom_vmap lifts its wrapped function to a jaxpr, and any
    TRACED closure constant (a Pell pytree riding through a jitted
    solve has tracer leaves) has no constant handler — so the arrays
    must travel as arguments, not closure (pre-r4 bug: vmapped GMRES
    over a Pell operator crashed with 'No constant handler')."""

    __slots__ = ("_geom", "values", "qidx", "bases", "tile_of_step", "rt",
                 "tsb")

    def __init__(self, geom, values, qidx, bases, tile_of_step, rt=None,
                 tsb=None):
        self._geom = geom
        self.values = values
        self.qidx = qidx
        self.bases = bases
        self.tile_of_step = tile_of_step
        self.rt = rt
        self.tsb = tsb

    def __getattr__(self, name):
        return getattr(self._geom, name)


@logged_kernel
def pell_spmv(plan: PellPlan, x, *, interpret=False):
    """y = A @ x through the PELL plan; x is (n,), returns (n_rows,).

    vmap-safe: batching over x dispatches to ``pell_spmm`` (Pallas calls
    cannot be auto-batched; the SpMM kernel is also the faster answer —
    the matrix streams once for all batched columns)."""
    assert getattr(plan, "rt", None) is None, (
        "WELL plan routed to the PELL kernel — use spmv_well.plan_spmv"
    )
    chunks = _step_chunks(plan)  # host metadata, static in the closure

    @jax.custom_batching.custom_vmap
    def spmv(x_, values, qidx, bases, tiles):
        p = _PlanView(plan, values, qidx, bases, tiles)
        return _pell_spmv_single(p, x_, interpret=interpret, chunks=chunks)

    @spmv.def_vmap
    def spmv_vmap(axis_size, in_batched, x_b, values, qidx, bases, tiles):
        p = _PlanView(plan, values, qidx, bases, tiles)
        yk = pell_spmm(p, x_b.T, interpret=interpret, chunks=chunks)
        return yk.T, True

    return spmv(x, plan.values, plan.qidx, plan.bases, plan.tile_of_step)


def _pell_spmv_single(plan: PellPlan, x, *, interpret=False, chunks=None):
    n_rows, n_cols = plan.shape
    G = plan.G
    NP = plan.NP
    S = getattr(plan, "S", SUBLANES)
    pad = S - 1
    total = (NP + 2 * pad + 1) * LANES
    xp = (
        jnp.zeros((total,), x.dtype)
        .at[pad * LANES: pad * LANES + n_cols]
        .set(x)
    )
    x_panels = xp.reshape(-1, LANES)

    if chunks is None:
        chunks = _step_chunks(plan)
    if len(chunks) == 1:
        out = _pell_call(
            plan.tile_of_step, plan.bases, plan.values, plan.qidx,
            x_panels, plan.NT, G, x.dtype, interpret, S=S,
        )
        return out.reshape(-1)[:n_rows]
    outs = []
    for s0, s1, t0, t1 in chunks:
        out = _pell_call(
            plan.tile_of_step[s0:s1] - t0,
            plan.bases[s0 * G: s1 * G],
            plan.values[s0 * G: s1 * G],
            plan.qidx[s0 * G: s1 * G],
            x_panels, t1 - t0, G, x.dtype, interpret, S=S,
        )
        outs.append(out)
    return jnp.concatenate(outs, axis=0).reshape(-1)[:n_rows]


# -- multi-RHS (SpMM) ---------------------------------------------------------


def _pell_spmm_kernel(tiles_ref, bases_ref, vals_ref, q_ref, x_ref,
                      out_ref, *, G, k, S=SUBLANES):
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
        qp = q_ref[g]
        if qp.dtype != jnp.int32:
            qp = qp.astype(jnp.int32)  # int8 storage widens in-register
        for j in range(k):
            W = x_ref[j, pl.ds(b, S), :]
            gth = jnp.take_along_axis(
                W.astype(acc_dt), qp, axis=1,
                mode="promise_in_bounds",
            )
            out_ref[0, j] += (vals * gth).astype(out_ref.dtype)


def _pell_spmm_call(tiles, bases, values, qidx, x_panels, NT, G, k, dtype,
                    interpret, S=SUBLANES):
    n_steps = tiles.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (G, S, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (G, S, LANES), lambda i, tiles, bs: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # X resident (k, pan, 128)
        ],
        out_specs=pl.BlockSpec(
            (1, k, S, LANES),
            lambda i, tiles, bs: (tiles[i], 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_pell_spmm_kernel, G=G, k=k, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NT, k, S, LANES), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * values.size * k,
            bytes_accessed=values.size
            * (values.dtype.itemsize + 4)
            + x_panels.size * x_panels.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tiles, bases, values, qidx, x_panels)


# VMEM budget for the resident k-column X operand of pell_spmm; beyond it
# the columns are processed in groups (the matrix then streams once per
# GROUP, not once per column — still a k_group-fold traffic saving)
_SPMM_X_BYTES = 64 << 20


@logged_kernel
def pell_spmm(plan: PellPlan, X, *, interpret=False, chunks=None):
    """Y = A @ X for (n, k) X: the matrix streams from HBM ONCE for all k
    columns (vs k passes of pell_spmv), so HBM bytes/nnz-column fall to
    8/k.  Returns (n_rows, k).

    Unconditional (reference: core/matrix/csr.cpp:184-204 multivector
    apply has no size gate): plans beyond the scalar-prefetch cap are
    chunked at tile boundaries exactly as pell_spmv, and column counts
    whose resident X would exceed the VMEM budget are processed in
    column groups."""
    n_rows, n_cols = plan.shape
    k = X.shape[1]
    G = plan.G
    NP = plan.NP
    S = getattr(plan, "S", SUBLANES)
    pad = S - 1
    n_pan = NP + 2 * pad + 1

    per_col_bytes = n_pan * LANES * X.dtype.itemsize
    k_group = max(1, min(k, _SPMM_X_BYTES // max(per_col_bytes, 1)))
    if k_group < k:
        groups = [
            pell_spmm(plan, X[:, j: j + k_group], interpret=interpret,
                      chunks=chunks)
            for j in range(0, k, k_group)
        ]
        return jnp.concatenate(groups, axis=1)

    Xp = jnp.zeros((k, n_pan * LANES), X.dtype)
    Xp = Xp.at[:, pad * LANES: pad * LANES + n_cols].set(X.T)
    x_panels = Xp.reshape(k, n_pan, LANES)

    if chunks is None:
        chunks = _step_chunks(plan)
    if len(chunks) == 1:
        out = _pell_spmm_call(
            plan.tile_of_step, plan.bases, plan.values, plan.qidx,
            x_panels, plan.NT, G, k, X.dtype, interpret, S=S,
        )
        return out.transpose(0, 2, 3, 1).reshape(-1, k)[:n_rows]
    outs = []
    for s0, s1, t0, t1 in chunks:
        out = _pell_spmm_call(
            plan.tile_of_step[s0:s1] - t0,
            plan.bases[s0 * G: s1 * G],
            plan.values[s0 * G: s1 * G],
            plan.qidx[s0 * G: s1 * G],
            x_panels, t1 - t0, G, k, X.dtype, interpret, S=S,
        )
        outs.append(out)
    out = jnp.concatenate(outs, axis=0)
    # (NT, k, S, 128) -> (NT*S*128, k)
    return out.transpose(0, 2, 3, 1).reshape(-1, k)[:n_rows]


# -- plan cache + Csr-facing API ----------------------------------------------


def _plan_bytes(plan) -> int:
    """Materialized padded-slot bytes a cached plan pins on the device.

    A stats-only or declined plan (values is None) pins nothing beyond
    its O(1) geometry."""
    if plan is None or getattr(plan, "values", None) is None:
        return 0
    total = 0
    arrs = [plan.values, plan.qidx, plan.bases, plan.tile_of_step,
            getattr(plan, "rt", None), getattr(plan, "tsb", None)]
    for arr in arrs:
        if arr is not None:
            total += arr.size * arr.dtype.itemsize
    return total


class _ByteLRU:
    """Bytes-budgeted LRU for PELL plans (review: the count-16 FIFO could
    pin ~32 GB of padded slots on a 16 GB-HBM chip).  Eviction is by the
    SUM of materialized slot bytes, oldest-use first; a single plan
    larger than the budget is still cached alone (evicting everything
    else) so repeated applies of one huge matrix don't rebuild per call."""

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes
        self._d: dict = {}  # key -> (payload, nbytes); insertion = LRU order

    def get(self, key):
        hit = self._d.get(key)
        if hit is None:
            return None
        self._d.pop(key)
        self._d[key] = hit  # move to MRU position
        return hit[0]

    def put(self, key, payload, nbytes: int):
        self._d.pop(key, None)
        self._d[key] = (payload, nbytes)
        total = sum(b for _, b in self._d.values())
        while total > self.max_bytes and len(self._d) > 1:
            oldest = next(iter(self._d))
            total -= self._d.pop(oldest)[1]

    def clear(self):
        self._d.clear()

    def __len__(self):
        return len(self._d)

    def total_bytes(self):
        return sum(b for _, b in self._d.values())


def _cache_budget_bytes() -> int:
    import os

    try:
        return int(
            float(os.environ.get("GINKGO_TPU_PLAN_CACHE_MB", "2048")) * 2**20
        )
    except ValueError:
        return 2 << 30


_PLAN_CACHE = _ByteLRU(_cache_budget_bytes())


def _plan_for(row_ptrs, col_idxs, values, shape):
    """Plan cache keyed on the identity of the storage arrays (a Csr is
    immutable; repeated applies of the same matrix reuse the plan).  The
    strong refs kept in the cache entry make the id()s stable.

    The cached plan is whichever of PELL / WELL the cost model picks
    (spmv_well.choose_unstructured_plan) — WELL covers the locality-free
    patterns where PELL's diagonal-base slots inflate unboundedly."""
    from .spmv_well import choose_unstructured_plan

    key = (id(row_ptrs), id(col_idxs), id(values), tuple(shape))
    hit = _PLAN_CACHE.get(key)
    if (
        hit is not None and hit[0] is row_ptrs and hit[1] is col_idxs
        and hit[2] is values
    ):
        return hit[3]
    plan = choose_unstructured_plan(
        np.asarray(row_ptrs), np.asarray(col_idxs), np.asarray(values),
        shape, max_cells=_HARD_PAD_BYTES // 8,
    )
    if plan.too_large:
        raise MemoryError(
            "PELL/WELL plans for this pattern would materialize "
            f"{plan.total_cells * 8 / 2**30:.1f} GB of padded slots "
            f"(inflation {plan.inflation:.0f}x); use an XLA strategy "
            "(classical/merge_path) or reorder the matrix (e.g. Rcm) to "
            "improve column locality"
        )
    _PLAN_CACHE.put(
        key, (row_ptrs, col_idxs, values, plan), _plan_bytes(plan)
    )
    return plan


def _spmm_plan(plan, row_ptrs, col_idxs, values, shape):
    """Multi-RHS variant of a cached plan.

    The auto-S cost model optimizes the single-vector stream; the k-RHS
    SpMM kernel measurably prefers S=8 (on-chip interleaved A/B at 262k
    rows, k=8: S=8 48.9 vs S=32 34.3 Gnnz-col/s, while S=32 wins the
    SpMV 21.9 vs 18.8).  For a PELL plan with S != 8 an S=8 sibling is
    built and cached under a tagged key; WELL plans are S=8 by
    construction."""
    S = getattr(plan, "S", SUBLANES)
    if getattr(plan, "rt", None) is not None or S == SUBLANES:
        return plan
    key = ("spmm8", id(row_ptrs), id(col_idxs), id(values), tuple(shape))
    hit = _PLAN_CACHE.get(key)
    if (
        hit is not None and hit[0] is row_ptrs and hit[1] is col_idxs
        and hit[2] is values
    ):
        return hit[3]
    p8 = PellPlan(
        np.asarray(row_ptrs), np.asarray(col_idxs), np.asarray(values),
        shape, q_dtype=np.int8, S=SUBLANES,
        max_cells=_HARD_PAD_BYTES // 8,
    )
    if p8.too_large:  # padding at S=8 exceeds the cap: keep the original
        return plan
    _PLAN_CACHE.put(
        key, (row_ptrs, col_idxs, values, p8), _plan_bytes(p8)
    )
    return p8


def csr_spmv(row_ptrs, col_idxs, values, arr, n_rows, *, interpret=False):
    """Csr 'pallas' strategy entry (csr.py): SpMM kernel for multi-RHS.

    Host-builds (and caches) the PELL-or-WELL plan, so this path must be
    entered OUTSIDE jit; inside jit use a prebuilt plan / the Pell format
    class."""
    from .spmv_well import plan_spmm, plan_spmv

    shape = (n_rows, arr.shape[0])
    plan = _plan_for(row_ptrs, col_idxs, values, shape)
    if arr.shape[1] > 1:
        plan = _spmm_plan(plan, row_ptrs, col_idxs, values, shape)
        return plan_spmm(plan, arr, interpret=interpret)
    return plan_spmv(plan, arr[:, 0], interpret=interpret)[:, None]


# ---------------------------------------------------------------------------
# Generic per-format streaming fast path
# ---------------------------------------------------------------------------

_OP_PLAN_CACHE = _ByteLRU(_cache_budget_bytes())
# absolute ceiling on materialized padded bytes regardless of inflation:
# even a "good" 16x expansion of a huge nnz must not exhaust HBM/host RAM
_HARD_PAD_BYTES = 2 << 30


def linop_streaming_spmv(op, arr, *, max_inflation=16.0,
                         max_pad_bytes=256 << 20):
    """TPU streaming SpMV for any unstructured format (Ell / Sellp /
    Hybrid / Fbcsr / Coo / SparsityCsr).

    The reference maintains a hand-tuned CUDA kernel family per format
    (cuda/matrix/ell_kernels.cu, sellp_kernels.cu, coo_kernels.cu,
    fbcsr_kernels.cu); on TPU the losing move is the gather those kernels
    all avoid, so every format instead lowers to the ONE streaming PELL
    Pallas kernel through a host-built plan derived from its CSR view.
    The plan is cached on the identity of the format's storage arrays
    (formats are frozen pytrees — repeated applies of the same object
    reuse the plan; the cache keeps strong refs so ids stay stable).

    Eager-gated: returns None (caller falls back to its XLA kernel) when
    Pallas is disabled, the backend is not TPU (unless
    GINKGO_TPU_FORCE_STREAMING=1 forces the interpreted kernel — test
    hook), any storage leaf is a tracer (plan building needs host
    arrays), the pattern is empty, or the plan's padding is too large.

    The padding gate is memory-aware: inflation beyond ``max_inflation``
    is still accepted while the padded slot arrays stay under
    ``max_pad_bytes`` — at ~7 ns/element the gather fallback is 3-4
    orders of magnitude slower than streaming padded zeros, so for
    matrices whose padded form simply *fits*, streaming wins at any
    inflation; the inflation bound only protects HBM on large nnz."""
    import os

    if os.environ.get("GINKGO_TPU_NO_PALLAS"):
        return None
    force = bool(os.environ.get("GINKGO_TPU_FORCE_STREAMING"))
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or force):
        return None
    leaves = jax.tree_util.tree_leaves(op)
    if any(isinstance(leaf, jax.core.Tracer) for leaf in leaves):
        return None
    key = (type(op).__name__, tuple(id(leaf) for leaf in leaves),
           tuple(op.shape))
    hit = _OP_PLAN_CACHE.get(key)
    if (
        hit is not None and len(hit[0]) == len(leaves)
        and all(a is b for a, b in zip(hit[0], leaves))
    ):
        plan = hit[1]  # None = cached decline
    else:
        # the leaves are concrete, but under an ACTIVE outer trace the
        # jnp ops inside to_csr would stage and return tracers;
        # compile-time eval keeps the whole conversion concrete
        with jax.ensure_compile_time_eval():
            csr = op.to_csr()
        ip = np.asarray(csr.row_ptrs)
        ci = np.asarray(csr.col_idxs)
        vv = np.asarray(csr.values)
        # stats-only passes first: the padding gates must run BEFORE the
        # padded arrays are allocated (a low-locality pattern can
        # inflate to tens of GB).  PELL and WELL are both candidates;
        # the cheaper acceptable layout wins (WELL covers locality-free
        # patterns where PELL inflates unboundedly).
        from .spmv_well import WellPlan, _plan_cost

        shape = tuple(op.shape)
        pell_s = PellPlan(ip, ci, vv, shape, q_dtype=np.int8, S="auto",
                          materialize=False)
        well_s = (
            WellPlan(ip, ci, vv, shape, materialize=False)
            if pell_s.inflation > 4.0 and pell_s.nnz > 0
            else None
        )

        def _ok(stats, bpc):
            pad = stats.total_cells * bpc
            return stats.nnz > 0 and (
                stats.inflation <= max_inflation or pad <= max_pad_bytes
            ) and pad <= _HARD_PAD_BYTES

        bpc_p = vv.dtype.itemsize + 1  # int8 lane indices
        cands = []
        if _ok(pell_s, bpc_p):
            cands.append(
                (_plan_cost(pell_s.n_steps, pell_s.total_cells, bpc_p)
                 + pell_s.n_steps * pell_s.G * 7e-9,
                 "pell")
            )
        if well_s is not None and _ok(well_s, well_s.bytes_per_cell):
            cands.append((well_s.modeled_seconds, "well"))
        if not cands:
            plan = None
        elif min(cands)[1] == "pell":
            plan = PellPlan(ip, ci, vv, shape, q_dtype=np.int8, S="auto")
        else:
            plan = WellPlan(ip, ci, vv, shape, T=well_s.T)
        _OP_PLAN_CACHE.put(key, (leaves, plan), _plan_bytes(plan))
    if plan is None:
        return None
    from .spmv_well import plan_spmm, plan_spmv

    interpret = not on_tpu
    if arr.shape[1] > 1:
        if getattr(plan, "rt", None) is None and plan.S != SUBLANES:
            # SpMM prefers the S=8 layout (see _spmm_plan); build and
            # cache the sibling under a tagged key on the same leaves
            key8 = ("spmm8",) + key
            hit8 = _OP_PLAN_CACHE.get(key8)
            if (
                hit8 is not None and len(hit8[0]) == len(leaves)
                and all(a is b for a, b in zip(hit8[0], leaves))
            ):
                plan = hit8[1]
            else:
                with jax.ensure_compile_time_eval():
                    csr8 = op.to_csr()
                p8 = PellPlan(
                    np.asarray(csr8.row_ptrs), np.asarray(csr8.col_idxs),
                    np.asarray(csr8.values), tuple(op.shape),
                    q_dtype=np.int8, S=SUBLANES,
                    max_cells=_HARD_PAD_BYTES // 8,
                )
                if not p8.too_large:
                    _OP_PLAN_CACHE.put(
                        key8, (leaves, p8), _plan_bytes(p8)
                    )
                    plan = p8
        out = plan_spmm(plan, arr, interpret=interpret)
    else:
        out = plan_spmv(plan, arr[:, 0], interpret=interpret)[:, None]
    return out.astype(arr.dtype)

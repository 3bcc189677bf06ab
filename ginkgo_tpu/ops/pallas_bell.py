"""Pallas TPU kernel for Blocked-ELL SpMV (general unstructured matrices).

Reference analog: the load-balanced / merge-path CSR CUDA kernels
(cuda/matrix/csr_kernels.cu:121-310) — the "make arbitrary sparsity fast"
role.  TPU redesign (matrix/bell.py layout): no per-element gather exists,
so x is consumed in 128-lane *panels* selected by a scalar-prefetched panel
id: `PrefetchScalarGridSpec` feeds panel_ids to the x BlockSpec's index_map,
and the Pallas pipeline turns every panel fetch into a double-buffered
HBM->VMEM DMA overlapped with the previous panel's FMA.

Grid = (row_blocks, K panels); the output block for row-block i is revisited
across the K panel steps and accumulated in place (init at k == 0).
Padding panels carry all-zero values, so no validity mask is needed in the
kernel (their fetched x panel contributes 0); panel_ids is passed FLAT
(1-D) because 2-D SMEM prefetch operands are lane-padded to 128 ints/row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _bell_kernel(pids_ref, vals_ref, x_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    panel = vals_ref[0, 0].astype(jnp.float32)  # (BR, LANES)
    xp = x_ref[0, 0].astype(jnp.float32)  # (1, LANES) block -> (LANES,)
    # (BR, LANES) * (LANES,) summed over lanes: a VPU reduce —
    # MXU matvec with k=1 would waste the systolic array
    out_ref[:, 0] += jnp.sum(panel * xp, axis=1).astype(out_ref.dtype)


def _bell_vmem_kernel(pids_ref, vals_ref, x_ref, out_ref, *, G, K, BR):
    """x fully VMEM-resident variant: one grid step covers G row-blocks with
    the K-panel loop unrolled — amortizes per-step grid overhead ~G*K-fold.
    Panel selection is a dynamic sublane slice of the resident x, no DMA."""
    i = pl.program_id(0)
    for g in range(G):
        acc = jnp.zeros((BR, 1), jnp.float32)
        for k in range(K):
            pid = pids_ref[(i * G + g) * K + k]
            xp = x_ref[pl.ds(pid, 1), :]  # (1, LANES) dynamic VMEM slice
            prod = vals_ref[g, k].astype(jnp.float32) * xp.astype(jnp.float32)
            acc += jnp.sum(prod, axis=1, keepdims=True)
        out_ref[g * BR:(g + 1) * BR] = acc.astype(out_ref.dtype)


def _bell_spmm_kernel(pids_ref, vals_ref, x_ref, out_ref, *, G, K, BR):
    """Multi-RHS variant: each (BR, 128) panel contracts a (k, 128) slab of
    the resident x on the MXU — BELL SpMM is a stream of small matmuls.
    x is carried transposed (k, m_pad) so its VMEM footprint is
    ~max(k,8) * m * 4 B instead of lane-padding every column to 128."""
    i = pl.program_id(0)
    kcols = out_ref.shape[1]
    for g in range(G):
        acc = jnp.zeros((BR, kcols), jnp.float32)
        for k in range(K):
            pid = pids_ref[(i * G + g) * K + k]
            # dynamic lane-dim slice of resident x^T — validated on v5e
            # hardware (exact vs dense oracle at k=8, see PERF.md)
            xp = x_ref[:, pl.ds(pid * LANES, LANES)]  # (k, LANES)
            acc += jax.lax.dot_general(
                vals_ref[g, k], xp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[g * BR:(g + 1) * BR] = acc.astype(out_ref.dtype)


@logged_kernel
def bell_spmm_pallas(values, panel_ids, x_t, *, interpret=False):
    """Y = A @ X for BELL storage with multiple RHS.

    values: (NRB, K, BR, 128) zero-padded panels; panel_ids: (NRB, K);
    x_t: X TRANSPOSED, (k, m_pad) with m_pad = NPC * 128.
    Returns (NRB * BR, k)."""
    NRB, K, BR, lanes = values.shape
    assert lanes == LANES
    kcols, m_pad = x_t.shape
    flat_ids = panel_ids.reshape(-1).astype(jnp.int32)
    # VMEM budget: values block <= 4MB AND output block <= 2MB.  The out
    # block (G*BR, kcols) is lane-padded to 128 in VMEM, so its footprint
    # is G*BR*512 bytes regardless of kcols <= 128.
    G = max(1, min(
        NRB,
        (1 << 22) // max(1, K * BR * LANES * 4),
        (1 << 21) // max(1, BR * LANES * 4),
    ))
    n_steps = -(-NRB // G)
    NRB_pad = n_steps * G
    if NRB_pad != NRB:
        values = jnp.pad(values, ((0, NRB_pad - NRB), (0, 0), (0, 0), (0, 0)))
        flat_ids = jnp.pad(flat_ids, (0, (NRB_pad - NRB) * K))

    kernel = functools.partial(_bell_spmm_kernel, G=G, K=K, BR=BR)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (G, K, BR, LANES), lambda i, pids: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x^T resident
        ],
        out_specs=pl.BlockSpec(
            (G * BR, kcols), lambda i, pids: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NRB_pad * BR, kcols), x_t.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * NRB_pad * K * BR * LANES * kcols,
            bytes_accessed=(values.size + kcols * m_pad + NRB_pad * BR * kcols)
            * values.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(flat_ids, values, x_t)
    return out[: NRB * BR]


@logged_kernel
def bell_spmv_pallas(values, panel_ids, panel_valid, x_panels, *, interpret=False):
    """y = A @ x for BELL storage.

    values: (NRB, K, BR, 128) with zero padding panels,
    panel_ids: (NRB, K) int32 (flattened internally),
    panel_valid: unused (kept for API symmetry with the XLA path),
    x_panels: (NPC, 128).  Returns (NRB * BR,)."""
    del panel_valid
    NRB, K, BR, lanes = values.shape
    assert lanes == LANES
    flat_ids = panel_ids.reshape(-1).astype(jnp.int32)

    # fast path: x resident in VMEM (dynamic-slice panel selection, G row
    # blocks per grid step).  Gate on x + one values block fitting in VMEM.
    NPC = x_panels.shape[0]
    x_bytes = NPC * LANES * x_panels.dtype.itemsize
    G = max(1, min(NRB, (1 << 22) // max(1, K * BR * LANES * 4)))  # <=4MB blk
    if x_bytes <= 6 * (1 << 20):
        n_steps = -(-NRB // G)
        NRB_pad = n_steps * G
        vals = values
        ids = flat_ids
        if NRB_pad != NRB:
            vals = jnp.pad(values, ((0, NRB_pad - NRB), (0, 0), (0, 0), (0, 0)))
            ids = jnp.pad(flat_ids, (0, (NRB_pad - NRB) * K))
        kernel = functools.partial(_bell_vmem_kernel, G=G, K=K, BR=BR)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (G, K, BR, LANES), lambda i, pids: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x resident
            ],
            out_specs=pl.BlockSpec(
                (G * BR, 1), lambda i, pids: (i, 0), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NRB_pad * BR, 1), x_panels.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * NRB_pad * K * BR * LANES,
                bytes_accessed=(vals.size + NPC * LANES + NRB_pad * BR)
                * values.dtype.itemsize,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(ids, vals, x_panels)
        return out[: NRB * BR, 0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # flat panel_ids
        grid=(NRB, K),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BR, LANES), lambda i, k, pids: (i, k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # x panels carried as (NPC, 1, 128): the (1, 128) trailing block
            # equals the array's trailing dims, satisfying TPU tiling while
            # keeping a 512-byte fetch per panel
            pl.BlockSpec(
                (1, 1, LANES), lambda i, k, pids: (pids[i * K + k], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BR, 1), lambda i, k, pids: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _bell_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NRB * BR, 1), x_panels.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * NRB * K * BR * LANES,
            bytes_accessed=(values.size + NRB * K * LANES + NRB * BR)
            * values.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(flat_ids, values, x_panels[:, None, :])
    return out[:, 0]

"""Pallas TPU kernel for DIA (banded) SpMV — the hot-path kernel.

Reference analog: the hand-written per-format CUDA SpMV kernel families
(cuda/matrix/csr_kernels.cu:121-386, common/cuda_hip/matrix/coo_kernels.hpp.inc).
On TPU the stencil/banded class is served by the DIA decomposition
(matrix/dia.py); this kernel is its speed-of-light implementation:

  y[i] = sum_d diags[d, i] * x[i + off_d]

with x in the (rows, 128)-lane-tiled frame.  Design:

- grid over row blocks of ``block_rows`` sublanes; diagonal values and the
  output ride the automatic Pallas pipeline (BlockSpec index maps).
- x stays in HBM; each grid step DMAs ONE halo'd slab of x
  (block_rows + row-span-of-offsets rows) into a VMEM scratch, double
  buffered so the next slab's DMA overlaps the current block's compute.
  This reads x once per apply — the XLA fallback in matrix/dia.py reads a
  shifted copy of x per diagonal (or pays a 128x128 permutation matmul).
- a diagonal offset ``off`` splits into a sublane shift q = off // 128 and a
  lane shift s = off % 128; the lane shift is a VPU circular ``pltpu.roll``
  combined with a lane-id select between sublane rows q and q+1 (exact, no
  MXU, no gather).

Offsets are static Python ints, so the per-diagonal loop fully unrolls at
trace time into straight-line VPU code.

Memory traffic per apply: (nd + 2) * 4 bytes per padded row-element — the
same roofline model as BASELINE.md's SpMV target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _plan(offsets, block_rows):
    """Static per-diagonal (q, s) split and halo geometry."""
    qs = [(off // LANES, off % LANES) for off in offsets]
    qmin = min((q for q, _ in qs), default=0)
    qmax = max((q for q, _ in qs), default=0)
    qmin = min(qmin, 0)
    qmax = max(qmax, 0)
    halo = qmax - qmin + 1  # +1 row for the lane-wrap partner row
    pad_lo = max(0, -qmin)
    pad_hi = max(0, qmax + 1)
    return qs, qmin, halo, pad_lo, pad_hi


def _dia_advanced_kernel(scal, x_hbm, diags, y, out, xs, sem, *, qs, qmin,
                         block_rows, halo, pad_lo, nbuf=2):
    """Fused out = alpha * (A @ x) + beta * y — same streaming structure as
    _dia_kernel with the y block riding the automatic pipeline; removes the
    separate axpy pass of apply_advanced (one fewer read+write of y-sized
    data per call).  scal is an SMEM (2,) [alpha, beta]."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slab_rows = block_rows + halo

    def slab_dma(slot, blk):
        start = blk * block_rows + (qmin + pad_lo)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, slab_rows), :], xs.at[slot], sem.at[slot]
        )

    @pl.when(i == 0)
    def _():
        slab_dma(0, 0).start()

    @pl.when(i + 1 < n_blocks)
    def _():
        slab_dma((i + 1) % nbuf, i + 1).start()

    slab_dma(i % nbuf, i).wait()
    slab = xs[i % nbuf]

    acc = jnp.zeros((block_rows, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 1)
    for j, (q, s) in enumerate(qs):
        base = q - qmin
        cur = slab[base:base + block_rows]
        if s == 0:
            shifted = cur
        else:
            nxt = slab[base + 1:base + 1 + block_rows]
            rc = pltpu.roll(cur, -s % LANES, 1)
            rn = pltpu.roll(nxt, -s % LANES, 1)
            shifted = jnp.where(lane < LANES - s, rc, rn)
        acc = acc + diags[j].astype(jnp.float32) * shifted.astype(jnp.float32)
    out[:] = (scal[0] * acc + scal[1] * y[:].astype(jnp.float32)).astype(
        out.dtype
    )


def _dia_kernel(x_hbm, diags, out, xs, sem, *, qs, qmin, block_rows, halo,
                pad_lo, nbuf=2):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    slab_rows = block_rows + halo

    def slab_dma(slot, blk):
        start = blk * block_rows + (qmin + pad_lo)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, slab_rows), :],
            xs.at[slot],
            sem.at[slot],
        )

    # warm-up: first grid step starts its own slab (and the pipeline)
    @pl.when(i == 0)
    def _():
        slab_dma(0, 0).start()

    # prefetch next block's slab while this block computes
    @pl.when(i + 1 < n_blocks)
    def _():
        slab_dma((i + 1) % nbuf, i + 1).start()

    slab_dma(i % nbuf, i).wait()
    slab = xs[i % nbuf]  # (slab_rows, LANES)

    acc = jnp.zeros((block_rows, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 1)
    for j, (q, s) in enumerate(qs):
        base = q - qmin
        cur = slab[base:base + block_rows]
        if s == 0:
            shifted = cur
        else:
            nxt = slab[base + 1:base + 1 + block_rows]
            rc = pltpu.roll(cur, -s % LANES, 1)
            rn = pltpu.roll(nxt, -s % LANES, 1)
            shifted = jnp.where(lane < LANES - s, rc, rn)
        acc = acc + diags[j].astype(jnp.float32) * shifted.astype(jnp.float32)
    out[:] = acc.astype(out.dtype)


@logged_kernel
def dia_advanced_spmv_pallas(diags, offsets, x2, alpha, beta, y2, *,
                             block_rows=512, interpret=False):
    """y = alpha * A @ x2 + beta * y2 fused (see _dia_advanced_kernel)."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    if nd == 0:
        return jnp.asarray(beta) * y2
    block_rows = min(block_rows, max(8, R))
    n_blocks = -(-R // block_rows)
    R_pad = n_blocks * block_rows
    if R_pad != R:
        diags = jnp.pad(diags, ((0, 0), (0, R_pad - R), (0, 0)))
        x2 = jnp.pad(x2, ((0, R_pad - R), (0, 0)))
        y2 = jnp.pad(y2, ((0, R_pad - R), (0, 0)))
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, block_rows)
    xp = jnp.pad(x2, ((pad_lo, pad_hi), (0, 0)))
    scal = jnp.stack(
        [jnp.asarray(alpha, jnp.float32).reshape(()),
         jnp.asarray(beta, jnp.float32).reshape(())]
    )

    kernel = functools.partial(
        _dia_advanced_kernel, qs=qs, qmin=qmin, block_rows=block_rows,
        halo=halo, pad_lo=pad_lo,
    )
    slab_rows = block_rows + halo
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [alpha, beta]
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((nd, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, LANES), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab_rows, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nd + 1) * R_pad * LANES,
            bytes_accessed=(nd + 3) * R_pad * LANES * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scal, xp, diags, y2)
    return out[:R]


def _dia_spmm_kernel(x_hbm, diags, out, xs, sem, *, qs, qmin, block_rows,
                     halo, pad_lo, kcols, nbuf=2):
    """Multi-RHS variant: grid (row_blocks, k).  The diagonal block's index
    map ignores j, so Pallas keeps it resident across the k inner steps —
    diagonals are read once per row block, x once per column: the optimal
    (nd + 2k)·n traffic."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_blocks = pl.num_programs(0)
    slab_rows = block_rows + halo

    def slab_dma(slot, blk, col):
        start = blk * block_rows + (qmin + pad_lo)
        return pltpu.make_async_copy(
            x_hbm.at[col, pl.ds(start, slab_rows), :], xs.at[slot],
            sem.at[slot],
        )

    t = i * kcols + j  # linear step index

    @pl.when(t == 0)
    def _():
        slab_dma(0, 0, 0).start()

    @pl.when(t + 1 < n_blocks * kcols)
    def _():
        nxt = t + 1
        slab_dma((nxt) % nbuf, nxt // kcols, nxt % kcols).start()

    slab_dma(t % nbuf, i, j).wait()
    slab = xs[t % nbuf]

    acc = jnp.zeros((block_rows, LANES), jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (block_rows, LANES), 1)
    for jj, (q, s) in enumerate(qs):
        base = q - qmin
        cur = slab[base:base + block_rows]
        if s == 0:
            shifted = cur
        else:
            nxt_rows = slab[base + 1:base + 1 + block_rows]
            rc = pltpu.roll(cur, -s % LANES, 1)
            rn = pltpu.roll(nxt_rows, -s % LANES, 1)
            shifted = jnp.where(lane < LANES - s, rc, rn)
        acc = acc + diags[jj].astype(jnp.float32) * shifted.astype(jnp.float32)
    out[0] = acc.astype(out.dtype)


@logged_kernel
def dia_spmm_pallas(diags, offsets, xk, *, block_rows=512, interpret=False):
    """Y = A @ X for k RHS columns.  xk: (k, R, 128) — column-major stack of
    row frames.  Returns (k, R, 128)."""
    nd, R, lanes = diags.shape
    assert lanes == LANES
    kcols = xk.shape[0]
    if nd == 0:
        return jnp.zeros_like(xk)
    block_rows = min(block_rows, max(8, R))
    n_blocks = -(-R // block_rows)
    R_pad = n_blocks * block_rows
    if R_pad != R:
        diags = jnp.pad(diags, ((0, 0), (0, R_pad - R), (0, 0)))
        xk = jnp.pad(xk, ((0, 0), (0, R_pad - R), (0, 0)))
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, block_rows)
    xp = jnp.pad(xk, ((0, 0), (pad_lo, pad_hi), (0, 0)))

    kernel = functools.partial(
        _dia_spmm_kernel, qs=qs, qmin=qmin, block_rows=block_rows, halo=halo,
        pad_lo=pad_lo, kcols=kcols,
    )
    slab_rows = block_rows + halo
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, kcols),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            # index map ignores j -> block stays resident across columns
            pl.BlockSpec((nd, block_rows, LANES), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, LANES), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kcols, R_pad, LANES), xk.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab_rows, LANES), xk.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * R_pad * LANES * kcols,
            bytes_accessed=(nd + 2 * kcols) * R_pad * LANES
            * xk.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, diags)
    return out[:, :R]


@logged_kernel
def dia_spmv_pallas(diags, offsets, x2, *, block_rows=512, interpret=False):
    """y2 = A @ x2 for DIA ``diags`` (nd, R, 128) / static ``offsets`` and x2
    (R, 128) in the row frame.  Returns (R, 128).

    vmap-safe: batching over x2 dispatches to the k-RHS SpMM kernel
    (Pallas calls cannot be auto-batched by JAX — the HBM-resident
    operand's BlockSpec does not admit an extra axis), so solver drivers
    may ``jax.vmap`` whole single-RHS solves over columns (e.g. the
    streaming GMRES multi-RHS path, solver/gmres.py)."""

    @jax.custom_batching.custom_vmap
    def spmv(diags_, x2_):
        return _dia_spmv_call(diags_, offsets, x2_, block_rows=block_rows,
                              interpret=interpret)

    @spmv.def_vmap
    def spmv_vmap(axis_size, in_batched, diags_b, x2_b):
        d_b, x_b = in_batched
        if d_b:
            # batched matrix: serial map (rare; keeps Pallas un-batched)
            dd = diags_b if d_b else jnp.broadcast_to(
                diags_b[None], (axis_size,) + diags_b.shape)
            xx = x2_b if x_b else jnp.broadcast_to(
                x2_b[None], (axis_size,) + x2_b.shape)
            y = jax.lax.map(
                lambda ab: _dia_spmv_call(ab[0], offsets, ab[1],
                                          block_rows=block_rows,
                                          interpret=interpret),
                (dd, xx))
            return y, True
        # x batched on the leading axis == the SpMM (k, R, 128) layout
        yk = dia_spmm_pallas(diags_b, offsets, x2_b, block_rows=block_rows,
                             interpret=interpret)
        return yk, True

    return spmv(diags, x2)


def _dia_spmv_call(diags, offsets, x2, *, block_rows=512, interpret=False):
    nd, R, lanes = diags.shape
    assert lanes == LANES
    if nd == 0:
        return jnp.zeros((R, LANES), x2.dtype)
    block_rows = min(block_rows, max(8, R))
    # pad the row frame to a whole number of blocks
    n_blocks = -(-R // block_rows)
    R_pad = n_blocks * block_rows
    if R_pad != R:
        diags = jnp.pad(diags, ((0, 0), (0, R_pad - R), (0, 0)))
        x2 = jnp.pad(x2, ((0, R_pad - R), (0, 0)))
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, block_rows)
    xp = jnp.pad(x2, ((pad_lo, pad_hi), (0, 0)))

    kernel = functools.partial(
        _dia_kernel, qs=qs, qmin=qmin, block_rows=block_rows, halo=halo,
        pad_lo=pad_lo,
    )
    slab_rows = block_rows + halo
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((nd, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R_pad, LANES), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, slab_rows, LANES), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nd * R_pad * LANES,
            bytes_accessed=(nd + 2) * R_pad * LANES * x2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, diags)
    return out[:R]

"""Whole-solve fused triangular solve: all Jacobi-Richardson sweeps in
ONE Pallas kernel, iterate VMEM-resident.

Reference role: the vendor trisolve bindings (cusparse/hipsparse
csrsv; benchmark/utils/*_linops) and the syncfree CUDA solver
(common/cuda_hip/solver/common_trs_kernels) — the reference's
lower/upper_trs apply path.  The TPU 'sweeps' algorithm
(solver/triangular.py) runs x^{m+1} = D^{-1}(b - (T - D) x^m); the
streaming form pays full HBM traffic per sweep, while this kernel keeps
b, the iterate and the staged SpMV source in VMEM and streams the
banded triangle diagonals only.

Gate: the strict triangle is a Dia (banded factors — the choose_format
path in solver/triangular._build), sweep count static, everything fits
VMEM.  Used by TriangularSolver._solve_sweeps on TPU and therefore by
every ILU/IC preconditioner apply outside the fused-solver kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

from .pallas_dia import _plan
from .pallas_cg import LANES, _chunk_rows, cg_vmem_budget_bytes
from .pallas_cg_ilu import _tri_sweeps


def trs_vmem_fits(nd: int, R: int, itemsize: int = 4,
                  halo_rows: int = 0) -> bool:
    """b + iterate + staged frames + inverse diagonal + triangle diags."""
    frame = R * LANES * 4
    # 4 full f32 frames live in VMEM: b_s, out_s (iterate), w_s (staged
    # source, + halo rows), invd; diags ride in_specs VMEM at itemsize
    vec_frames = 4.0 + halo_rows / max(R, 1)
    return nd * R * LANES * itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _trs_kernel(diags, invd, b_hbm, x_hbm, b_s, out_s, w_s, sems, *, qs,
                pad, R, sweeps):
    C = _chunk_rows(R)
    n_chunks = R // C
    w_lo, w_hi = pad
    Rw = R + w_lo + w_hi

    cp_b = pltpu.make_async_copy(b_hbm, b_s, sems.at[0])
    cp_b.start()
    cp_b.wait()
    if w_lo:
        w_s[0:w_lo] = jnp.zeros((w_lo, LANES), jnp.float32)
    if w_hi:
        w_s[Rw - w_hi:Rw] = jnp.zeros((w_hi, LANES), jnp.float32)

    _tri_sweeps(
        lambda c0: b_s[pl.ds(c0, C), :], diags, invd, qs, sweeps, out_s,
        w_s, w_lo, C, n_chunks,
    )

    cp_x = pltpu.make_async_copy(out_s, x_hbm, sems.at[1])
    cp_x.start()
    cp_x.wait()


@logged_kernel
def trs_vmem_solve(T_dia, invd2, b2, *, sweeps, interpret=False):
    """x = approx T^{-1} b in one kernel.

    T_dia: matrix.dia.Dia strict triangle; invd2: (R, 128) inverse
    diagonal frame; b2: (R, 128) f32 rhs frame.  Returns the (R, 128)
    solution frame."""
    diags = T_dia.diags
    nd, R, lanes = diags.shape
    assert lanes == LANES
    qs, _, _, p_lo, p_hi = _plan(T_dia.offsets, R)
    kernel = functools.partial(
        _trs_kernel, qs=qs, pad=(p_lo, p_hi), R=R, sweeps=int(sweeps),
    )
    Rw = R + p_lo + p_hi
    x2 = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # diags
            pl.BlockSpec(memory_space=pltpu.VMEM),  # invd
            pl.BlockSpec(memory_space=pl.ANY),      # b -> DMA
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R, LANES), b2.dtype),
        scratch_shapes=[
            pltpu.VMEM((R, LANES), jnp.float32),   # b
            pltpu.VMEM((R, LANES), jnp.float32),   # iterate
            pltpu.VMEM((Rw, LANES), jnp.float32),  # staged source
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (nd + 2) * R * LANES * int(sweeps),
            bytes_accessed=(nd + 2) * R * LANES * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(diags, invd2, b2)
    return x2

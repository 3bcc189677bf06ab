"""Whole-solve fused IR / Richardson (damped Jacobi) Pallas kernels.

Reference analog: core/solver/ir.cpp runs `solver->apply(residual, inner)`
plus two dense kernels per sweep, each a full HBM pass; the multigrid
smoother (core/solver/multigrid.cpp build_smoother) pays the same per
level per cycle.  TPU-native end point (same arc as ops/pallas_cg.py):
for DIA operators that fit VMEM, the entire sweep loop runs inside ONE
Pallas kernel — x, r, b and the inverse diagonal stay VMEM-resident, so
per-sweep HBM traffic is zero.

Two kernels share the chunked SpMV of ops/pallas_cg._spmv_chunk:

- `_smooth_kernel` (via `ir_vmem_smooth`): fixed sweep count, statically
  specialized on `x0_zero` (pre-smoothers start from 0 — skips the
  initial residual SpMV entirely) and `with_residual` (returns
  r = b - A x_final for free, which lets the multigrid V-cycle drop its
  separate per-level residual SpMV).
- `_ir_kernel` (via `ir_vmem_solve`): criteria-driven `lax.while_loop`
  with the exact ||r||^2 tracked every sweep, matching the generic Ir
  loop's stop semantics (first sweep unconditional, check on the post-
  update residual).

Iteration structure per sweep: x += omega * minv * r  then  r = b - A x
(the generic loop recomputes r from b rather than updating it — kept for
bit-level parity and self-correcting rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..log.logger import logged_kernel
from jax.experimental.pallas import tpu as pltpu

from .pallas_dia import _plan
from .pallas_cg import _chunk_rows, _spmv_chunk, cg_vmem_budget_bytes

LANES = 128


def ir_vmem_fits(nd: int, R: int, diag_itemsize: int = 4,
                 use_minv: bool = True, halo_rows: int = 0) -> bool:
    """Working set: diags window + b + x0 + halo-padded x scratch + r out
    + x out (+ minv)."""
    frame = R * LANES * 4
    vec_frames = 5.25 + halo_rows / max(R, 1) + (1 if use_minv else 0)
    return nd * R * LANES * diag_itemsize + vec_frames * frame <= (
        cg_vmem_budget_bytes()
    )


def _zero_halos(x_s, pad_lo, pad_hi, Rp):
    if pad_lo:
        x_s[0:pad_lo] = jnp.zeros((pad_lo, LANES), jnp.float32)
    if pad_hi:
        x_s[Rp - pad_hi:Rp] = jnp.zeros((pad_hi, LANES), jnp.float32)


def _make_passes(diags, b, minv, x_s, r_out, omega, *, qs, pad_lo, C,
                 n_chunks, use_minv):
    """Chunked pass bodies shared by both kernels.

    pass_resid: r = b - A x (writes r_out, accumulates ||r||^2)
    pass_update: x += omega * minv * r
    """

    def pass_resid(c, rr):
        c0 = c * C
        q_c = _spmv_chunk(diags, x_s, c0, C, qs=qs, pad_lo=pad_lo)
        r_c = b[pl.ds(c0, C), :].astype(jnp.float32) - q_c
        r_out[pl.ds(c0, C), :] = r_c.astype(r_out.dtype)
        return rr + jnp.sum(r_c * r_c)

    def pass_update(c, _):
        c0 = c * C
        r_c = r_out[pl.ds(c0, C), :].astype(jnp.float32)
        d_c = minv[pl.ds(c0, C), :].astype(jnp.float32) * r_c if use_minv \
            else r_c
        x_s[pl.ds(pad_lo + c0, C), :] = (
            x_s[pl.ds(pad_lo + c0, C), :] + omega * d_c
        )
        return 0

    return pass_resid, pass_update


def _smooth_kernel(scal, diags, b, x0, minv, x_out, r_out, x_s, *, qs,
                   pad_lo, pad_hi, R, iters, use_minv, x0_zero,
                   with_residual):
    """Fixed-count sweeps.  scal: SMEM (1,) [omega]."""
    omega = scal[0]
    Rp = R + pad_lo + pad_hi
    C = _chunk_rows(R)
    n_chunks = R // C
    _zero_halos(x_s, pad_lo, pad_hi, Rp)

    def init_chunk(c, _):
        c0 = c * C
        x_s[pl.ds(pad_lo + c0, C), :] = (
            jnp.zeros((C, LANES), jnp.float32) if x0_zero
            else x0[pl.ds(c0, C), :].astype(jnp.float32)
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, init_chunk, 0)

    pass_resid, pass_update = _make_passes(
        diags, b, minv, x_s, r_out, omega,
        qs=qs, pad_lo=pad_lo, C=C, n_chunks=n_chunks, use_minv=use_minv,
    )

    if x0_zero:
        # r0 = b: skip the initial SpMV on an all-zero x
        def copy_b(c, _):
            c0 = c * C
            r_out[pl.ds(c0, C), :] = b[pl.ds(c0, C), :].astype(r_out.dtype)
            return 0

        jax.lax.fori_loop(0, n_chunks, copy_b, 0)
    else:
        jax.lax.fori_loop(0, n_chunks, pass_resid, jnp.float32(0))

    def sweep(i, _):
        jax.lax.fori_loop(0, n_chunks, pass_update, 0)
        jax.lax.fori_loop(0, n_chunks, pass_resid, jnp.float32(0))
        return 0

    if with_residual:
        # every sweep ends with a fresh residual; r_out leaves correct
        jax.lax.fori_loop(0, iters, sweep, 0)
    else:
        jax.lax.fori_loop(0, max(iters - 1, 0), sweep, 0)
        if iters > 0:
            jax.lax.fori_loop(0, n_chunks, pass_update, 0)

    def write_x(c, _):
        c0 = c * C
        x_out[pl.ds(c0, C), :] = (
            x_s[pl.ds(pad_lo + c0, C), :].astype(x_out.dtype)
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, write_x, 0)


def _ir_kernel(scal, iscal, diags, b, x0, minv, x_out, r_out, stats, x_s,
               *, qs, pad_lo, pad_hi, R, use_minv):
    """Criteria-driven sweeps.  scal: SMEM (2,) [omega, tol_sq_eff];
    iscal: SMEM int32 (1,) [max_iters]; stats out: SMEM (3,)
    [iterations, ||r||^2, converged].  Stop semantics mirror the generic
    Ir loop: the first sweep always runs (stop monitor starts at +inf),
    the check is on the post-update residual."""
    omega = scal[0]
    tol_sq = scal[1]
    max_iters = iscal[0]
    Rp = R + pad_lo + pad_hi
    C = _chunk_rows(R)
    n_chunks = R // C
    _zero_halos(x_s, pad_lo, pad_hi, Rp)

    def init_chunk(c, _):
        c0 = c * C
        x_s[pl.ds(pad_lo + c0, C), :] = x0[pl.ds(c0, C), :].astype(
            jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, init_chunk, 0)

    pass_resid, pass_update = _make_passes(
        diags, b, minv, x_s, r_out, omega,
        qs=qs, pad_lo=pad_lo, C=C, n_chunks=n_chunks, use_minv=use_minv,
    )

    rr0 = jax.lax.fori_loop(0, n_chunks, pass_resid, jnp.float32(0))

    def cond(st):
        it, rr, stop_mon = st
        return (it < max_iters) & ~(stop_mon <= tol_sq)  # NaN: keep going (streaming parity)

    def body(st):
        it, rr, _ = st
        jax.lax.fori_loop(0, n_chunks, pass_update, 0)
        rr_new = jax.lax.fori_loop(0, n_chunks, pass_resid, jnp.float32(0))
        return (it + 1, rr_new, rr_new)

    it, rr, stop_mon = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), rr0, jnp.float32(jnp.inf))
    )

    def write_x(c, _):
        c0 = c * C
        x_out[pl.ds(c0, C), :] = (
            x_s[pl.ds(pad_lo + c0, C), :].astype(x_out.dtype)
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, write_x, 0)
    stats[0] = it.astype(jnp.float32)
    stats[1] = rr
    stats[2] = (rr <= tol_sq).astype(jnp.float32)


def _placeholder():
    return jnp.zeros((8, LANES), jnp.float32)


def _common_call(kernel, diags, b2, x02, minv2, R, pad_lo, pad_hi,
                 n_smem_scalars, interpret, with_stats):
    """Shared pallas_call assembly for the two kernels."""
    Rp = R + pad_lo + pad_hi
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_smem_scalars + [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # diags
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x0 (or placeholder)
        pl.BlockSpec(memory_space=pltpu.VMEM),  # minv (or placeholder)
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x
        pl.BlockSpec(memory_space=pltpu.VMEM),  # r
    ]
    out_shape = [
        jax.ShapeDtypeStruct((R, LANES), b2.dtype),
        jax.ShapeDtypeStruct((R, LANES), b2.dtype),
    ]
    if with_stats:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((3,), jnp.float32))
    return pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((Rp, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )


@logged_kernel
def ir_vmem_smooth(diags, offsets, b2, x02, minv2, *, omega, iters,
                   with_residual=False, interpret=False):
    """Fixed-count damped Jacobi/Richardson sweeps in one kernel.

    diags: (nd, R, 128) f32/bf16; b2: (R, 128) f32; x02: (R, 128) f32 or
    None (zero initial guess — skips the initial residual SpMV); minv2:
    optional (R, 128) inverse diagonal.  Returns (x2, r2) where r2 is
    b - A x2 when with_residual, else undefined content.
    """
    nd, R, lanes = diags.shape
    assert lanes == LANES
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    x0_zero = x02 is None
    kernel = functools.partial(
        _smooth_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R,
        iters=int(iters), use_minv=use_minv, x0_zero=x0_zero,
        with_residual=with_residual,
    )
    scal = jnp.asarray(omega, jnp.float32).reshape((1,))
    call = _common_call(kernel, diags, b2, x02, minv2, R, pad_lo, pad_hi,
                        n_smem_scalars=1, interpret=interpret,
                        with_stats=False)
    x2, r2 = call(
        scal, diags, b2,
        _placeholder() if x0_zero else x02,
        minv2 if use_minv else _placeholder(),
    )
    return x2, r2


@logged_kernel
def ir_vmem_solve(diags, offsets, b2, x02, minv2, *, omega, tol_sq_eff,
                  max_iters, interpret=False):
    """Run IR/Richardson to convergence in one Pallas kernel.

    tol_sq_eff: squared ABSOLUTE stop threshold on ||r||^2 (negative to
    run to max_iters).  Returns (x2, iterations, ||r||^2, converged).
    """
    nd, R, lanes = diags.shape
    assert lanes == LANES
    qs, qmin, halo, pad_lo, pad_hi = _plan(offsets, R)
    use_minv = minv2 is not None
    kernel = functools.partial(
        _ir_kernel, qs=qs, pad_lo=pad_lo, pad_hi=pad_hi, R=R,
        use_minv=use_minv,
    )
    scal = jnp.stack([
        jnp.asarray(omega, jnp.float32),
        jnp.asarray(tol_sq_eff, jnp.float32),
    ]).reshape((2,))
    iscal = jnp.asarray(max_iters, jnp.int32).reshape((1,))
    call = _common_call(kernel, diags, b2, x02, minv2, R, pad_lo, pad_hi,
                        n_smem_scalars=2, interpret=interpret,
                        with_stats=True)
    x2, _r2, stats = call(
        scal, iscal, diags, b2, x02,
        minv2 if use_minv else _placeholder(),
    )
    it = stats[0].astype(jnp.int32)
    return x2, it, stats[1], stats[2] > 0

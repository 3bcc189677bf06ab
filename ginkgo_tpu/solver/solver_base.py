"""Common solver machinery.

Reference: include/ginkgo/core/solver/solver_base.hpp:57-148
(EnableSolverBase / EnableIterativeBase / EnablePreconditionedIterativeSolver)
and the per-solver workspace_traits (cg.cpp:215-258).

Design (SURVEY §7): a solver is a pytree LinOp holding the system operator,
the generated preconditioner, and a fused stopping criterion; its whole
iteration runs inside one `lax.while_loop`, with per-column stop masks
replacing the reference's device stopping_status + host check
(cg.cpp:166-171).  Distributed solves reuse the same code: the `axis_name`
static field makes every dot/norm a psum over the mesh axis, and `A.apply`
is the halo-exchanging distributed SpMV — the analog of Ginkgo's
distribution-transparent solvers (precision_dispatch_real_complex_distributed,
cg.cpp:97).
"""

from __future__ import annotations

import functools
import time as _time
from typing import Any

import jax
import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field, as_2d, restore_1d
from ..stop.criterion import (
    Criterion,
    Combined,
    Iteration,
    Time,
    combine,
    default_criteria,
)
from ..matrix.diagonal import Identity

HARD_ITER_CAP = 10_000


# -- reductions (distribution-aware) -----------------------------------------


def vdot(a, b, axis_name=None):
    """Column-wise conjugated dot (k,); psum over mesh axis if distributed."""
    s = jnp.sum(jnp.conj(a) * b, axis=0)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def norm2(a, axis_name=None):
    s = jnp.sum(jnp.abs(a) ** 2, axis=0)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return jnp.sqrt(s.real)


def safe_div(num, den):
    """num/den with 0 where den == 0 (stopped columns carry zeroed scalars,
    mirroring the reference's stopping-status-masked step kernels)."""
    den_ok = den != 0
    return jnp.where(den_ok, num / jnp.where(den_ok, den, 1), 0)


def masked_cols(new, old, stopped):
    """Freeze columns that have stopped: (n,k) update masked by (k,) bools."""
    return jnp.where(stopped[None, :], old, new)


# -- solve result --------------------------------------------------------------


@linop_dataclass
class SolveInfo:
    iterations: jnp.ndarray  # scalar int32: iterations performed
    residual_norm: jnp.ndarray  # (k,) final tracked residual norm
    converged: jnp.ndarray  # (k,) bool
    history: Any = None  # (cap, k) per-iteration residual norms or None

    @property
    def num_iterations(self):
        return int(self.iterations)


def extract_max_iters(criterion: Criterion, default: int = HARD_ITER_CAP) -> int:
    found = []

    def walk(c):
        if isinstance(c, Iteration):
            found.append(c.max_iters)
        elif isinstance(c, Combined):
            for ch in c.criteria:
                walk(ch)

    walk(criterion)
    return min(found) if found else default


def extract_time_limit(criterion: Criterion):
    found = []

    def walk(c):
        if isinstance(c, Time):
            found.append(c.time_limit_sec)
        elif isinstance(c, Combined):
            for ch in c.criteria:
                walk(ch)

    walk(criterion)
    return min(found) if found else None


# -- factory (GKO_ENABLE_LIN_OP_FACTORY analog, lin_op.hpp:1038) ----------------


class SolverFactory:
    """Fluent factory: Cg.build(criteria=[...], preconditioner=JacobiFactory())
    .generate(A) -> solver LinOp.  Parameters mirror the reference's
    GKO_FACTORY_PARAMETER_SCALAR/VECTOR declarations."""

    def __init__(self, solver_cls, criteria=None, preconditioner=None, **params):
        self.solver_cls = solver_cls
        self.criteria = criteria
        self.preconditioner = preconditioner
        self.params = params

    def with_criteria(self, *criteria):
        self.criteria = list(criteria)
        return self

    def with_preconditioner(self, factory):
        self.preconditioner = factory
        return self

    def on(self, exec=None):  # executor placement is a no-op under XLA
        return self

    def generate(self, A):
        from ..log.logger import Event, global_log

        global_log(
            Event.linop_factory_generate_started,
            factory=self.solver_cls.__name__,
        )
        crit = combine(self.criteria) if self.criteria is not None else (
            default_criteria()
        )
        if self.preconditioner is None:
            M = Identity.create(A.shape[0], A.dtype)
        elif hasattr(self.preconditioner, "generate"):
            global_log(
                Event.linop_factory_generate_started,
                factory=type(self.preconditioner).__name__,
            )
            M = self.preconditioner.generate(A)
            global_log(
                Event.linop_factory_generate_completed,
                factory=type(self.preconditioner).__name__,
            )
        else:
            M = self.preconditioner  # already a LinOp
        solver = self.solver_cls.create(
            A=A, preconditioner=M, criterion=crit, **self.params
        )
        global_log(
            Event.linop_factory_generate_completed,
            factory=self.solver_cls.__name__,
            solver=solver,
        )
        return solver


def _env_trace_key():
    """Environment flags that select code paths at TRACE time (Pallas
    on/off, fused-solver opt-ins, backend).  They MUST be part of the jit
    cache key: otherwise flipping e.g. GINKGO_TPU_NO_PALLAS after a
    structurally identical solver was traced silently reuses the cached
    OTHER path (observed: A/B comparisons measuring one path twice)."""
    import os

    return (
        os.environ.get("GINKGO_TPU_NO_PALLAS", ""),
        os.environ.get("GINKGO_TPU_NO_FUSED_CG", ""),
        os.environ.get("GINKGO_TPU_FORCE_VMEM_CG", ""),
        os.environ.get("GINKGO_TPU_FORCE_STREAMING", ""),
        os.environ.get("GINKGO_TPU_CG_CHUNK", ""),
        os.environ.get("GINKGO_TPU_VMEM_MB", ""),
        jax.default_backend(),
    )


@functools.partial(jax.jit, static_argnums=(3,))
def _jitted_solve(solver, barr, xarr, env_key):
    return solver._solve_impl(barr, xarr)


@functools.partial(jax.jit, static_argnums=(4,))
def _jitted_solve_state(solver, barr, xarr, state, env_key):
    return solver._solve_with_state(barr, xarr, state)


def _jittable(solver) -> bool:
    """True when every pytree leaf of the solver is an array/scalar, so the
    whole solve can be traced with the solver as a jit argument."""
    import numpy as _np

    for leaf in jax.tree_util.tree_leaves(solver):
        if leaf is None or isinstance(
            leaf, (jax.Array, _np.ndarray, float, int, complex, bool, _np.generic)
        ):
            continue
        return False
    return True


class IterativeSolverMixin:
    """Shared apply/solve plumbing for Krylov solvers."""

    @classmethod
    def build(cls, criteria=None, preconditioner=None, **params) -> SolverFactory:
        return SolverFactory(
            cls, criteria=criteria, preconditioner=preconditioner, **params
        )

    @property
    def shape(self):
        return self.A.shape

    @property
    def dtype(self):
        return self.A.dtype

    def apply(self, b):
        x, _ = self.solve(b)
        return x

    def apply_with_initial_guess(self, b, x0):
        x, _ = self.solve(b, x0)
        return x

    def solve(self, b, x0=None, loggers=()):
        """Returns (x, SolveInfo).

        Runs under jit: the solver is a pytree, so the whole solve — setup,
        the fused while_loop, and the criterion — compiles to ONE XLA
        computation.  Eager execution would dispatch every setup op
        separately (ruinous through a remote-device tunnel); inside an
        enclosing jit trace this wrapper is a no-op cache hit.

        Logging (logger.hpp:336-481): linop_apply events bracket the solve;
        iteration_complete is REPLAYED post-hoc from SolveInfo (per
        recorded history row when the solver tracks history, else once with
        the final state) — in-graph while_loop iterations cannot signal the
        host, so this is the TPU answer to the reference's per-iteration
        hook.  Events go to `loggers` plus the global registry."""
        from ..base.exceptions import assert_conformant
        from ..log.logger import Event, fanout, global_loggers

        barr, was_1d = as_2d(b)
        assert_conformant(self.A, barr)  # lin_op.hpp:158 validation analog
        # precision_dispatch (core/base/precision_dispatch.hpp analog): the
        # solve runs in the OPERATOR's precision; x comes back in the
        # caller's.  Real->complex mixes stay in the caller's dtype (a real
        # operator applies to complex vectors transparently under jnp).
        caller_dtype = barr.dtype
        op_dtype = jnp.dtype(self.A.dtype)
        # reduced-storage operators (bf16/f16 via reduce_storage) are a
        # STORAGE format with f32 accumulation (base/accessor.py), not a
        # solve precision: never downcast the solve below f32 (doing so
        # silently declined the fused gate's f32-RHS check and ran the
        # whole solve as a bf16 streaming loop — 10x, found by BENCH r3)
        storage_reduced = op_dtype in (
            jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16),
        ) and jnp.dtype(caller_dtype).itemsize >= 4
        convert = (
            not storage_reduced
            and caller_dtype != op_dtype
            and (
                jnp.issubdtype(caller_dtype, jnp.complexfloating)
                == jnp.issubdtype(op_dtype, jnp.complexfloating)
            )
        )
        if convert:
            barr = barr.astype(op_dtype)
        if x0 is None:
            xarr = jnp.zeros_like(barr)
        else:
            xarr, _ = as_2d(x0)
            if convert:
                xarr = xarr.astype(op_dtype)
        emit = bool(loggers) or bool(global_loggers())
        if emit:
            fanout(loggers, Event.linop_apply_started, solver=self)
        if _jittable(self):
            x, info = _jitted_solve(self, barr, xarr, _env_trace_key())
        else:
            # a field (e.g. a user's plain-object preconditioner) is not a
            # pytree of arrays: run unjitted — still one XLA computation
            # for the while_loop, just eager setup ops
            x, info = self._solve_impl(barr, xarr)
        if emit:
            self._replay_iterations(loggers, info)
            fanout(loggers, Event.linop_apply_completed, solver=self)
        if convert:
            x = x.astype(caller_dtype)
        return restore_1d(x, was_1d), info

    def _replay_iterations(self, loggers, info):
        from ..log.logger import Event, fanout

        import numpy as _np

        if isinstance(info.iterations, jax.core.Tracer):
            # solve() running under an enclosing user jit: the replay
            # needs concrete values; events stream only on eager solves
            # (or via solve_chunked)
            return
        if info.history is not None:
            hist = _np.asarray(info.history)
            n_it = int(info.iterations)
            for i in range(min(n_it, hist.shape[0])):
                fanout(
                    loggers, Event.iteration_complete, solver=self,
                    iteration=i + 1, residual_norm=hist[i],
                )
        fanout(
            loggers, Event.iteration_complete, solver=self,
            iteration=int(info.iterations),
            residual_norm=info.residual_norm,
            converged=bool(jnp.all(info.converged)),
        )

    def solve_chunked(self, b, x0=None, chunk: int = 50, loggers=()):
        """Host-orchestrated driver honoring Time criteria and streaming
        iteration_complete events to loggers between fixed-size in-graph
        chunks (the TPU answer to the reference's per-iteration host check).

        Krylov state restarts at chunk boundaries (the documented trade);
        residual baselines do NOT: `initial_resnorm`-based criteria are
        frozen against the ORIGINAL initial residual before chunking, so
        each chunk is not re-baselined to its own start."""
        from ..log.logger import Event, fanout
        from ..stop.criterion import freeze_initial_baseline

        limit = extract_time_limit(self.criterion)
        max_iters = extract_max_iters(self.criterion)
        barr, was_1d = as_2d(b)
        x = jnp.zeros_like(barr) if x0 is None else as_2d(x0)[0]
        frozen_crit = freeze_initial_baseline(
            self.criterion, norm2(barr - self.A.apply(x), self.axis_name)
        )
        if frozen_crit is not self.criterion:
            self = self.replace(criterion=frozen_crit)
        start = _time.perf_counter()
        done_iters = 0
        info = None
        chunk_solver = None
        resumable = hasattr(self, "_solve_with_state")
        state = None
        while done_iters < max_iters:
            n_now = min(chunk, max_iters - done_iters)
            if chunk_solver is None or n_now != chunk:
                chunk_solver = self._with_max_iters(n_now)
            if resumable:
                # carry the Krylov recurrence across the chunk boundary
                if _jittable(chunk_solver):
                    x, info, state = _jitted_solve_state(
                        chunk_solver, barr, x, state, _env_trace_key()
                    )
                else:
                    x, info, state = chunk_solver._solve_with_state(
                        barr, x, state
                    )
            elif _jittable(chunk_solver):
                x, info = _jitted_solve(chunk_solver, barr, x, _env_trace_key())
            else:
                x, info = chunk_solver._solve_impl(barr, x)
            done_iters += int(info.iterations)
            fanout(
                loggers,
                Event.iteration_complete,
                solver=self,
                iteration=done_iters,
                residual_norm=info.residual_norm,
                converged=bool(jnp.all(info.converged)),
            )
            # chunk-boundary host check = the reference's criterion check
            # (criterion events, logger.hpp:436-460)
            fanout(
                loggers, Event.criterion_check_started, solver=self,
                iteration=done_iters,
            )
            conv_now = bool(jnp.all(info.converged))
            fanout(
                loggers, Event.criterion_check_completed, solver=self,
                iteration=done_iters, converged=conv_now,
            )
            if conv_now:
                break
            if limit is not None and _time.perf_counter() - start > limit:
                break
        info = SolveInfo(
            iterations=jnp.asarray(done_iters, jnp.int32),
            residual_norm=info.residual_norm,
            converged=info.converged,
            history=None,
        )
        return restore_1d(x, was_1d), info

    def _with_max_iters(self, n):
        return self.replace(criterion=self.criterion)._replace_iteration_cap(n)

    def _replace_iteration_cap(self, n):
        def swap(c):
            if isinstance(c, Iteration):
                return Iteration(max_iters=n)
            if isinstance(c, Combined):
                return Combined(criteria=tuple(swap(ch) for ch in c.criteria))
            return c

        newc = swap(self.criterion)
        if extract_max_iters(newc, default=-1) == -1:
            newc = Combined(criteria=(Iteration(max_iters=n), newc))
        return self.replace(criterion=newc)

    # -- criterion evaluation inside the loop --------------------------------

    def _check_stop(self, iteration, stopped, r=None, rho=None, baselines=None):
        k = baselines["num_cols"]
        # fallback fills must carry the solver's real dtype so while_loop
        # carries stay type-stable (e.g. bf16 inner solvers under x64)
        real_dt = baselines["rhs_norm"].dtype
        ctx = dict(baselines)
        ctx["iteration"] = iteration
        if r is not None and self.criterion.needs_residual_norm:
            ctx["residual_norm"] = norm2(r, self.axis_name)
        else:
            ctx["residual_norm"] = jnp.full((k,), jnp.inf, dtype=real_dt)
        ctx["implicit_sq_residual_norm"] = (
            jnp.abs(rho) if rho is not None
            else jnp.full((k,), jnp.inf, dtype=real_dt)
        )
        return stopped | self.criterion.check_converged(ctx), ctx["residual_norm"]

    def _baselines(self, b, r0):
        return {
            "num_cols": b.shape[1],
            "rhs_norm": norm2(b, self.axis_name),
            "initial_resnorm": norm2(r0, self.axis_name),
        }

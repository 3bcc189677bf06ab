"""Stopping criteria, fused in-graph.

Reference: include/ginkgo/core/stop/ — `Criterion`/`Updater`
(criterion.hpp:64-152), per-RHS-column `stopping_status` bytes
(stopping_status.hpp:62-145), `Iteration` (iteration.hpp:52), `Time`
(time.hpp:52), `ResidualNorm` with baseline modes (residual_norm.hpp:65-193),
`ImplicitResidualNorm` (:193), `Combined` (combined.hpp:55).

The reference checks on host every iteration (a device→host sync per
iteration, cg.cpp:166-171).  Here a criterion is a pytree whose `check(ctx)`
returns a per-column boolean stop mask *inside* the solver's
`lax.while_loop` — no host sync ever.  `ctx` is a dict the solver fills with
whatever it tracks:

  iteration                    scalar int
  residual_norm                (k,) true residual 2-norm, if tracked
  implicit_sq_residual_norm    (k,) recurrent rho, if tracked
  rhs_norm, initial_resnorm    (k,) baselines captured at solve start

`Time` cannot be evaluated in-graph (XLA has no clock); it participates via
the chunked driver (solver_base.solve_chunked) which checks wall time on host
between fixed-size in-graph chunks — the documented TPU trade.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base.linop import linop_dataclass, static_field


# stopping_status bit encoding (stopping_status.hpp:62-145): we track the
# converged/stopped distinction as the mask; criterion ids are static python.


class Criterion:
    needs_residual_norm = False
    needs_implicit_norm = False
    #: does a True mask mean *converged* (vs merely stopped)?  Mirrors the
    #: converged/stopped bit split of stopping_status.hpp:62-145.
    is_convergence = True

    def check(self, ctx) -> jnp.ndarray:
        """Return (k,) bool mask of columns that should stop now."""
        from ..base.exceptions import NotImplementedError_

        raise NotImplementedError_(type(self).__name__)

    def check_converged(self, ctx) -> jnp.ndarray:
        """Mask of columns stopped *by convergence* (Iteration/Time excluded).
        Column updates are frozen by this mask; loop exit additionally uses
        the iteration cap, which hits all columns at once."""
        if self.is_convergence:
            return self.check(ctx)
        k = ctx["num_cols"]
        return jnp.zeros((k,), dtype=bool)

    # factory-style sugar mirroring X::build().with_...().on(exec)
    def generate(self, A=None, b=None, x=None, r=None):
        return self


@linop_dataclass
class Iteration(Criterion):
    """Stop after max_iters (iteration.hpp:52)."""

    max_iters: int = static_field(default=100)
    is_convergence = False

    def check(self, ctx):
        k = ctx["num_cols"]
        return jnp.broadcast_to(ctx["iteration"] >= self.max_iters, (k,))


@linop_dataclass
class ResidualNorm(Criterion):
    """||r|| < tolerance * baseline (residual_norm.hpp:65,137).

    baseline: 'rhs_norm' (default, like reference), 'initial_resnorm',
    'absolute'."""

    tolerance: float = 1e-8
    baseline: str = static_field(default="rhs_norm")

    needs_residual_norm = True

    def check(self, ctx):
        rn = ctx["residual_norm"]
        if self.baseline == "absolute":
            base = 1.0
        elif self.baseline == "initial_resnorm":
            base = ctx["initial_resnorm"]
        else:
            base = ctx["rhs_norm"]
        return rn <= self.tolerance * base


@linop_dataclass
class ImplicitResidualNorm(Criterion):
    """sqrt(implicit rho) < tolerance * baseline (residual_norm.hpp:193)."""

    tolerance: float = 1e-8
    baseline: str = static_field(default="rhs_norm")

    needs_implicit_norm = True

    def check(self, ctx):
        rn = jnp.sqrt(jnp.abs(ctx["implicit_sq_residual_norm"]))
        if self.baseline == "absolute":
            base = 1.0
        elif self.baseline == "initial_resnorm":
            base = ctx["initial_resnorm"]
        else:
            base = ctx["rhs_norm"]
        return rn <= self.tolerance * base


@linop_dataclass
class Combined(Criterion):
    """OR-combination (combined.hpp:55)."""

    criteria: tuple = ()

    @property
    def needs_residual_norm(self):
        return any(c.needs_residual_norm for c in self.criteria)

    @property
    def needs_implicit_norm(self):
        return any(c.needs_implicit_norm for c in self.criteria)

    def check(self, ctx):
        mask = None
        for c in self.criteria:
            m = c.check(ctx)
            mask = m if mask is None else (mask | m)
        return mask

    def check_converged(self, ctx):
        mask = jnp.zeros((ctx["num_cols"],), dtype=bool)
        for c in self.criteria:
            mask = mask | c.check_converged(ctx)
        return mask


@linop_dataclass
class Time(Criterion):
    """Wall-clock limit (time.hpp:52).  Host-checked between solve chunks —
    see solver_base.solve_chunked; inert inside the fused loop."""

    time_limit_sec: float = static_field(default=float("inf"))
    is_convergence = False

    def check(self, ctx):
        k = ctx["num_cols"]
        return jnp.zeros((k,), dtype=bool)


@linop_dataclass
class FrozenBaselineResidualNorm(Criterion):
    """ResidualNorm against a pre-captured per-column baseline — used by
    chunked drivers so `initial_resnorm` refers to the ORIGINAL initial
    residual, not each chunk's restart residual."""

    tolerance: float = 1e-8
    baseline_vals: jnp.ndarray = None  # (k,)

    needs_residual_norm = True

    def check(self, ctx):
        return ctx["residual_norm"] <= self.tolerance * self.baseline_vals


def freeze_initial_baseline(criterion, initial_resnorm):
    """Replace any ResidualNorm/ImplicitResidualNorm with
    baseline='initial_resnorm' by a frozen-baseline equivalent."""

    def walk(c):
        if isinstance(c, (ResidualNorm, ImplicitResidualNorm)) and (
            c.baseline == "initial_resnorm"
        ):
            return FrozenBaselineResidualNorm(
                tolerance=c.tolerance, baseline_vals=initial_resnorm
            )
        if isinstance(c, Combined):
            return Combined(criteria=tuple(walk(ch) for ch in c.criteria))
        return c

    new = walk(criterion)
    # preserve identity when nothing changed (cheap no-op detection)
    return new if _tree_differs(new, criterion) else criterion


def _tree_differs(a, b) -> bool:
    if a is b:
        return False
    if isinstance(a, Combined) and isinstance(b, Combined):
        return any(_tree_differs(x, y) for x, y in zip(a.criteria, b.criteria))
    return type(a) is not type(b)


def analyze_simple_residual(criterion):
    """Decompose a criterion tree into (tolerance, baseline, implicit,
    has_residual_criterion) when it is a plain Iteration/Time/residual-norm
    combination — the shape fused whole-solve kernels (ops/pallas_cg.py) can
    evaluate in-kernel.  Returns None for custom criteria or when more than
    one residual criterion is present (those need the generic loop)."""
    found = []
    ok = [True]

    def walk(c):
        if isinstance(c, Combined):
            for ch in c.criteria:
                walk(ch)
        elif isinstance(c, (Iteration, Time)):
            pass  # Iteration via max_iters; Time is inert in-graph anyway
        elif isinstance(c, ResidualNorm) and not isinstance(
            c, FrozenBaselineResidualNorm
        ):
            found.append((c.tolerance, c.baseline, False))
        elif isinstance(c, ImplicitResidualNorm):
            found.append((c.tolerance, c.baseline, True))
        else:
            ok[0] = False

    walk(criterion)
    if not ok[0] or len(found) > 1:
        return None
    if not found:
        return (0.0, "absolute", False, False)
    tol, baseline, implicit = found[0]
    return (tol, baseline, implicit, True)


def combine(criteria) -> Criterion:
    """Normalize a criterion / list of criteria to a single Criterion."""
    if criteria is None:
        return Combined(criteria=(Iteration(max_iters=1000), ResidualNorm()))
    if isinstance(criteria, Criterion):
        return criteria
    crits = tuple(criteria)
    if len(crits) == 1:
        return crits[0]
    return Combined(criteria=crits)


def default_criteria(max_iters=1000, tolerance=1e-8):
    return Combined(
        criteria=(Iteration(max_iters=max_iters), ResidualNorm(tolerance=tolerance))
    )

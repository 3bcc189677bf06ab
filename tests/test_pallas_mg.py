"""Fused whole-V-cycle kernel (ops/pallas_mg.py) vs the generic cycle.

Oracle tier: interpret-mode kernel (GINKGO_TPU_FORCE_VMEM_CG=1) against
the all-XLA cycle (GINKGO_TPU_NO_PALLAS=1).  The fused path replaces the
Direct-LU coarse solve with the generate-time dense inverse, so parity
is to f32 roundoff, not bitwise."""

import numpy as np
import jax.numpy as jnp
import pytest

from ginkgo_tpu import Cg, stop
from ginkgo_tpu.matrix.dia import Dia
from ginkgo_tpu.solver.multigrid import Multigrid
from ginkgo_tpu.utils import generators


def _mk(n_side, max_levels=6, min_coarse=32, iters=1, relax=0.9):
    data = generators.poisson_2d(n_side, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    mg = Multigrid.build(
        criteria=[stop.Iteration(max_iters=30),
                  stop.ResidualNorm(tolerance=1e-6)],
        max_levels=max_levels,
        min_coarse_rows=min_coarse,
        smoother_iters=iters,
        smoother_relax=relax,
    ).generate(A)
    b = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (data.shape[0], 1)
        ).astype(np.float32)
    )
    return A, mg, b


def _gate_ok(mg, b):
    # caller has already set GINKGO_TPU_FORCE_VMEM_CG
    return mg._try_fused_vcycle(b, None) is not None


@pytest.mark.parametrize("n_side,iters", [(32, 1), (32, 2), (48, 1)])
def test_vcycle_apply_parity(monkeypatch, n_side, iters):
    # n_side=48: width 48 strides (48, 24, ...) are not 2S|128 — the gate
    # must decline and fall back, still producing the generic result
    A, mg, b = _mk(n_side, iters=iters)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    if n_side == 48:
        assert mg._try_fused_vcycle(b, None) is None
    else:
        assert mg._try_fused_vcycle(b, None) is not None
    xf = mg.apply(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg = mg.apply(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=3e-5, atol=3e-5
    )


def test_vcycle_x0_parity(monkeypatch):
    A, mg, b = _mk(32)
    x0 = jnp.asarray(
        np.random.default_rng(7).standard_normal(b.shape).astype(np.float32)
    )
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf = mg.cycle_apply(b, x0)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg = mg.cycle_apply(b, x0)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=3e-5, atol=3e-5
    )


def test_vcycle_solve_parity(monkeypatch):
    A, mg, b = _mk(32)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = mg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = mg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=1e-4, atol=1e-4
    )


def test_mg_preconditioned_cg(monkeypatch):
    A, mg, b = _mk(32)
    crit = [stop.Iteration(max_iters=60), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    assert _gate_ok(mg, b)
    sf = Cg.build(criteria=crit, preconditioner=mg).generate(A)
    # the whole MG-CG solve must ride the single fused kernel
    assert sf._try_vmem_fused_mg(b, jnp.zeros_like(b)) is not None
    xf, inf_f = sf.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    sg = Cg.build(criteria=crit, preconditioner=mg).generate(A)
    xg, inf_g = sg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=2e-4, atol=2e-4
    )


def test_vcycle_multichunk(monkeypatch):
    # force tiny chunks so the in-kernel fori paths cover >1 chunk
    monkeypatch.setenv("GINKGO_TPU_CG_CHUNK", "4")
    A, mg, b = _mk(32)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    assert mg._try_fused_vcycle(b, None) is not None
    xf = mg.apply(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg = mg.apply(b)
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=3e-5, atol=3e-5
    )


def test_mg_preconditioned_bicgstab(monkeypatch):
    from ginkgo_tpu import Bicgstab

    A, mg, b = _mk(32)
    crit = [stop.Iteration(max_iters=60), stop.ResidualNorm(tolerance=1e-6)]
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    sf = Bicgstab.build(criteria=crit, preconditioner=mg).generate(A)
    assert sf._try_vmem_fused_mg(b, jnp.zeros_like(b)) is not None
    xf, inf_f = sf.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    sg = Bicgstab.build(criteria=crit, preconditioner=mg).generate(A)
    xg, inf_g = sg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=5e-4, atol=5e-4
    )


def test_mg_fused_solve_info(monkeypatch):
    # whole-solve fused multigrid reports the same iterations/residual
    # as the generic cycle-per-iteration driver
    A, mg, b = _mk(32)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    assert mg._try_fused_solve(b, jnp.zeros_like(b)) is not None
    xf, inf_f = mg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = mg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert abs(int(inf_f.iterations) - int(inf_g.iterations)) <= 1
    np.testing.assert_allclose(
        float(inf_f.residual_norm[0]), float(inf_g.residual_norm[0]),
        rtol=1e-2,
    )


@pytest.mark.parametrize("n_side,levels", [(256, 6), (512, 8)])
def test_vcycle_rows_transfer_parity(monkeypatch, n_side, levels):
    # the y-pairing stride is n_side/2 (pairing happens on the renumbered
    # post-x-coarsening indices), so n_side=256 gives S=128 (rows branch,
    # Sr=1) and n_side=512 gives S=256 (Sr=2)
    A, mg, b = _mk(n_side, max_levels=levels, min_coarse=64)
    strides = {lvl.restrict_op.stride for lvl in mg.levels}
    assert any(s >= 128 for s in strides)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    assert mg._try_fused_vcycle(b, None) is not None
    xf = mg.apply(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg = mg.apply(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=3e-5, atol=3e-5
    )


@pytest.mark.parametrize(
    "cycle,mid_case",
    [
        ("w", "standalone"),
        ("f", "standalone"),
        ("w", "both"),
        ("f", "pre_smoother"),
        ("w", "post_smoother"),
    ],
)
def test_wf_cycle_apply_parity(monkeypatch, cycle, mid_case):
    data = generators.poisson_2d(32, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    mg = Multigrid.build(
        criteria=[stop.Iteration(max_iters=10)],
        max_levels=4,
        min_coarse_rows=32,
        cycle=cycle,
        mid_case=mid_case,
    ).generate(A)
    b = jnp.asarray(
        np.random.default_rng(5).standard_normal(
            (data.shape[0], 1)
        ).astype(np.float32)
    )
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    assert mg._try_fused_vcycle(b, None) is not None
    xf = mg.apply(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg = mg.apply(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=3e-5, atol=3e-5
    )


@pytest.mark.parametrize("rel_tol", [0.25, float("nan"), -1.0])
def test_kcycle_fused_solve_parity(monkeypatch, rel_tol):
    """Fused K-cycle (kcycle_correction on VMEM refs, pl.when-gated
    second inner solve) vs the generic K-cycle: identical iteration
    counts under every second-iteration policy."""
    data = generators.poisson_2d(32, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    mg = Multigrid.build(
        criteria=[stop.Iteration(max_iters=40),
                  stop.ResidualNorm(tolerance=1e-4)],
        max_levels=4,
        min_coarse_rows=16,
        cycle="k",
        kcycle_rel_tol=rel_tol,
    ).generate(A)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    assert mg._try_fused_vcycle(b, None) is not None
    xf, inf_f = mg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = mg.solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0]) and bool(inf_g.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=3e-4, atol=3e-4
    )


def test_kcycle_fused_beats_v(monkeypatch):
    """The fused K-cycle's acceleration survives the kernel: fewer
    solve iterations than the fused V-cycle on the same hierarchy."""
    data = generators.poisson_2d(32, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    its = {}
    for cyc in ("v", "k"):
        mg = Multigrid.build(
            criteria=[stop.Iteration(max_iters=60),
                      stop.ResidualNorm(tolerance=1e-4)],
            max_levels=4,
            min_coarse_rows=16,
            cycle=cyc,
        ).generate(A)
        x, info = mg.solve(b)
        assert bool(info.converged[0]), cyc
        its[cyc] = int(info.iterations)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    assert its["k"] < its["v"], its


def test_kcycle_fused_mg_cg(monkeypatch):
    """K-cycle as the preconditioner inside the fused MG-CG kernel."""
    data = generators.poisson_2d(32, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-5)]
    mgf = Multigrid.build(
        criteria=[stop.Iteration(max_iters=1)], cycle="k",
        max_levels=4, min_coarse_rows=16,
    )
    monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
    xf, inf_f = Cg.build(criteria=crit, preconditioner=mgf).generate(
        A
    ).solve(b)
    monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
    monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
    xg, inf_g = Cg.build(criteria=crit, preconditioner=mgf).generate(
        A
    ).solve(b)
    monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
    assert int(inf_f.iterations) == int(inf_g.iterations)
    assert bool(inf_f.converged[0])
    np.testing.assert_allclose(
        np.asarray(xf), np.asarray(xg), rtol=3e-4, atol=3e-4
    )


def test_kcycle_fused_mg_fcg(monkeypatch):
    """FCG with a K-cycle multigrid preconditioner — Notay's canonical
    pairing — runs whole-solve fused (flexible beta in the MG-CG
    kernel, r_old stashed in the dead q frame) and matches the generic
    Fcg loop iteration-for-iteration."""
    from ginkgo_tpu.solver.cg import Fcg

    data = generators.poisson_2d(32, dtype=np.float32)
    A = Dia.from_matrix_data(data)
    b = jnp.ones((A.shape[0], 1), jnp.float32)
    crit = [stop.Iteration(max_iters=100), stop.ResidualNorm(tolerance=1e-5)]
    for cyc in ("v", "k"):
        mgf = Multigrid.build(
            criteria=[stop.Iteration(max_iters=1)], cycle=cyc,
            max_levels=4, min_coarse_rows=16,
        )
        monkeypatch.setenv("GINKGO_TPU_FORCE_VMEM_CG", "1")
        xf, inf_f = Fcg.build(criteria=crit, preconditioner=mgf).generate(
            A
        ).solve(b)
        monkeypatch.delenv("GINKGO_TPU_FORCE_VMEM_CG")
        monkeypatch.setenv("GINKGO_TPU_NO_PALLAS", "1")
        xg, inf_g = Fcg.build(criteria=crit, preconditioner=mgf).generate(
            A
        ).solve(b)
        monkeypatch.delenv("GINKGO_TPU_NO_PALLAS")
        assert int(inf_f.iterations) == int(inf_g.iterations), cyc
        assert bool(inf_f.converged[0]), cyc
        np.testing.assert_allclose(
            np.asarray(xf), np.asarray(xg), rtol=3e-4, atol=3e-4
        )

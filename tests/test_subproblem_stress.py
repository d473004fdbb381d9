"""Stress tests for the m>=3 semismooth-Newton dual solver past the zoo.

VERDICT r4 weak #3: ``newton_cap=30`` and the 2-strike stall heuristic
(zfista_tpu/core/subproblem.py:280,424-434) are load-bearing terminators
that had only been validated at m<=4 on benign random instances.  These
tests hunt premature exits at m in {5, 6, 8} on adversarial duals at the
benchmark's tol_internal=1e-11 (reference: benchmarks/benchmark.py:311):

* rank-deficient Grams (J of rank 1/2 -> singular dual Hessian, the KKT
  solve goes through the inf/nan fallback),
* optima on simplex vertices and edges (active-set identification),
* shifted-L1 kinks exactly at the optimum (the prox's piecewise-linear
  Jacobian is evaluated AT a kink).

Two independent certificates per instance:
1. the dual value matches-or-beats scipy trust-constr's (the reference's
   own m>=3 engine, zfista/proximal_gradient.py:192-205), same contract as
   tests/test_solver_multi.py::test_dual_solver_parity_vs_scipy;
2. a primal-dual gap check: for the dual-derived primal point, weak duality
   gives primal >= dual always, so a ~0 gap certifies optimality without
   trusting scipy at all (on degenerate duals trust-constr itself drifts).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zfista_tpu.core.subproblem import make_subproblem_solver
from zfista_tpu.ops import soft_threshold

TOL_INTERNAL = 1e-11  # the reference benchmark's subproblem tolerance
N = 10


def _instance(kind: str, m: int, seed: int):
    """Build (y, jac_f_y, f_y, F_old, lr, l1, shift) for one dual instance."""
    rng = np.random.RandomState(seed)
    l1 = 0.05 * (1 + np.arange(m))
    shift = np.zeros(N)
    y = rng.randn(N)
    f_y = rng.rand(m)
    F_old = f_y + rng.rand(m)
    lr = 0.5
    if kind == "random":
        J = rng.randn(m, N)
    elif kind == "rank1":
        J = np.outer(rng.randn(m), rng.randn(N))
    elif kind == "rank2":
        J = rng.randn(m, 2) @ rng.randn(2, N)
    elif kind == "vertex":
        # One objective's F_old - f_y term is strongly minimal -> the dual
        # optimum sits on a simplex vertex (all mass on that coordinate).
        J = 0.1 * rng.randn(m, N)
        F_old = f_y + 5.0 + rng.rand(m)
        F_old[m // 2] = f_y[m // 2] - 5.0
    elif kind == "edge":
        # Two tied minimal coordinates -> optimum on a 1-face (edge).
        J = 0.1 * rng.randn(m, N)
        F_old = f_y + 5.0 + rng.rand(m)
        F_old[0] = f_y[0] - 5.0
        F_old[1] = f_y[1] - 5.0
    elif kind == "kink":
        # y == shift: the prox input sits at the shifted-L1 kink, so many
        # primal coordinates land EXACTLY on the nondifferentiable point.
        shift = rng.randn(N)
        y = shift.copy()
        J = rng.randn(m, N)
    else:  # pragma: no cover
        raise ValueError(kind)
    return y, J, f_y, F_old, lr, l1, shift


def _scipy_oracle(y, J, f_y, F_old, lr, l1, shift, m):
    """trust-constr on the same Fenchel dual (test-only oracle; mirrors the
    reference formulation, zfista/proximal_gradient.py:161-205)."""
    from scipy.optimize import BFGS, Bounds, LinearConstraint, minimize

    def prox_np(wl1, x):
        t = np.sum(wl1 * l1)
        return shift + np.sign(x - shift) * np.maximum(np.abs(x - shift) - t, 0)

    def g_np(x):
        return l1 * np.sum(np.abs(x - shift))

    def fun_jac(w):
        wsum_jac = w @ J
        u = y - lr * wsum_jac
        x_w = prox_np(lr * w, u)
        g_xw = g_np(x_w)
        fun = (
            -np.inner(w, g_xw)
            - np.linalg.norm(x_w - u) ** 2 / (2 * lr)
            + lr / 2 * np.linalg.norm(wsum_jac) ** 2
            + np.inner(w, F_old - f_y)
        )
        jac = -g_xw - J @ (x_w - y) + (F_old - f_y)
        return fun, jac

    res = minimize(
        fun=fun_jac,
        x0=np.ones(m) / m,
        method="trust-constr",
        jac=True,
        hess=BFGS(),
        bounds=Bounds(lb=0, ub=np.inf),
        constraints=LinearConstraint(np.ones(m), lb=1, ub=1),
        options={
            "gtol": 1e-12,
            "xtol": 1e-12,
            "barrier_tol": 1e-12,
            "maxiter": 10000,
        },
    )
    return -res.fun  # primal subproblem value by strong duality


def _primal_value(x, y, J, f_y, F_old, lr, l1, shift):
    """The primal min-max objective at ``x`` — by weak duality this is an
    upper bound on the true subproblem value for EVERY x, so
    ``primal(x_ours) - dual(w_ours) ~ 0`` certifies optimality of both."""
    g_x = l1 * np.sum(np.abs(x - shift))
    terms = J @ (x - y) + g_x + f_y - F_old
    return np.max(terms) + np.linalg.norm(x - y) ** 2 / (2 * lr)


KINDS = ["random", "rank1", "rank2", "vertex", "edge", "kink"]


def _solve_and_certify(m: int, kind: str, seed: int, ctx: str) -> None:
    """Build one instance, solve it, and assert BOTH certificates
    (shared by the m in {5,6,8} sweep and the m=12 smoke — one copy of
    the closure construction and the tolerance contract)."""
    y, J, f_y, F_old, lr, l1, shift = _instance(kind, m, seed)
    l1_j = jnp.asarray(l1)
    shift_j = jnp.asarray(shift)

    def g_j(x):
        return l1_j * jnp.sum(jnp.abs(x - shift_j))

    def prox_j(wl1, x):
        t = jnp.sum(wl1 * l1_j)
        return shift_j + soft_threshold(x - shift_j, t)

    solve = make_subproblem_solver(
        g_j, prox_j, m, tol=TOL_INTERNAL, max_iter=10000, deprecated=False
    )
    res = solve(
        jnp.asarray(lr),
        jnp.asarray(F_old),
        jnp.asarray(y),
        jnp.asarray(f_y),
        jnp.asarray(J),
        jnp.ones(m) / m,
    )
    ours = float(res.fun)
    w = np.asarray(res.weight)

    # Dual feasibility.
    assert np.all(w >= -1e-12), ctx
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-9, err_msg=ctx)

    # Certificate 1: never worse than the reference's own engine.
    ref = _scipy_oracle(y, J, f_y, F_old, lr, l1, shift, m)
    assert ours >= ref - 1e-9, f"{ctx}: {ours} < scipy {ref}"

    # Certificate 2: ~zero primal-dual gap at our (x, w) — a premature
    # stall/newton_cap exit leaves a macroscopic gap here even when
    # scipy happens to be worse.
    primal = _primal_value(np.asarray(res.x), y, J, f_y, F_old, lr, l1, shift)
    scale = 1.0 + abs(ours)
    gap = primal - ours
    assert -1e-9 * scale <= gap <= 1e-7 * scale, f"{ctx}: gap={gap}"



@pytest.mark.parametrize("m", [5, 6, 8])
@pytest.mark.parametrize("kind", KINDS)
def test_dual_stress_vs_oracle_and_gap(m, kind):
    for trial in range(3):
        _solve_and_certify(m, kind, 1000 * m + trial, f"m={m} kind={kind} trial={trial}")


@pytest.mark.parametrize("kind", ["random", "rank2", "edge"])
def test_dual_stress_vmap_parity(kind):
    """The batch API runs this same solver under vmap — the vmapped solve
    of the stress instances must agree with the per-instance solves
    (lowering differences only, ~1e-12 at f64)."""
    import jax

    m = 6
    insts = [_instance(kind, m, 2000 + t) for t in range(3)]
    # Shared shift/l1 across lanes (same closure), per-lane everything else.
    l1 = insts[0][5]
    shift = insts[0][6]
    l1_j = jnp.asarray(l1)
    shift_j = jnp.asarray(shift)

    def g_j(x):
        return l1_j * jnp.sum(jnp.abs(x - shift_j))

    def prox_j(wl1, x):
        t = jnp.sum(wl1 * l1_j)
        return shift_j + soft_threshold(x - shift_j, t)

    solve = make_subproblem_solver(
        g_j, prox_j, m, tol=TOL_INTERNAL, max_iter=10000, deprecated=False
    )
    singles = [
        solve(
            jnp.asarray(lr),
            jnp.asarray(F_old),
            jnp.asarray(y),
            jnp.asarray(f_y),
            jnp.asarray(J),
            jnp.ones(m) / m,
        )
        for (y, J, f_y, F_old, lr, _, _) in insts
    ]
    ys = jnp.stack([jnp.asarray(i[0]) for i in insts])
    Js = jnp.stack([jnp.asarray(i[1]) for i in insts])
    fys = jnp.stack([jnp.asarray(i[2]) for i in insts])
    Folds = jnp.stack([jnp.asarray(i[3]) for i in insts])
    lrs = jnp.stack([jnp.asarray(i[4]) for i in insts])
    w0s = jnp.tile(jnp.ones(m) / m, (3, 1))
    batched = jax.vmap(solve)(lrs, Folds, ys, fys, Js, w0s)
    for lane, single in enumerate(singles):
        np.testing.assert_allclose(
            np.asarray(batched.fun)[lane], float(single.fun),
            rtol=1e-12, atol=1e-12, err_msg=f"lane {lane} fun",
        )
        np.testing.assert_allclose(
            np.asarray(batched.x)[lane], np.asarray(single.x),
            atol=1e-10, err_msg=f"lane {lane} x",
        )


@pytest.mark.parametrize("kind", ["random", "rank2", "edge"])
def test_dual_stress_m12_smoke(kind):
    """One instance per kind at m=12: the unrolled Gauss-Jordan KKT solve
    (13x13 here) and the active-set machinery must keep their
    certificates at larger objective counts than the zoo ever uses
    (single trial per kind — compile cost grows with m)."""
    _solve_and_certify(12, kind, 12000, f"m=12 kind={kind}")

"""Multiobjective solver tests.

Oracle classes (mirroring the reference's test strategy, SURVEY.md §4):
1. Duplicated-objective trick — the multiobjective dual path (m=2 bisection
   and m=3 simplex-FISTA) on identical objectives must reproduce the known
   scalar LASSO answers (reference: tests/test_proximal_gradient.py:116-219).
2. Direct dual-solver parity vs scipy trust-constr on random instances.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from zfista_tpu import minimize_proximal_gradient
from zfista_tpu.core.subproblem import make_subproblem_solver
from zfista_tpu.ops import soft_threshold

A = jnp.array([[-1.0], [0.0], [1.0]])
b = jnp.array([-1.0, 0.0, 1.0])
TOY_SOLUTIONS = {1e-8: 1.0, 0.1: 0.85, 0.5: 0.25, 1.0: 0.0}


def make_duplicated_toy(l1_ratio, m):
    def f(x):
        r = A @ x - b
        val = jnp.dot(r, r) / 6
        return jnp.full((m,), val)

    def g(x):
        val = l1_ratio * jnp.sum(jnp.abs(x))
        return jnp.full((m,), val)

    def jac_f(x):
        grad = A.T @ (A @ x - b) / 3
        return jnp.tile(grad, (m, 1))

    def prox_wsum_g(weight, x):
        return soft_threshold(x, l1_ratio * jnp.sum(weight))

    return f, g, jac_f, prox_wsum_g


@pytest.mark.parametrize("m", [2, 3])
@pytest.mark.parametrize("l1_ratio,x_star", [(0.1, 0.85), (1.0, 0.0)])
@pytest.mark.parametrize("nesterov", [False, True])
def test_duplicated_objective_oracle(m, l1_ratio, x_star, nesterov):
    f, g, jac_f, prox = make_duplicated_toy(l1_ratio, m)
    x0 = jnp.array([0.3])
    res = minimize_proximal_gradient(f, g, jac_f, prox, x0, nesterov=nesterov)
    assert res.success
    assert_array_almost_equal(res.x, [x_star], decimal=3)
    assert res.weight.shape == (m,)
    np.testing.assert_allclose(res.weight.sum(), 1.0, atol=1e-6)


@pytest.mark.parametrize("m", [2, 3])
def test_duplicated_objective_remaining_ratios(m):
    # cover the remaining l1 ratios from the reference test without
    # re-tracing both momentum variants
    for l1_ratio, x_star in [(1e-8, 1.0), (0.5, 0.25)]:
        f, g, jac_f, prox = make_duplicated_toy(l1_ratio, m)
        x0 = jnp.array([0.3])
        res = minimize_proximal_gradient(f, g, jac_f, prox, x0, nesterov=True)
        assert res.success
        assert_array_almost_equal(res.x, [x_star], decimal=3)


def _scipy_dual_reference(jac_f_y, f_y, F_old, g_np, prox_np, lr, y, m):
    """Ground-truth dual solve with scipy trust-constr (test-only oracle;
    mirrors the reference's formulation at zfista/proximal_gradient.py:161-205)."""
    from scipy.optimize import BFGS, Bounds, LinearConstraint, minimize

    def fun_jac(w):
        wsum_jac = w @ jac_f_y
        u = y - lr * wsum_jac
        x_w = prox_np(lr * w, u)
        g_xw = g_np(x_w)
        fun = (
            -np.inner(w, g_xw)
            - np.linalg.norm(x_w - u) ** 2 / (2 * lr)
            + lr / 2 * np.linalg.norm(wsum_jac) ** 2
            + np.inner(w, F_old - f_y)
        )
        jac = -g_xw - jac_f_y @ (x_w - y) + (F_old - f_y)
        return fun, jac

    res = minimize(
        fun=fun_jac,
        x0=np.ones(m) / m,
        method="trust-constr",
        jac=True,
        hess=BFGS(),
        bounds=Bounds(lb=0, ub=np.inf),
        constraints=LinearConstraint(np.ones(m), lb=1, ub=1),
        options={"gtol": 1e-12, "xtol": 1e-12, "barrier_tol": 1e-12, "maxiter": 10000},
    )
    return res.x, res.fun


@pytest.mark.parametrize("m", [2, 3, 4])
def test_dual_solver_parity_vs_scipy(m):
    """Our jittable dual solvers must match scipy trust-constr on random
    weighted-L1 subproblem instances to high accuracy."""
    rng = np.random.RandomState(42)
    n = 8
    l1 = 0.05 * (1 + np.arange(m))

    for trial in range(3):
        y = rng.randn(n)
        jac_f_y = rng.randn(m, n)
        f_y = rng.rand(m)
        F_old = f_y + rng.rand(m)  # F(x_old) >= f(y) typical
        lr = 0.5

        def g_np(x):
            return l1 * np.sum(np.abs(x))

        def prox_np(wl1, x):
            # prox of sum_i wl1_i * l1_i ||x||_1 = soft threshold at the sum
            t = np.sum(wl1 * l1)
            return np.sign(x) * np.maximum(np.abs(x) - t, 0)

        w_ref, dualfun_ref = _scipy_dual_reference(
            jac_f_y, f_y, F_old, g_np, prox_np, lr, y, m
        )

        def g_j(x):
            return jnp.asarray(l1) * jnp.sum(jnp.abs(x))

        def prox_j(wl1, x):
            t = jnp.sum(wl1 * jnp.asarray(l1))
            return soft_threshold(x, t)

        solve = make_subproblem_solver(
            g_j, prox_j, m, tol=1e-12, max_iter=10000, deprecated=False
        )
        res = solve(
            jnp.asarray(lr),
            jnp.asarray(F_old),
            jnp.asarray(y),
            jnp.asarray(f_y),
            jnp.asarray(jac_f_y),
            jnp.ones(m) / m,
        )
        # Our dual point must be at least as good as scipy's (trust-constr
        # itself carries interior-point error ~1e-6 in w), and close overall.
        ours = float(res.fun)
        ref = -dualfun_ref
        assert ours >= ref - 1e-9, f"m={m} trial={trial}: worse than scipy"
        np.testing.assert_allclose(
            ours, ref, rtol=1e-4, atol=1e-6, err_msg=f"m={m} trial={trial}"
        )
        # Primal solutions should also match (to scipy's own accuracy).
        x_ref = prox_np(lr * w_ref, y - lr * (w_ref @ jac_f_y))
        np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-4)


def test_warm_start_runs():
    f, g, jac_f, prox = make_duplicated_toy(0.1, 3)
    x0 = jnp.array([0.3])
    res = minimize_proximal_gradient(
        f, g, jac_f, prox, x0, nesterov=True, warm_start=True
    )
    assert res.success
    assert_array_almost_equal(res.x, [0.85], decimal=3)


def test_deprecated_condition():
    f, g, jac_f, prox = make_duplicated_toy(0.1, 2)
    x0 = jnp.array([0.3])
    with pytest.warns(UserWarning):
        res = minimize_proximal_gradient(
            f, g, jac_f, prox, x0, nesterov=True, deprecated=True
        )
    assert res.success
    assert_array_almost_equal(res.x, [0.85], decimal=3)


def test_solve_small_linear_matches_numpy():
    from zfista_tpu.core.subproblem import solve_small_linear

    rng = np.random.default_rng(0)
    for n in (2, 4, 6):
        for _ in range(5):
            K = rng.standard_normal((n, n)) + n * np.eye(n)
            b = rng.standard_normal(n)
            x = solve_small_linear(jnp.asarray(K), jnp.asarray(b))
            np.testing.assert_allclose(
                np.asarray(x), np.linalg.solve(K, b), rtol=1e-5, atol=1e-8
            )
    # pivoting: zero on the diagonal must still solve
    K = np.array([[0.0, 1.0], [1.0, 0.0]])
    b = np.array([2.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(solve_small_linear(jnp.asarray(K), jnp.asarray(b))),
        np.array([3.0, 2.0]),
        atol=1e-12,
    )
    # singular systems propagate non-finite values (the Newton fallback
    # test relies on this, like jnp.linalg.solve)
    K = np.ones((3, 3))
    b = np.array([1.0, 2.0, 3.0])
    x = np.asarray(solve_small_linear(jnp.asarray(K), jnp.asarray(b)))
    assert not np.all(np.isfinite(x))


def test_solve_small_linear_vmaps():
    import jax
    from zfista_tpu.core.subproblem import solve_small_linear

    rng = np.random.default_rng(1)
    Ks = rng.standard_normal((16, 4, 4)) + 4 * np.eye(4)
    bs = rng.standard_normal((16, 4))
    xs = jax.vmap(solve_small_linear)(jnp.asarray(Ks), jnp.asarray(bs))
    np.testing.assert_allclose(
        np.asarray(xs),
        np.linalg.solve(Ks, bs[..., None])[..., 0],
        rtol=1e-5,
        atol=1e-8,
    )


@pytest.mark.parametrize("m_case", ["m2", "m3"])
def test_multiobjective_check_every_bitwise(m_case):
    """check_every>1 on multiobjective solves routes through the masked
    fori driver (chunk-select is scalar-only); results must stay bitwise
    identical to check_every=1 for the bisection (m=2) and semismooth-
    Newton (m=3) subproblem paths too."""
    from zfista_tpu.models.zoo import FDS, JOS1

    prob = JOS1(n_features=6) if m_case == "m2" else FDS(n_features=6)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1.5, 1.5, size=6))
    opts = dict(nesterov=True, tol=1e-7, max_iter=500)
    base = minimize_proximal_gradient(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0, **opts
    )
    fast = minimize_proximal_gradient(
        prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, x0, check_every=5, **opts
    )
    assert base.success and fast.success
    assert base.nit == fast.nit
    for name, fa, ba in zip(base.state._fields, fast.state, base.state):
        np.testing.assert_array_equal(
            np.asarray(fa), np.asarray(ba), err_msg=f"state field {name}"
        )

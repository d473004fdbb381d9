"""Closed-form LASSO oracles for the scalar (m=1) solver path.

Same oracle class as the reference's functional tests
(tests/test_proximal_gradient.py:43-114): a 1-D LASSO toy whose solutions are
known analytically for several l1 ratios, asserted for both ISTA and FISTA.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_array_almost_equal

from zfista_tpu import minimize_proximal_gradient
from zfista_tpu.ops import soft_threshold


def make_lasso_toy(l1_ratio):
    A = jnp.array([[-1.0], [0.0], [1.0]])
    b = jnp.array([-1.0, 0.0, 1.0])

    def f(x):
        r = A @ x - b
        return jnp.dot(r, r) / 6

    def g(x):
        return l1_ratio * jnp.sum(jnp.abs(x))

    def jac_f(x):
        return A.T @ (A @ x - b) / 3

    def prox_wsum_g(weight, x):
        return soft_threshold(x, l1_ratio * weight)

    return f, g, jac_f, prox_wsum_g


TOY_SOLUTIONS = {1e-8: 1.0, 0.1: 0.85, 0.5: 0.25, 1.0: 0.0}


@pytest.mark.parametrize("l1_ratio,x_star", sorted(TOY_SOLUTIONS.items()))
@pytest.mark.parametrize("nesterov", [False, True])
def test_lasso_toy(l1_ratio, x_star, nesterov):
    f, g, jac_f, prox = make_lasso_toy(l1_ratio)
    x0 = jnp.array([0.3])
    res = minimize_proximal_gradient(f, g, jac_f, prox, x0, nesterov=nesterov)
    assert res.success
    assert_array_almost_equal(res.x, [x_star], decimal=3)


@pytest.mark.parametrize("nesterov", [False, True])
def test_lasso_zero_design(nesterov):
    """Zero design matrix: x* = 0 (reference tests lines 43-68)."""
    l1_ratio = 0.1

    def f(x):
        return jnp.zeros(())

    def g(x):
        return l1_ratio * jnp.sum(jnp.abs(x))

    def jac_f(x):
        return jnp.zeros_like(x)

    def prox(weight, x):
        return soft_threshold(x, l1_ratio * weight)

    x0 = jnp.array([0.77])
    res = minimize_proximal_gradient(f, g, jac_f, prox, x0, nesterov=nesterov)
    assert res.success
    assert_array_almost_equal(res.x, [0.0], decimal=3)


def test_autodiff_jacobian():
    """jac_f=None derives the gradient by autodiff (deliberate fix #4)."""
    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    res = minimize_proximal_gradient(f, g, None, prox, x0, nesterov=True)
    assert res.success
    assert_array_almost_equal(res.x, [0.85], decimal=3)


def test_return_all():
    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    res = minimize_proximal_gradient(f, g, jac_f, prox, x0, return_all=True)
    assert "allvecs" in res and "allfuns" in res and "allerrs" in res
    assert len(res.allvecs) == res.nit + 1
    assert len(res.allfuns) == res.nit + 1
    assert len(res.allerrs) == res.nit
    assert_array_almost_equal(res.allvecs[0], np.asarray(x0))
    assert_array_almost_equal(res.allvecs[-1], res.x)
    # error criterion decreases below tol at the end
    assert res.allerrs[-1] < res.tol


def test_result_fields():
    f, g, jac_f, prox = make_lasso_toy(0.5)
    x0 = jnp.array([0.9])
    res = minimize_proximal_gradient(f, g, jac_f, prox, x0)
    for field in (
        "x",
        "fun",
        "success",
        "status",
        "message",
        "nit",
        "nit_internal",
        "time",
        "weight",
    ):
        assert field in res, field
    assert res.nit_internal >= res.nit  # at least one inner iter per outer
    assert np.ndim(res.fun) == 0  # scalar objective stays scalar


def test_fixed_lr_decay_rate_one():
    """decay_rate=1 disables the accept test (single prox step per iter)."""
    f, g, jac_f, prox = make_lasso_toy(0.1)
    # L = 2/3 for this problem; lr = 1/L = 1.5 is a valid fixed step.
    x0 = jnp.array([0.3])
    res = minimize_proximal_gradient(
        f, g, jac_f, prox, x0, lr=1.5, decay_rate=1, nesterov=True
    )
    assert res.success
    assert_array_almost_equal(res.x, [0.85], decimal=3)


def test_max_iter_exhaustion():
    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    with pytest.warns(UserWarning):
        res = minimize_proximal_gradient(f, g, jac_f, prox, x0, max_iter=2)
    assert not res.success
    assert res.status == 0
    assert res.nit == 2


@pytest.mark.parametrize("check_every", [4, 8, 32])
def test_chunk_select_bitwise_identical(check_every):
    """Scalar fixed-step solves route check_every>1 through the chunk-select
    driver (unconditional steps + first-stop fold, core/solver.py
    make_while_driver). The result — including nit, which depends on picking
    the FIRST converged intermediate of a chunk — must be bitwise identical
    to check_every=1."""
    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    opts = dict(lr=1.5, decay_rate=1, nesterov=True)
    base = minimize_proximal_gradient(f, g, jac_f, prox, x0, **opts)
    fast = minimize_proximal_gradient(
        f, g, jac_f, prox, x0, check_every=check_every, **opts
    )
    assert fast.nit == base.nit  # convergence mid-chunk, not at a boundary
    np.testing.assert_array_equal(fast.x, base.x)
    np.testing.assert_array_equal(fast.fun, base.fun)
    assert fast.success and base.success
    # The full resumable carry must match, including the y/t convergence
    # freeze that the chunk-select fold patches in post-hoc.
    for name, fa, ba in zip(base.state._fields, fast.state, base.state):
        np.testing.assert_array_equal(fa, ba, err_msg=f"state field {name}")


def test_chunk_select_with_adaptive_restart_bitwise():
    """adaptive_restart stays eligible for chunk-select (fixed-step scalar);
    the restart reads x/y/t mid-chain, so this guards the unguarded-step
    fold against any divergence there."""
    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    opts = dict(lr=0.3, decay_rate=1, nesterov=True, adaptive_restart=True)
    base = minimize_proximal_gradient(f, g, jac_f, prox, x0, **opts)
    fast = minimize_proximal_gradient(
        f, g, jac_f, prox, x0, check_every=8, **opts
    )
    assert fast.nit == base.nit
    for name, fa, ba in zip(base.state._fields, fast.state, base.state):
        np.testing.assert_array_equal(fa, ba, err_msg=f"state field {name}")


def test_chunk_select_max_iter_not_divisible():
    """max_iter that is not a multiple of check_every must still stop at
    exactly max_iter (the first intermediate with nit == max_iter wins the
    chunk fold)."""
    f, g, jac_f, prox = make_lasso_toy(1e-8)
    x0 = jnp.array([0.3])
    # tol=0 forces max_iter exhaustion regardless of convergence speed.
    opts = dict(lr=1.5, decay_rate=1, nesterov=True, max_iter=10, tol=0.0)
    with pytest.warns(UserWarning):
        base = minimize_proximal_gradient(f, g, jac_f, prox, x0, **opts)
    with pytest.warns(UserWarning):
        fast = minimize_proximal_gradient(
            f, g, jac_f, prox, x0, check_every=8, **opts
        )
    assert base.nit == fast.nit == 10
    np.testing.assert_array_equal(fast.x, base.x)


def test_chunk_select_resume_path():
    """check_every>1 + initial_state (the build_while driver) also uses
    chunk-select; the resumed run must match an uninterrupted solve."""
    # lr below 1/L so convergence takes enough iterations to interrupt.
    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    opts = dict(lr=0.2, decay_rate=1, nesterov=True)
    with pytest.warns(UserWarning):
        part = minimize_proximal_gradient(
            f, g, jac_f, prox, x0, max_iter=3, **opts
        )
    assert not part.success  # interrupted mid-solve, same tol as base
    resumed = minimize_proximal_gradient(
        f, g, jac_f, prox, x0, initial_state=part.state, check_every=8, **opts
    )
    base = minimize_proximal_gradient(f, g, jac_f, prox, x0, **opts)
    assert resumed.nit == base.nit
    np.testing.assert_array_equal(resumed.x, base.x)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_chunk_select_randomized_property(seed):
    """Property check: for random quadratic+L1 problems, random lr, random
    momentum pairs and a check_every that is NOT a divisor of anything
    special (7), the chunk-select driver is bitwise identical to the
    step-by-step driver, whatever iteration the solve stops at."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 6))
    A = rng.standard_normal((8, n))
    b = rng.standard_normal(8)
    lam = float(rng.uniform(0.01, 0.5))
    f = lambda x: jnp.sum((A @ x - b) ** 2)
    jac = lambda x: 2 * (A.T @ (A @ x - b))
    g = lambda x: lam * jnp.sum(jnp.abs(x))
    prox = lambda t, x: jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam * t, 0)
    L = 2 * np.linalg.norm(A, 2) ** 2
    lr = float(rng.uniform(0.3, 1.0)) / L
    a_m = float(rng.choice([0, 0.5, 0.75]))
    b_m = float(rng.uniform(0.05, 0.25))
    x0 = jnp.asarray(rng.standard_normal(n))
    opts = dict(
        lr=lr,
        decay_rate=1,
        nesterov=True,
        nesterov_ratio=(a_m, b_m),
        max_iter=200,
        tol=1e-6,
    )
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        base = minimize_proximal_gradient(f, g, jac, prox, x0, **opts)
        fast = minimize_proximal_gradient(
            f, g, jac, prox, x0, check_every=7, **opts
        )
    assert fast.nit == base.nit
    for name, fa, ba in zip(base.state._fields, fast.state, base.state):
        np.testing.assert_array_equal(fa, ba, err_msg=f"state field {name}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_masked_driver_randomized_property(seed):
    """The masked fori driver (backtracking solves route check_every>1 here,
    not chunk-select) must also match check_every=1 bitwise on random
    problems — guards the unroll<=8 masked construction against the
    cross-step fusion drift the chunk-select barrier fixes."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 6))
    A = rng.standard_normal((8, n))
    b = rng.standard_normal(8)
    lam = float(rng.uniform(0.01, 0.5))
    f = lambda x: jnp.sum((A @ x - b) ** 2)
    jac = lambda x: 2 * (A.T @ (A @ x - b))
    g = lambda x: lam * jnp.sum(jnp.abs(x))
    prox = lambda t, x: jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam * t, 0)
    x0 = jnp.asarray(rng.standard_normal(n))
    opts = dict(lr=1.0, nesterov=True, max_iter=200, tol=1e-6)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        base = minimize_proximal_gradient(f, g, jac, prox, x0, **opts)
        fast = minimize_proximal_gradient(
            f, g, jac, prox, x0, check_every=7, **opts
        )
    assert fast.nit == base.nit
    for name, fa, ba in zip(base.state._fields, fast.state, base.state):
        np.testing.assert_array_equal(fa, ba, err_msg=f"state field {name}")

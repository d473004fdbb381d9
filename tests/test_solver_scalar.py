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


def _f32_freeze_problem():
    """A deterministic f32 line-search freeze: a quadratic riding a 1e6
    offset.  Near the optimum every objective value rounds to the same
    float32 (ulp(1e6) = 0.0625 >> the true decrease), so the absolute
    accept test `F_t - F_old <= model + 1e-12` rejects real progress,
    decays lr until the trial step underflows (x_trial rounds to y), then
    accepts the zero step — and `||x - y|| = 0 < tol` reports a FALSE
    convergence at a point with gradient 0.02.  This is the scalar
    analogue of the on-chip TRIDIA f32 failures (BENCHMARKS.md: 24/256
    starts, status=2 there because the m=3 dual model value keeps the
    reject alive to max_backtrack_iter)."""
    OFF = jnp.float32(1e6)
    f = lambda x: OFF + (x[0] - jnp.float32(1.0)) ** 2
    g = lambda x: jnp.float32(0.0)
    jac = lambda x: jnp.array([2.0], jnp.float32) * (x - jnp.float32(1.0))
    prox = lambda t, x: x
    x0 = np.array([1.01], np.float32)
    return f, g, jac, prox, x0


def test_tol_internal_rel_rescues_f32_line_search_freeze():
    f, g, jac, prox, x0 = _f32_freeze_problem()
    kw = dict(lr=0.25, tol=1e-5, max_iter=200)

    # Default (reference accept test): the lane freezes at x0 — lr is
    # decayed to the underflow floor and the reported "convergence" is the
    # zero step, not progress.
    frozen = minimize_proximal_gradient(f, g, jac, prox, x0, **kw)
    assert abs(frozen.x[0] - 1.01) < 1e-6  # never moved
    assert frozen.lr < 1e-4  # lr driven to the floor

    # tol_internal_rel (a few f32 ulps) accepts steps whose apparent
    # increase is within the objective's own rounding noise: the solver
    # reaches the true optimum at the caller's lr.
    ok = minimize_proximal_gradient(
        f, g, jac, prox, x0, tol_internal_rel=1e-6, **kw
    )
    assert ok.success
    assert abs(ok.x[0] - 1.0) < 1e-3
    assert ok.lr == 0.25  # no spurious decay

    with pytest.raises(ValueError, match="tol_internal_rel"):
        minimize_proximal_gradient(
            f, g, jac, prox, x0, tol_internal_rel=-1.0, **kw
        )


def test_tol_internal_rel_batch_parity():
    """The batch driver threads tol_internal_rel to the same accept test:
    a frozen lane and a rescued lane, same construction as the scalar
    case."""
    from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch

    f, g, jac, prox, x0 = _f32_freeze_problem()
    x0s = np.stack([x0, x0 + np.float32(0.02)])
    kw = dict(lr=0.25, tol=1e-5, max_iter=200)

    frozen = minimize_proximal_gradient_batch(f, g, jac, prox, x0s, **kw)
    np.testing.assert_allclose(np.asarray(frozen.x)[:, 0], x0s[:, 0])

    ok = minimize_proximal_gradient_batch(
        f, g, jac, prox, x0s, tol_internal_rel=1e-6, **kw
    )
    assert bool(np.asarray(ok.success).all())
    np.testing.assert_allclose(np.asarray(ok.x)[:, 0], 1.0, atol=1e-3)

    with pytest.raises(ValueError, match="tol_internal_rel"):
        minimize_proximal_gradient_batch(
            f, g, jac, prox, x0s, tol_internal_rel=-1.0, **kw
        )


def test_tol_internal_rel_deprecated_condition():
    """The deprecated Paper-1 accept condition scales its slack by |f(y)|
    (its lhs is f_t - f_y): same freeze, same rescue."""
    f, g, jac, prox, x0 = _f32_freeze_problem()
    kw = dict(lr=0.25, tol=1e-5, max_iter=200)
    with pytest.warns(UserWarning, match="deprecated"):
        frozen = minimize_proximal_gradient(
            f, g, jac, prox, x0, deprecated=True, **kw
        )
    assert abs(frozen.x[0] - 1.01) < 1e-6
    with pytest.warns(UserWarning, match="deprecated"):
        ok = minimize_proximal_gradient(
            f, g, jac, prox, x0, deprecated=True, tol_internal_rel=1e-6, **kw
        )
    assert ok.success and abs(ok.x[0] - 1.0) < 1e-3


def test_auto_check_every_tpu_bitwise(monkeypatch):
    """check_every=None auto-picks 64 on the TPU backend for scalar
    fixed-step solves (VERDICT r4 #6: out-of-the-box latency) — and the
    result must stay bitwise identical to explicit check_every=1,
    including nit and the full resumable carry."""
    import zfista_tpu.core.solver as sm

    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    opts = dict(lr=1.5, decay_rate=1, nesterov=True)
    base = minimize_proximal_gradient(f, g, jac_f, prox, x0, check_every=1, **opts)
    monkeypatch.setattr(sm, "_default_backend", lambda: "tpu")
    auto = minimize_proximal_gradient(f, g, jac_f, prox, x0, **opts)
    assert auto.nit == base.nit
    assert auto.success and base.success
    for name, fa, ba in zip(base.state._fields, auto.state, base.state):
        np.testing.assert_array_equal(fa, ba, err_msg=f"state field {name}")


def test_auto_check_every_stays_1_off_regime(monkeypatch):
    """The auto-pick must NOT engage outside the guaranteed-bitwise regime:
    backtracking (decay_rate<1), return_all, and verbose all resolve the
    None default to per-iteration checking (observable via the driver cache
    key carrying check_every=1)."""
    import zfista_tpu.core.solver as sm

    monkeypatch.setattr(sm, "_default_backend", lambda: "tpu")
    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    sm._DRIVER_CACHE.clear()
    res = minimize_proximal_gradient(f, g, jac_f, prox, x0, lr=1.5, nesterov=True)
    assert res.success
    keys = [k for k in sm._DRIVER_CACHE if k[0] in ("while_full", "while")]
    assert keys and all(k[1] == 1 for k in keys), keys


def test_iter_chunk_device_fault_partial_result(monkeypatch):
    """A device fault mid-solve in the host-chunked driver returns the
    last completed chunk's state as a partial result (success=False,
    status=2) instead of raising — the reference's error contract
    (reference zfista/proximal_gradient.py:493-509) for faults that kill
    a whole dispatch.  skip_F solves report NaN fun (their carried F was
    never updated and the device cannot be trusted for a recompute)."""
    import jax

    f, g, jac_f, prox = make_lasso_toy(0.1)
    x0 = jnp.array([0.3])
    orig_block = jax.block_until_ready
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] == 2:
            raise jax.errors.JaxRuntimeError("injected device fault")
        return orig_block(x)

    monkeypatch.setattr(jax, "block_until_ready", flaky)
    with pytest.warns(UserWarning, match="device fault after 2 iterations"):
        res = minimize_proximal_gradient(
            f, g, jac_f, prox, x0, lr=0.4, decay_rate=1, nesterov=True,
            iter_chunk=2, max_iter=50,
        )
    assert not res.success
    assert res.status == 2
    assert res.nit == 2
    assert np.isnan(np.asarray(res.fun, float)).all()  # skip_F regime
    # Non-skip_F (backtracking) keeps the real carried objective.
    calls["n"] = 0
    with pytest.warns(UserWarning, match="device fault after 2 iterations"):
        res2 = minimize_proximal_gradient(
            f, g, jac_f, prox, x0, lr=0.4, nesterov=True,
            iter_chunk=2, max_iter=50,
        )
    assert not res2.success and res2.status == 2 and res2.nit == 2
    assert np.isfinite(np.asarray(res2.fun, float)).all()

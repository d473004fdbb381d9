"""params plumbing + compiled-driver cache + objective-tracking skip.

These cover the round-2 public-API performance path: operand data riding
``params`` (program arguments, not baked constants), repeat solves reusing
one compiled driver, and the scalar fixed-step fast path that skips the
per-iteration F evaluation while returning bitwise-identical iterates.
"""

import jax.numpy as jnp
import numpy as np

from zfista_tpu import minimize_proximal_gradient
from zfista_tpu.core import solver as solver_mod
from zfista_tpu.models.lasso import Lasso


def _toy(n=6, m=12, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n)) / np.sqrt(m)
    x_true = np.zeros(n)
    x_true[:2] = [1.0, -0.5]
    b = A @ x_true
    return A, b


def test_params_path_matches_closure_path():
    A, b = _toy()
    prob = Lasso(A, b, l1_ratio=0.01)
    x0 = np.zeros(A.shape[1])
    lr = 1.0 / prob.lipschitz()
    via_params = prob.solve_fixed_step(x0, lr=lr, max_iter=5000)
    via_closure = minimize_proximal_gradient(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0,
        lr=lr,
        decay_rate=1,
        nesterov=True,
        max_iter=5000,
    )
    assert via_params.success and via_closure.success
    assert via_params.nit == via_closure.nit
    np.testing.assert_allclose(via_params.x, via_closure.x, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(via_params.fun), np.asarray(via_closure.fun), atol=1e-12
    )


def test_driver_cache_reused_across_solves():
    # At FIFO capacity an evict+insert keeps len() constant, making the
    # reuse assertions below vacuous — start from a clean cache.
    solver_mod._DRIVER_CACHE.clear()
    A, b = _toy()
    prob = Lasso(A, b, l1_ratio=0.01)
    lr = 1.0 / prob.lipschitz()
    x0 = np.zeros(A.shape[1])
    prob.solve_fixed_step(x0, lr=lr, max_iter=100)
    n_entries = len(solver_mod._DRIVER_CACHE)
    # Different data, same shapes/options -> same compiled driver.
    A2, b2 = _toy(seed=1)
    prob2 = Lasso(A2, b2, l1_ratio=0.01)
    res2 = prob2.solve_fixed_step(x0, lr=lr, max_iter=100)
    assert len(solver_mod._DRIVER_CACHE) == n_entries
    # And the data actually streamed through (not a stale constant).
    direct = minimize_proximal_gradient(
        prob2.f, prob2.g, prob2.jac_f, prob2.prox_wsum_g, x0,
        lr=lr, decay_rate=1, nesterov=True, max_iter=100,
    )
    np.testing.assert_allclose(res2.x, direct.x, atol=1e-12)


def test_skip_F_returns_correct_objective():
    A, b = _toy()
    prob = Lasso(A, b, l1_ratio=0.05)
    x0 = np.zeros(A.shape[1])
    res = prob.solve_fixed_step(x0, max_iter=3000)
    # skip_F recomputes at the end; compare against a fresh evaluation.
    x = jnp.asarray(res.x)
    F = float(np.asarray(prob.f(x) + prob.g(x))[0])
    np.testing.assert_allclose(float(np.asarray(res.fun)[0]), F, rtol=1e-12)


def test_params_multi_lambda_no_retrace():
    """Changing lambda (0-d param leaf) must not change the cache key."""
    solver_mod._DRIVER_CACHE.clear()  # see test_driver_cache_reused_...
    A, b = _toy()
    x0 = np.zeros(A.shape[1])
    prob_a = Lasso(A, b, l1_ratio=0.01)
    lr = 1.0 / prob_a.lipschitz()
    prob_a.solve_fixed_step(x0, lr=lr, max_iter=200)
    n_entries = len(solver_mod._DRIVER_CACHE)
    res_b = Lasso(A, b, l1_ratio=0.3).solve_fixed_step(x0, lr=lr, max_iter=200)
    assert len(solver_mod._DRIVER_CACHE) == n_entries
    # Heavier regularization -> smaller coefficients actually took effect.
    res_a = prob_a.solve_fixed_step(x0, lr=lr, max_iter=200)
    assert np.sum(np.abs(res_b.x)) < np.sum(np.abs(res_a.x))


def test_device_x0_matches_host_x0():
    # Round-2 fast path: a device-resident x0 skips the host round trips
    # (upload + fetch-back of res.x0) but must be numerically identical to
    # the host-array path, and res.x0 must come back as host numpy either
    # way.
    A, b = _toy()
    prob = Lasso(A, b, l1_ratio=0.01)
    lr = 1.0 / prob.lipschitz()
    host = prob.solve_fixed_step(np.zeros(A.shape[1]), lr=lr, max_iter=2000)
    dev = prob.solve_fixed_step(
        jnp.zeros(A.shape[1], jnp.asarray(A).dtype), lr=lr, max_iter=2000
    )
    assert host.nit == dev.nit
    np.testing.assert_array_equal(host.x, dev.x)
    assert isinstance(dev.x0, np.ndarray)
    np.testing.assert_array_equal(host.x0, dev.x0)


def test_lasso_params_tuple_cached_per_instance():
    # solve_fixed_step builds its params tuple once (fresh scalar asarrays
    # per solve cost one host->device transfer each, RTT-priced on remote
    # backends) and reuses the SAME device buffers on repeat solves.
    A, b = _toy()
    prob = Lasso(A, b, l1_ratio=0.01)
    lr = 1.0 / prob.lipschitz()
    prob.solve_fixed_step(np.zeros(A.shape[1]), lr=lr, max_iter=100)
    p1 = prob._params_cache
    prob.solve_fixed_step(np.zeros(A.shape[1]), lr=lr, max_iter=100)
    assert prob._params_cache is p1
    # pure-LASSO tuples omit the elastic-net term entirely (static length)
    assert len(p1) == 3
    enet = Lasso(A, b, l1_ratio=0.01, l2_ratio=0.5)
    enet.solve_fixed_step(np.zeros(A.shape[1]), lr=lr, max_iter=100)
    assert len(enet._params_cache) == 4

"""Sparse logistic regression: gradients, KKT optimality certificate, and
backtracking-vs-fixed-step behavior on a non-quadratic smooth loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zfista_tpu.models.logistic import SparseLogistic


@pytest.fixture
def toy():
    rng = np.random.default_rng(0)
    n, d = 60, 12
    A = rng.standard_normal((n, d))
    w_true = np.zeros(d)
    w_true[:3] = [1.5, -2.0, 1.0]
    y = np.sign(A @ w_true + 0.3 * rng.standard_normal(n))
    return SparseLogistic(A, y, l1_ratio=0.02)


def test_gradient_matches_autodiff(toy):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(toy.n_features))
    analytic = np.asarray(toy.jac_f(x))
    auto = np.asarray(jax.grad(lambda z: toy.f(z))(x))
    np.testing.assert_allclose(analytic, auto, rtol=1e-8, atol=1e-12)


def test_solve_satisfies_kkt(toy):
    res = toy.solve(tol=1e-10)
    assert res.success
    # External optimality certificate, independent of the solver's own
    # convergence criterion.
    assert toy.kkt_residual(res.x) < 1e-6


def test_l1_drives_sparsity(toy):
    dense = toy.solve(tol=1e-8)
    strong = SparseLogistic(np.asarray(toy.A), np.asarray(toy.y), l1_ratio=0.2)
    sparse = strong.solve(tol=1e-8)
    nnz_dense = int(np.sum(np.asarray(dense.x) != 0))
    nnz_sparse = int(np.sum(np.asarray(sparse.x) != 0))
    assert nnz_sparse < nnz_dense
    # the three informative features should survive moderate shrinkage
    assert np.all(np.asarray(dense.x)[:3] != 0)


def test_backtracking_beats_global_lipschitz_step(toy):
    """The global 1/L step is pessimistic for logistic losses (local
    curvature < 1/4 bound once the classifier saturates).  Backtracking
    started ABOVE 1/L (lr only ever decays, reference semantics) should
    settle on a larger accepted step and converge in fewer iterations
    than the fixed 1/L step."""
    L = toy.lipschitz()
    fixed = toy.solve(lr=1.0 / L, decay_rate=1, tol=1e-8)
    bt = toy.solve(lr=16.0 / L, tol=1e-8)
    assert bt.success and fixed.success
    assert bt.nit < fixed.nit
    # accepted step stayed above the global-Lipschitz step
    assert bt.lr > 1.0 / L
    np.testing.assert_allclose(
        np.ravel(bt.fun), np.ravel(fixed.fun), rtol=1e-6
    )


def test_label_validation():
    with pytest.raises(ValueError):
        SparseLogistic(np.eye(3), np.array([0.0, 1.0, -1.0]))

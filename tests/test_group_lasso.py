"""Group-lasso: block soft-threshold prox correctness (prox-theorem
oracle + hand values) and end-to-end grouped-sparsity recovery."""

import jax.numpy as jnp
import numpy as np

from zfista_tpu.models.lasso import GroupLasso
from zfista_tpu.ops.prox import prox_group_lasso


def test_prox_group_lasso_hand_values():
    # group of norm 5 (3-4-0 pattern), scale 1 -> shrink by (1 - 1/5)
    x = jnp.asarray([3.0, 4.0, 0.0, 0.1, 0.0, 0.0])
    out = prox_group_lasso(x, 1.0, 3)
    np.testing.assert_allclose(out[:3], [2.4, 3.2, 0.0], atol=1e-12)
    # second group norm 0.1 < scale -> zeroed
    np.testing.assert_allclose(out[3:], [0.0, 0.0, 0.0], atol=1e-12)


def test_prox_group_lasso_optimality():
    # prox_h(z) minimizes  h(x) + ||x - z||^2/2  with h = s*sum_g||x_g||:
    # check against random perturbations.
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal(12))
    s = 0.7
    p = prox_group_lasso(z, s, 4)

    def obj(x):
        v = x.reshape(-1, 4)
        return s * float(jnp.sum(jnp.sqrt(jnp.sum(v * v, axis=1)))) + 0.5 * float(
            jnp.sum((x - z) ** 2)
        )

    base = obj(p)
    for _ in range(50):
        pert = p + 1e-4 * jnp.asarray(rng.standard_normal(12))
        assert obj(pert) >= base - 1e-10


def test_group_lasso_recovers_group_sparsity():
    rng = np.random.default_rng(1)
    m, n, gs = 60, 40, 4
    A = rng.standard_normal((m, n)) / np.sqrt(m)
    x_true = np.zeros(n)
    x_true[0:4] = rng.standard_normal(4)  # one active group
    x_true[20:24] = rng.standard_normal(4)  # another
    b = A @ x_true
    prob = GroupLasso(A, b, l1_ratio=0.01, group_size=gs)
    res = prob.minimize_proximal_gradient(
        np.zeros(n), lr=1 / prob.lipschitz(), decay_rate=1, nesterov=True,
        max_iter=20000, tol=1e-8,
    )
    assert res.success
    x = np.asarray(res.x).reshape(-1, gs)
    norms = np.linalg.norm(x, axis=1)
    active = set(np.nonzero(norms > 1e-3)[0])
    assert {0, 5} <= active  # true groups recovered
    # background separation: every non-support group is well below the
    # weakest true group (the old disjunction passed for diffuse failures)
    support_min = min(norms[0], norms[5])
    background = np.delete(norms, [0, 5])
    assert background.max() < 0.2 * support_min, (norms,)


def test_group_lasso_lambda_sweep_batched():
    from zfista_tpu.models.lasso import make_group_lasso_lambda_sweep
    from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch

    rng = np.random.default_rng(2)
    m, n, gs = 40, 24, 4
    A = rng.standard_normal((m, n)) / np.sqrt(m)
    x_true = np.zeros(n)
    x_true[:4] = rng.standard_normal(4)
    b = A @ x_true
    f, g, jac, prox = make_group_lasso_lambda_sweep(A, b, gs)
    lams = jnp.asarray([1e-4, 1e-2, 1.0])
    res = minimize_proximal_gradient_batch(
        f, g, jac, prox, jnp.zeros((3, n)), batch_params=lams,
        nesterov=True, max_iter=20000,
    )
    assert bool(np.all(res.success))
    # heavier lambda => sparser groups
    norms = [np.linalg.norm(np.asarray(res.x[i]).reshape(-1, gs), axis=1) for i in range(3)]
    active = [int((nz > 1e-6).sum()) for nz in norms]
    assert active[0] >= active[1] >= active[2]
    assert active[2] < active[0]  # strong lambda prunes groups

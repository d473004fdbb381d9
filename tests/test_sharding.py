"""Sharded-solve tests on the 8-virtual-device CPU mesh: sharded == single.

The reference has no distributed path (SURVEY.md §2.6); these assert the
TPU-native design invariant that GSPMD sharding changes placement, never
results.
"""

import jax
import jax.numpy as jnp
import numpy as np

from zfista_tpu.models.lasso import Lasso, fista_step_dense, operator_norm_sq
from zfista_tpu.parallel.sharding import (
    feature_sharding,
    make_mesh,
    operator_sharding,
)


def _rand_lasso(m=32, n=64, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((m, n)) / np.sqrt(m)
    x_true = np.zeros(n)
    x_true[rng.choice(n, 8, replace=False)] = rng.standard_normal(8)
    b = A @ x_true + 0.01 * rng.standard_normal(m)
    return A, b


def test_feature_sharded_solve_matches_single_device():
    A_np, b_np = _rand_lasso()
    lam = 0.01
    L = float(2 * operator_norm_sq(jnp.asarray(A_np), 100))

    def run(A, b, x0, n_iter=200):
        lr = jnp.asarray(1.0 / L, A.dtype)

        @jax.jit
        def go(carry):
            def body(_, c):
                return fista_step_dense(A, b, jnp.asarray(lam, A.dtype), lr, c)

            return jax.lax.fori_loop(0, n_iter, body, carry)

        return np.asarray(go((x0, x0, jnp.ones((), A.dtype)))[0])

    x0 = jnp.zeros(A_np.shape[1])
    ref = run(jnp.asarray(A_np), jnp.asarray(b_np), x0)

    mesh = make_mesh(batch=2, model=4)
    A_sh = jax.device_put(jnp.asarray(A_np), operator_sharding(mesh))
    x0_sh = jax.device_put(x0, feature_sharding(mesh))
    sharded = run(A_sh, jnp.asarray(b_np), x0_sh)

    np.testing.assert_allclose(sharded, ref, atol=1e-10)


def test_full_solver_feature_sharded():
    A_np, b_np = _rand_lasso(m=24, n=32, seed=1)
    mesh = make_mesh(batch=1, model=8)
    A_sh = jax.device_put(jnp.asarray(A_np), operator_sharding(mesh))
    prob_sh = Lasso(A_sh, jnp.asarray(b_np), l1_ratio=0.01)
    prob = Lasso(A_np, b_np, l1_ratio=0.01)

    x0 = np.zeros(A_np.shape[1])
    lr = 1.0 / prob.lipschitz()
    r_ref = prob.minimize_proximal_gradient(
        x0, lr=lr, decay_rate=1, nesterov=True
    )
    x0_sh = jax.device_put(jnp.asarray(x0), feature_sharding(mesh))
    r_sh = prob_sh.minimize_proximal_gradient(
        x0_sh, lr=lr, decay_rate=1, nesterov=True
    )
    assert r_ref.success and r_sh.success
    assert r_ref.nit == r_sh.nit
    np.testing.assert_allclose(r_sh.x, r_ref.x, atol=1e-10)


def test_mesh_axes():
    mesh = make_mesh(batch=4, model=2)
    assert mesh.shape == {"batch": 4, "model": 2}
    mesh = make_mesh(model=2)
    assert mesh.shape == {"batch": 4, "model": 2}


def test_make_mesh_rejects_silent_undershoot():
    """An explicit batch*model below the default device count raises
    (review finding: a typo would silently idle hardware); passing the
    subset explicitly is the sanctioned spelling."""
    import jax
    import pytest

    n = len(jax.devices())
    assert n == 8
    with pytest.raises(ValueError, match="uses only"):
        make_mesh(batch=3, model=2)
    mesh = make_mesh(batch=3, model=2, devices=jax.devices()[:6])
    assert mesh.devices.size == 6


def test_distribute_global_single_process_placements():
    """distribute_global degenerates to a device_put single-process: the
    array lands with the requested sharding and exact contents, for both
    the TP operator layout P(None, 'model') and the feature layout
    P('model')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zfista_tpu.parallel.distributed import distribute_batch, distribute_global

    mesh = make_mesh(batch=1, model=8)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 16))
    x = rng.standard_normal(16)
    A_g = distribute_global(A, mesh, P(None, "model"))
    x_g = distribute_global(x, mesh, P("model"))
    assert A_g.sharding == NamedSharding(mesh, P(None, "model"))
    assert x_g.sharding == NamedSharding(mesh, P("model"))
    np.testing.assert_array_equal(np.asarray(A_g), A)
    np.testing.assert_array_equal(np.asarray(x_g), x)
    # The batch helper is the P("batch") specialization of the same path —
    # contents asserted too (a per-shard slicing bug could permute lanes
    # while keeping the right sharding).
    mesh2 = make_mesh(batch=8, model=1)
    lanes = rng.standard_normal((8, 16))
    b_g = distribute_batch(lanes, mesh2)
    assert b_g.sharding == NamedSharding(mesh2, P("batch"))
    np.testing.assert_array_equal(np.asarray(b_g), lanes)

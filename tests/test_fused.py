"""Pallas fused-kernel parity tests (interpreter mode on CPU) vs the XLA
reference path: bit-identical elementwise chains, identical FISTA steps."""

import jax.numpy as jnp
import numpy as np

from zfista_tpu.models.lasso import fista_step_dense
from zfista_tpu.ops.fused import (
    fista_step_dense_pallas,
    fused_prox_momentum,
    fused_prox_momentum_xla,
)


def test_fused_prox_momentum_matches_xla():
    rng = np.random.default_rng(0)
    for n in [1, 100, 128, 1024, 5000]:
        y = jnp.asarray(rng.standard_normal(n), jnp.float32)
        g = jnp.asarray(rng.standard_normal(n), jnp.float32)
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        xk, yk = fused_prox_momentum(y, g, x, 0.1, 0.05, 0.3, interpret=True)
        xr, yr = fused_prox_momentum_xla(y, g, x, 0.1, 0.05, 0.3)
        # 1-ULP differences allowed: interpret mode and XLA fuse the
        # multiply-adds differently.
        np.testing.assert_allclose(np.asarray(xk), np.asarray(xr), rtol=2e-7, atol=1e-7)
        np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), rtol=2e-7, atol=1e-7)


def test_fista_step_pallas_matches_reference_step():
    rng = np.random.default_rng(1)
    m, n = 16, 300
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32) / 4
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    t = jnp.asarray(1.7, jnp.float32)
    lam = jnp.asarray(0.02, jnp.float32)
    lr = jnp.asarray(0.01, jnp.float32)

    ref = fista_step_dense(A, b, lam, lr, (x, y, t))
    pal = fista_step_dense_pallas(A, b, lam, lr, (x, y, t), interpret=True)
    for r, p in zip(ref, pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=1e-6)


def test_fused_auto_dispatch_cpu_fallback():
    # On the CPU test backend, the auto dispatcher must take the jnp path
    # (the Pallas TPU lowering would raise).
    import numpy as np

    from zfista_tpu.ops.fused import fused_prox_momentum_auto

    rng = np.random.default_rng(2)
    y, g, x = (jnp.asarray(rng.standard_normal(64), jnp.float32) for _ in range(3))
    xk, yk = fused_prox_momentum_auto(y, g, x, 0.1, 0.05, 0.3)
    xr, yr = fused_prox_momentum_xla(y, g, x, 0.1, 0.05, 0.3)
    np.testing.assert_array_equal(np.asarray(xk), np.asarray(xr))
    np.testing.assert_array_equal(np.asarray(yk), np.asarray(yr))

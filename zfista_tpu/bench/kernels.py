r"""Pallas-vs-XLA sweep for the fused prox+momentum kernel — the evidence
base for whether the hand kernel earns a place on the dispatch path
(SURVEY.md §7 step 5: "kernels must win at the memory-bandwidth roofline
to justify themselves").

Two measurements per size:

* **chain** — the isolated elementwise chain (gradient step →
  soft-threshold → momentum extrapolation), the kernel's own territory:
  5 n-vectors of HBM traffic per application, no matvecs.
* **step** — one full dense-LASSO FISTA step (2 matvecs + chain) with a
  small row count, the end-to-end regime where fusion could matter.

Each variant runs ``n_iter`` applications inside one ``fori_loop`` (the
chain feeds its outputs back as inputs), so the number is steady-state
device throughput with dispatch amortized; both variants are bit-compared
first.  Results print as JSON rows; the committed table lives in
BENCHMARKS.md ("Pallas kernel decision").

CLI: ``python -m zfista_tpu.bench.kernels [--sizes 1e4,1e5,1e6,1e7]``
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time_loop(fn, *args, repeats: int = 3) -> float:
    import jax

    jax.block_until_ready(fn(*args))  # compile + warm
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def sweep_chain(n: int, n_iter: int = 300) -> dict:
    """Isolated elementwise chain: Pallas one-pass vs XLA fusion."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from zfista_tpu.ops.fused import (
        fused_prox_momentum,
        fused_prox_momentum_xla,
    )

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    grad = jnp.asarray(rng.standard_normal(n), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    thresh = jnp.asarray(1e-4, jnp.float32)
    gamma = jnp.asarray(0.5, jnp.float32)

    def loop(chain):
        @jax.jit
        def run(y, grad, x):
            def body(_, c):
                x_c, y_c = c
                x_n, y_n = chain(y_c, grad, x_c, lr, thresh, gamma)
                return (x_n, y_n)

            return lax.fori_loop(0, n_iter, body, (x, y))

        return run

    run_p = loop(lambda *a: fused_prox_momentum(*a))
    run_x = loop(fused_prox_momentum_xla)

    # bit parity before timing — over the WHOLE carry (a kernel bug
    # confined to the momentum output y would otherwise pass unnoticed).
    out_p = jax.block_until_ready(run_p(y, grad, x))
    out_x = jax.block_until_ready(run_x(y, grad, x))
    for a, b_ in zip(out_p, out_x):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    t_p = _time_loop(run_p, y, grad, x)
    t_x = _time_loop(run_x, y, grad, x)
    traffic = 5 * 4 * n * n_iter  # 3 reads + 2 writes, f32
    return dict(
        kind="chain",
        n=n,
        pallas_us_per_app=1e6 * t_p / n_iter,
        xla_us_per_app=1e6 * t_x / n_iter,
        pallas_gbps=traffic / t_p / 1e9,
        xla_gbps=traffic / t_x / 1e9,
        pallas_over_xla=t_x / t_p,
    )


def sweep_step(n: int, m: int = 256, n_iter: int = 300) -> dict:
    """Full FISTA step, small m: XLA matvecs + (Pallas | XLA) chain."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from zfista_tpu.models.lasso import fista_step_dense
    from zfista_tpu.ops.fused import fista_step_dense_pallas

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32) / np.sqrt(m)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    lam = jnp.asarray(0.01, jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    x0 = jnp.zeros(n, jnp.float32)
    carry = (x0, x0, jnp.asarray(1.0, jnp.float32))

    def loop(step):
        @jax.jit
        def run(A, b, c):
            return lax.fori_loop(0, n_iter, lambda _, cc: step(A, b, lam, lr, cc), c)

        return run

    run_p = loop(lambda A, b, lam, lr, c: fista_step_dense_pallas(A, b, lam, lr, c))
    run_x = loop(fista_step_dense)
    out_p = jax.block_until_ready(run_p(A, b, carry))
    out_x = jax.block_until_ready(run_x(A, b, carry))
    for a, b_ in zip(out_p, out_x):  # whole carry: x, y AND t
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=0, rtol=0)
    t_p = _time_loop(run_p, A, b, carry)
    t_x = _time_loop(run_x, A, b, carry)
    return dict(
        kind="step",
        n=n,
        m=m,
        pallas_iters_per_s=n_iter / t_p,
        xla_iters_per_s=n_iter / t_x,
        pallas_over_xla=t_x / t_p,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Pallas-vs-XLA kernel sweep")
    parser.add_argument("--sizes", default="1e4,1e5,1e6,1e7")
    parser.add_argument("--step-sizes", default="1e5,1e6")
    parser.add_argument("--n-iter", type=int, default=300)
    args = parser.parse_args(argv)
    for s in args.sizes.split(","):
        if not s:
            continue
        row = sweep_chain(int(float(s)), args.n_iter)
        print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                          for k, v in row.items()}), flush=True)
    for s in args.step_sizes.split(","):
        if not s:
            continue
        row = sweep_step(int(float(s)), n_iter=args.n_iter)
        print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                          for k, v in row.items()}), flush=True)


if __name__ == "__main__":
    main()

r"""North-star metric: wall-time to 1e-8 optimality gap (LASSO n=10k).

For each iteration target ``k``, times ONE dispatched f32 fixed-step FISTA
program (``fori_loop`` over ``fista_step_dense``, deep unroll) from the
cold start to ``x_k`` — a single host sync per measurement, so the number
is "wall time to have the solution", not checkpoint-instrumentation
round-trips.  Each checkpoint's objective is evaluated in float64 on the
host against a certified ``F*`` obtained by float64 refinement (FISTA
warm-started from the f32 solution, iterated to the f64 floor).  Reports
the first target whose gap ``F(x_k) - F*`` is below each threshold, for
both the raw loop and the public ``Lasso.solve_fixed_step`` path.

Why f32 suffices: near the optimum the composite objective is locally
quadratic along the smooth directions and exactly linear-with-matching-
subgradient along the active L1 kinks, so the gap scales as
``O(L * ||x - x*||^2)`` — f32's ~1e-6 iterate precision yields a ~1e-10
gap, two orders below the 1e-8 target (measured: 1.3e-10).

Usage:
    python examples/optimality_gap.py [--n 10000] [--m 2000] [--lam 0.01]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

# Checkout-runnable without installation: `python examples/<name>.py` puts
# examples/ (not the repo root) on sys.path.
try:
    import zfista_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000)
    parser.add_argument("--m", type=int, default=2_000)
    parser.add_argument("--lam", type=float, default=0.01)
    parser.add_argument("--refine-iters", type=int, default=500)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from zfista_tpu.models.lasso import fista_step_dense, operator_norm_sq

    m, n, lam = args.m, args.n, args.lam
    rng = np.random.default_rng(0)
    A64 = rng.standard_normal((m, n)) / np.sqrt(m)
    x_true = np.zeros(n)
    x_true[rng.choice(n, n // 100, replace=False)] = rng.standard_normal(n // 100)
    b64 = A64 @ x_true + 0.01 * rng.standard_normal(m)

    def F_host(x):
        r = A64 @ x - b64
        return float(r @ r + lam * np.abs(x).sum())

    # --- f32 solve on the default device (TPU), chunked checkpoints -----
    A = jnp.asarray(A64.astype(np.float32))
    b = jnp.asarray(b64.astype(np.float32))
    L = float(2 * operator_norm_sq(A, 100))
    lr32 = jnp.float32(1.0 / L)
    lam32 = jnp.float32(lam)

    @partial(jax.jit, static_argnames=("k",))
    def run32(A, b, c, k):
        # unroll=64: the measured software-pipelining optimum on v5e
        # (BENCHMARKS.md "Driver-recorded headline").
        return lax.fori_loop(
            0, k, lambda _, c: fista_step_dense(A, b, lam32, lr32, c), c, unroll=64
        )

    x0 = jnp.zeros((n,), jnp.float32)
    targets = [250, 500, 1000, 2000, 4000]
    checkpoints = []
    for k in targets:
        c0 = (x0, x0, jnp.float32(1.0))
        jax.block_until_ready(run32(A, b, c0, k))  # compile warmup per k
        best = np.inf
        for _ in range(3):
            c0 = (x0, x0, jnp.float32(1.0))
            t0 = time.perf_counter()
            c = jax.block_until_ready(run32(A, b, c0, k))
            best = min(best, time.perf_counter() - t0)
        checkpoints.append((k, best, np.asarray(c[0], np.float64)))

    # Public-API variant: the path users call, same single-dispatch deal.
    from zfista_tpu.models.lasso import Lasso

    prob = Lasso(A, b, l1_ratio=lam)
    pub_checkpoints = []
    import warnings as _w

    for k in targets:
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            opts = dict(lr=1.0 / L, tol=0.0, check_every=64, max_iter=k)
            prob.solve_fixed_step(x0, **opts)  # warm
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                res = prob.solve_fixed_step(x0, **opts)
                best = min(best, time.perf_counter() - t0)
        pub_checkpoints.append((k, best, np.asarray(res.x, np.float64)))

    # --- certified F*: f64 refinement on CPU from the f32 solution ------
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        with jax.enable_x64(True):
            A6 = jnp.asarray(A64)
            b6 = jnp.asarray(b64)
            lr64 = jnp.float64(1.0 / L)
            lam64 = jnp.float64(lam)

            @partial(jax.jit, static_argnames=("k",))
            def run64(A, b, c, k):
                return lax.fori_loop(
                    0, k, lambda _, c: fista_step_dense(A, b, lam64, lr64, c), c
                )

            xw = jnp.asarray(checkpoints[-1][2])
            c6 = (xw, xw, jnp.float64(1.0))
            c6 = jax.block_until_ready(run64(A6, b6, c6, args.refine_iters))
            Fstar = F_host(np.asarray(c6[0]))

    def pack(cps):
        return [
            {"iters": it, "wall_s": round(w, 4), "gap": F_host(x) - Fstar}
            for it, w, x in cps
        ]

    out = {
        "metric": "lasso_n10k_wall_to_gap",
        "F_star": Fstar,
        "checkpoints": pack(checkpoints),
        "public_checkpoints": pack(pub_checkpoints),
    }
    for key, cps in (("", out["checkpoints"]), ("public_", out["public_checkpoints"])):
        for thresh in [1e-6, 1e-8]:
            hit = next((cp for cp in cps if cp["gap"] <= thresh), None)
            out[f"{key}wall_to_{thresh:g}_gap_s"] = (
                None if hit is None else hit["wall_s"]
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

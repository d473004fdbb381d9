r"""Large-scale feature-sharded LASSO (million-variable dense operator).

The build target's scale config: ``min_x ||Ax-b||^2 + lam*||x||_1`` with
dense ``A (m, n)`` at n up to 10^6, the feature axis (and the operator's
columns) sharded over the ``"model"`` mesh axis.  On one chip the mesh is
trivial and this is a pure HBM-bandwidth exercise (2 passes over A per
iteration); across chips XLA turns ``A @ x`` into chip-local partial
matvecs + a psum from the shardings alone — the script is identical either
way (run under ``jax.distributed.initialize`` on a pod slice for
multi-host; see zfista_tpu/parallel/sharding.py).

Prints one JSON line with iterations/s and achieved HBM bandwidth
(the roofline measure for this workload).

Usage:
    python examples/large_lasso.py [--n 1000000] [--m 2000] [--iters 200]
                                   [--model-shards 1]
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
    parser.add_argument("--n", type=int, default=1_000_000)
    parser.add_argument("--m", type=int, default=2000)
    parser.add_argument("--iters", type=int, default=200)
    parser.add_argument("--model-shards", type=int, default=1)
    parser.add_argument("--lam", type=float, default=0.01)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from zfista_tpu.models.lasso import fista_step_dense, operator_norm_sq
    from zfista_tpu.parallel.sharding import (
        feature_sharding,
        make_mesh,
        operator_sharding,
    )

    m, n = args.m, args.n
    # Build A SHARD-LOCAL: jit with out_shardings materializes each chip's
    # columns on that chip directly.  An eager jax.random.normal would
    # commit the full operator to device 0 first (8 GB at n=1e6) and OOM
    # at exactly the scale model-sharding exists for.
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(model=args.model_shards)

    @partial(jax.jit, out_shardings=operator_sharding(mesh))
    def build_A(key):
        return jax.random.normal(key, (m, n), jnp.float32) / np.sqrt(m)

    A = build_A(key)
    b = jax.random.normal(jax.random.PRNGKey(1), (m,), jnp.float32)
    L = 2 * operator_norm_sq(A, 30)
    lr = (1.0 / L).astype(jnp.float32)
    lam = jnp.float32(args.lam)

    x0 = jax.device_put(jnp.zeros((n,), jnp.float32), feature_sharding(mesh))
    carry0 = (x0, x0, jnp.float32(1.0))

    @jax.jit
    def run(A, b, c):
        # A/b as arguments, NOT closure captures: captured operands are
        # baked into the program as constants (8 GB at n=1e6).
        return lax.fori_loop(
            0, args.iters, lambda _, c: fista_step_dense(A, b, lam, lr, c), c
        )

    t0 = time.perf_counter()
    jax.block_until_ready(run(A, b, carry0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(A, b, carry0))
    dt = time.perf_counter() - t0
    iters_per_s = args.iters / dt
    # 2 full passes over A per iteration (A @ y and A^T @ r), f32.
    gb_per_iter = 2 * m * n * 4 / 1e9
    print(
        json.dumps(
            {
                "metric": "large_lasso_iterations_per_s",
                "n": n,
                "m": m,
                "model_shards": args.model_shards,
                "value": round(iters_per_s, 2),
                "unit": "iter/s",
                "achieved_GBps": round(iters_per_s * gb_per_iter, 1),
                "compile_s": round(compile_s, 1),
                "final_obj": float(
                    jnp.sum((A @ out[0] - b) ** 2) + lam * jnp.sum(jnp.abs(out[0]))
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

r"""Multi-process / multi-host distributed runtime.

The reference has NO distributed backend — its only parallelism is joblib
processes on one machine (reference: benchmarks/benchmark.py:325-371;
SURVEY.md §2.6).  This module is the TPU-native multi-host story: one
``jax.distributed`` runtime + one global mesh, so the *same* batched solver
program (:mod:`zfista_tpu.parallel.batch`) spans hosts — collectives ride
ICI within a slice and DCN across hosts, inserted by XLA from shardings.

Launch recipe (one command per host / process)::

    # host 0                                     # host 1
    python train.py \
        --coordinator=10.0.0.1:8476 \
        --num-processes=2 --process-id=0         ... --process-id=1

    # in train.py, before any jax call:
    from zfista_tpu.parallel import distributed
    distributed.initialize(coordinator_address, num_processes, process_id)
    mesh = distributed.global_mesh(model=1)       # spans ALL hosts' devices
    x0s = distributed.distribute_batch(x0_host, mesh)   # global sharded array
    res = minimize_proximal_gradient_batch(..., x0s, in_sharding=None)

On TPU pods, ``initialize()`` with no arguments autodetects everything from
the TPU metadata service.  On CPU (CI, tests) pass the three arguments
explicitly; collectives go through Gloo.  ``tests/test_distributed.py``
runs this module as a 2-process worker (``python -m
zfista_tpu.parallel.distributed``) on the CPU backend and asserts the
sharded multi-process solve equals a single-process solve.
"""

from __future__ import annotations

import argparse
from typing import Any

import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Any = None,
) -> None:
    """Join (or create) the distributed runtime.

    Thin wrapper over ``jax.distributed.initialize``: with no arguments,
    autodetects cluster configuration from the environment (TPU pod
    metadata, SLURM, or the ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` variables).  Must run before
    any other JAX call in the process.  Idempotent: a second call in the
    same process is a no-op (JAX raises if re-initialized with different
    arguments; we swallow the already-initialized case so library code can
    call this defensively).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized -> documented no-op
        msg = str(e).lower()
        # jax 0.9 raises "distributed.initialize should only be called
        # once."; older versions said "already initialized" — accept both.
        if "already" not in msg and "only be called once" not in msg:
            raise


def global_mesh(batch: int | None = None, model: int = 1):
    """A ``("batch", "model")`` mesh over ALL processes' devices.

    Same semantics as :func:`zfista_tpu.parallel.sharding.make_mesh`, but
    explicitly documented to span hosts: ``jax.devices()`` under an
    initialized distributed runtime lists every process's devices.
    """
    from zfista_tpu.parallel.sharding import make_mesh

    return make_mesh(batch=batch, model=model)


def distribute_global(arr: Any, mesh, spec) -> Any:
    """Build a GLOBAL array with PartitionSpec ``spec`` over ``mesh`` from
    identical host data on every process.

    Every process passes the same full logical array (e.g. generated from a
    shared seed); each contributes only the shards owned by its local
    devices, so no host ever materializes device memory for remote shards.
    Single-process this degenerates to a ``device_put``.  Use it to lay a
    dense operator across hosts (``P(None, "model")``) or an iterate across
    the feature axis (``P("model")``) — the tensor-parallel placements of
    :mod:`zfista_tpu.parallel.sharding` — as well as scenario batches.
    """
    import jax
    from jax.sharding import NamedSharding

    arr = np.asarray(arr)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def distribute_batch(x0s: Any, mesh) -> Any:
    """:func:`distribute_global` with the scenario-batch placement
    ``P("batch")`` — lanes sharded across the mesh's batch axis."""
    from jax.sharding import PartitionSpec as P

    return distribute_global(x0s, mesh, P("batch"))


def process_count() -> int:
    import jax

    return jax.process_count()


def all_processes_allclose(local_value, **kw) -> bool:
    """True on every process iff every process's ``local_value`` matches
    process 0's (an allgather + compare; diagnostic for parity tests).

    Note ``np.allclose`` semantics: ``atol=0`` alone still leaves the
    default ``rtol=1e-5`` — pass ``rtol=0`` as well for an exact-match
    consensus (the parity worker does)."""
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(local_value))
    return all(
        np.allclose(gathered[0], gathered[i], **kw)
        for i in range(len(gathered))
    )


# ---------------------------------------------------------------------------
# Worker entry: ``python -m zfista_tpu.parallel.distributed`` — used by
# tests/test_distributed.py to run a real 2-process parity check on the CPU
# backend, and usable as a template for multi-host launches.
# ---------------------------------------------------------------------------


def _parity_worker(args: argparse.Namespace) -> None:
    """Solve a LASSO λ-sweep batch sharded across ALL processes' devices and
    assert it matches the same batch solved on one local device."""
    if args.platform == "cpu":
        from zfista_tpu.utils.platform import force_platform

        # x64: reference-precision parity (f32 FISTA ripple can floor
        # above the 1e-5 tolerance; the reference is float64 throughout).
        force_platform("cpu", n_devices=args.local_devices, x64=True)
    import jax

    initialize(args.coordinator, args.num_processes, args.process_id)
    import jax.numpy as jnp

    from zfista_tpu.models.lasso import make_lasso_lambda_sweep
    from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch

    n_dev = len(jax.devices())
    mesh = global_mesh(batch=n_dev, model=1)

    # Identical data on every process from a shared seed.
    rng = np.random.default_rng(0)
    m, n = 16, 8
    dtype = np.float64 if args.platform == "cpu" else np.float32
    A = rng.standard_normal((m, n)).astype(dtype)
    b = rng.standard_normal(m).astype(dtype)
    f, g, jac_f, prox = make_lasso_lambda_sweep(A, b)
    B = 2 * n_dev
    lams = np.linspace(0.05, 0.5, B).astype(dtype)
    x0s = np.zeros((B, n), dtype)
    lr = 0.9 / float(2 * np.linalg.norm(A, 2) ** 2)  # 0.9/L, L = 2*sigma^2

    solve = lambda x0_arr, lam_arr: minimize_proximal_gradient_batch(
        f, g, jac_f, prox, x0_arr, batch_params=lam_arr,
        lr=lr, nesterov=True, max_iter=20000, keep_state=False,
    )

    # Distributed: batch axis sharded over every device of every process.
    res_dist = solve(
        distribute_batch(x0s, mesh), distribute_batch(lams, mesh)
    )
    # Local reference: same batch, one local device, no sharding.
    with jax.default_device(jax.local_devices()[0]):
        res_local = solve(jnp.asarray(x0s), jnp.asarray(lams))

    assert res_dist.x.shape == (B, n)
    np.testing.assert_allclose(res_dist.x, res_local.x, atol=1e-6)
    np.testing.assert_array_equal(res_dist.nit, res_local.nit)
    assert bool(np.all(res_dist.success))
    # Cross-process consensus: every process computed identical results.
    assert all_processes_allclose(res_dist.x, atol=0, rtol=0)
    print(f"PARITY_OK process={args.process_id}/{args.num_processes} "
          f"devices={n_dev} batch={B}", flush=True)

    # --- Tensor-parallel (model-axis) case -------------------------------
    # The operator's FEATURE axis is sharded across every device of every
    # process (A laid out P(None, "model"), x P("model")), so the partial
    # matvecs in f/jac_f psum ACROSS THE PROCESS BOUNDARY — the collective
    # the n=1M feature-sharded configs[4] story rests on.  Sharded solve
    # must equal the one-local-device solve exactly in nit and to f64
    # roundoff in x.
    from jax.sharding import PartitionSpec as P

    from zfista_tpu.models.lasso import Lasso

    mesh_tp = global_mesh(batch=1, model=n_dev)
    L = float(2 * np.linalg.norm(A, 2) ** 2)
    prob_tp = Lasso(
        distribute_global(A, mesh_tp, P(None, "model")),
        jnp.asarray(b),
        l1_ratio=0.05,
    )
    res_tp = prob_tp.solve_fixed_step(
        distribute_global(np.zeros(n, dtype), mesh_tp, P("model")),
        lr=1.0 / L,
        max_iter=20000,
    )
    with jax.default_device(jax.local_devices()[0]):
        res_tp_local = Lasso(
            jnp.asarray(A), jnp.asarray(b), l1_ratio=0.05
        ).solve_fixed_step(
            jnp.zeros(n, dtype), lr=1.0 / L, max_iter=20000
        )
    assert res_tp.success and res_tp_local.success
    assert res_tp.nit == res_tp_local.nit, (
        f"TP nit diverged: {res_tp.nit} vs {res_tp_local.nit}"
    )
    np.testing.assert_allclose(res_tp.x, res_tp_local.x, atol=1e-9)
    assert all_processes_allclose(res_tp.x, atol=0, rtol=0)
    print(f"TP_PARITY_OK process={args.process_id}/{args.num_processes} "
          f"model={n_dev}", flush=True)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="zfista_tpu distributed worker (parity check / launch template)"
    )
    parser.add_argument("--coordinator", required=True)
    parser.add_argument("--num-processes", type=int, required=True)
    parser.add_argument("--process-id", type=int, required=True)
    parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    parser.add_argument("--local-devices", type=int, default=4)
    args = parser.parse_args(argv)
    _parity_worker(args)


if __name__ == "__main__":
    main()

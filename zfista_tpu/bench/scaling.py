r"""Weak-scaling measurement: solves/s-per-device as the mesh grows.

The build target is >=85% weak-scaling efficiency to 2 hosts (BASELINE.md).
Real multi-host TPU hardware is not reachable from this environment, so the
measurable stand-in is the same SPMD program scaled over a growing device
mesh: the scenario batch grows proportionally with the device count
(``lanes_per_device`` held constant) and throughput per device is compared
against the 1-device run.

The measured program is the flagship fixed-step FISTA iteration on dense
LASSO (the north-star workload, ``models.lasso.fista_step_dense``) — the
same step the batched public driver advances; compile time is excluded
(warm-up call), and the batch axis is the only sharded axis, so the
only cross-device communication is the loop-trip predicate — the
weak-scaling ideal.  On virtual CPU devices the curve is additionally
bounded by physical cores (see BENCHMARKS.md for the annotated numbers);
on a TPU pod the same harness runs unchanged over real chips.

CLI: ``python -m zfista_tpu.bench.scaling [--devices 1,2,4,8] ...``
"""

from __future__ import annotations

import argparse
import time
from typing import Sequence

import numpy as np


def weak_scaling(
    device_counts: Sequence[int] = (1, 2, 4, 8),
    lanes_per_device: int = 64,
    n_features: int = 2048,
    m_rows: int = 512,
    n_iter: int = 200,
    repeats: int = 3,
    seed: int = 0,
) -> list[dict]:
    """Measure per-device throughput of the batched FISTA step at constant
    work per device.  Returns one row per device count:
    ``{devices, lanes, seconds, lane_iters_per_s, per_device, efficiency}``.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zfista_tpu.models.lasso import fista_step_dense

    devs = jax.devices()
    if max(device_counts) > len(devs):
        raise ValueError(
            f"requested {max(device_counts)} devices, have {len(devs)}"
        )
    rng = np.random.default_rng(seed)
    A_np = rng.standard_normal((m_rows, n_features)).astype(np.float32)
    A_np /= np.sqrt(m_rows)
    b_np = rng.standard_normal(m_rows).astype(np.float32)
    lam = np.float32(0.01)
    lr = np.float32(0.25)  # fixed arbitrary stable step; work is what matters

    rows: list[dict] = []
    base_per_device = None
    # Efficiency is relative to the SMALLEST device count (normally 1):
    # an unsorted --devices list must not silently make e.g. the 8-device
    # row the 100% baseline.
    device_counts = sorted(device_counts)
    for d in device_counts:
        mesh = Mesh(np.array(devs[:d]), ("batch",))
        B = lanes_per_device * d
        sh = NamedSharding(mesh, P("batch"))
        rep = NamedSharding(mesh, P())
        X0 = jax.device_put(jnp.zeros((B, n_features), jnp.float32), sh)
        A = jax.device_put(jnp.asarray(A_np), rep)
        b = jax.device_put(jnp.asarray(b_np), rep)

        @jax.jit
        def run(A, b, x, y, t):
            def body(_, c):
                x, y, t = c
                step = jax.vmap(
                    lambda xi, yi, ti: fista_step_dense(
                        A, b, lam, lr, (xi, yi, ti)
                    )
                )
                return step(x, y, t)

            return lax.fori_loop(0, n_iter, body, (x, y, t))

        t0 = jnp.ones((B,), jnp.float32)
        jax.block_until_ready(run(A, b, X0, X0, t0))  # compile + warm
        best = np.inf
        for _ in range(repeats):
            start = time.perf_counter()
            jax.block_until_ready(run(A, b, X0, X0, t0))
            best = min(best, time.perf_counter() - start)
        lane_iters_per_s = B * n_iter / best
        per_device = lane_iters_per_s / d
        if base_per_device is None:
            base_per_device = per_device
        rows.append(
            dict(
                devices=d,
                lanes=B,
                seconds=best,
                lane_iters_per_s=lane_iters_per_s,
                per_device=per_device,
                efficiency=per_device / base_per_device,
            )
        )
    return rows


def format_table(rows: list[dict]) -> str:
    lines = [
        "| devices | lanes | time [s] | lane-iters/s | per device | efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['devices']} | {r['lanes']} | {r['seconds']:.3f} "
            f"| {r['lane_iters_per_s']:,.0f} | {r['per_device']:,.0f} "
            f"| {100 * r['efficiency']:.1f}% |"
        )
    return "\n".join(lines)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="weak-scaling harness")
    parser.add_argument("--devices", default="1,2,4,8")
    parser.add_argument("--lanes-per-device", type=int, default=64)
    parser.add_argument("--n-features", type=int, default=2048)
    parser.add_argument("--m-rows", type=int, default=512)
    parser.add_argument("--n-iter", type=int, default=200)
    parser.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu"],
        help="force a JAX platform (the session sitecustomize re-registers "
        "the TPU plugin, so the env var alone is not enough; this also "
        "updates jax.config after import)",
    )
    args = parser.parse_args(argv)
    counts = [int(c) for c in args.devices.split(",")]
    if args.platform:
        from zfista_tpu.utils.platform import force_platform

        # Virtual CPU devices are the documented multi-device stand-in;
        # without the count flag the host exposes ONE device and every
        # multi-device row fails.
        force_platform(args.platform, n_devices=max(counts))
    rows = weak_scaling(
        device_counts=counts,
        lanes_per_device=args.lanes_per_device,
        n_features=args.n_features,
        m_rows=args.m_rows,
        n_iter=args.n_iter,
    )
    print(format_table(rows))


if __name__ == "__main__":
    main()

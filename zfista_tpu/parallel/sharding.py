r"""Device-mesh (GSPMD) placement for scenario batches and sharded operators.

TPU-native replacement for the reference's process-level parallelism
(reference: benchmarks/benchmark.py:325-371 — joblib; no distributed backend
exists, SURVEY.md §2.6).  Design, per the scaling-book recipe: pick a mesh,
annotate shardings on the operands, let XLA insert the collectives.

Two mesh axes:

* ``"batch"`` — embarrassingly-parallel scenario lanes (initial points, λ
  values, momentum pairs).  Each lane's solve is independent; the batch axis
  of every ``State`` leaf is sharded and XLA runs lanes chip-locally with a
  single ``all-reduce`` of the 1-bit ``any(active)`` loop predicate per
  outer iteration — the line-search accept/reject and convergence consensus
  ride that same predicate, so all devices take identical branches.
* ``"model"`` — feature-axis sharding for large problems: a dense LASSO
  operator ``A (m, n)`` is laid out ``P(None, "model")`` and the iterate
  ``P("model")``, so ``A @ x`` becomes chip-local partial matvecs + a
  ``psum`` over feature blocks, and ``Aᵀ r`` is fully local.  XLA derives
  exactly these collectives from the shardings; nothing is hand-written.

Multi-host: the same code runs under ``jax.distributed.initialize`` —
``jax.devices()`` spans hosts and the mesh covers the slice; collectives ride
ICI inside a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    batch: int | None = None,
    model: int = 1,
    *,
    devices: Sequence[Any] | None = None,
) -> Mesh:
    """Build a ``("batch", "model")`` mesh over ``devices`` (default: all).

    ``batch=None`` uses every device not consumed by ``model``.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if batch is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        batch = n // model
    if batch * model > n:
        raise ValueError(f"mesh {batch}x{model} needs more than {n} devices")
    if batch * model < n and devices is None:
        # An explicit under-sized mesh over the DEFAULT device set is
        # almost always a typo that silently idles hardware; require the
        # caller to pass the subset explicitly if that is intended.
        raise ValueError(
            f"mesh {batch}x{model} uses only {batch * model} of {n} "
            "devices; pass devices=... explicitly to use a subset"
        )
    grid = np.array(devs[: batch * model]).reshape(batch, model)
    return Mesh(grid, ("batch", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``(B, ...)`` scenario arrays: batch axis over "batch"."""
    return NamedSharding(mesh, P("batch"))


def feature_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``(n,)`` iterates: feature axis over "model"."""
    return NamedSharding(mesh, P("model"))


def operator_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for dense ``(m, n)`` operators: columns over "model"."""
    return NamedSharding(mesh, P(None, "model"))


def shard_batch(x0s: Any, mesh: Mesh | None = None) -> Any:
    """Place a ``(B, n)`` batch with lanes sharded across the mesh's batch
    axis.  ``B`` must divide by the axis size (pad upstream if needed)."""
    if mesh is None:
        mesh = make_mesh()
    return jax.device_put(x0s, batch_sharding(mesh))

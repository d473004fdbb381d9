"""Batched (vmap) and sharded (mesh/GSPMD) solver drivers.

The reference's only parallelism is joblib multiprocessing over independent
solves (reference: benchmarks/benchmark.py:325-371).  Here the scenario batch
is one vmapped XLA program per chip (:mod:`zfista_tpu.parallel.batch`) that
shards across chips/hosts on a ``jax.sharding.Mesh``
(:mod:`zfista_tpu.parallel.sharding`); multi-process / multi-host runtime
setup lives in :mod:`zfista_tpu.parallel.distributed`.
"""

from zfista_tpu.parallel import distributed

from zfista_tpu.parallel.batch import (
    BatchResult,
    minimize_proximal_gradient_batch,
)
from zfista_tpu.parallel.sharding import (
    batch_sharding,
    feature_sharding,
    make_mesh,
    operator_sharding,
    shard_batch,
)

__all__ = [
    "BatchResult",
    "distributed",
    "minimize_proximal_gradient_batch",
    "make_mesh",
    "shard_batch",
    "batch_sharding",
    "feature_sharding",
    "operator_sharding",
]

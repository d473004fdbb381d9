"""zfista_tpu — a TPU-native proximal-gradient (ISTA/FISTA) framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
``zfista`` library (proximal gradient methods with a generalized momentum
factor for scalar and multiobjective composite problems), designed TPU-first:
the whole solve compiles to one XLA program, batches via ``vmap`` and shards
via ``jax.sharding`` meshes.

Public API (superset of the reference's ``zfista/__init__.py:1-3``):
``minimize_proximal_gradient`` plus the problem zoo (:mod:`zfista_tpu.models`),
Pareto metrics (:mod:`zfista_tpu.metrics`), batched/sharded solvers
(:mod:`zfista_tpu.parallel`) and fused Pallas kernels (:mod:`zfista_tpu.ops`).
"""

from zfista_tpu.core.options import SolverOptions
from zfista_tpu.core.result import SolveResult
from zfista_tpu.core.solver import minimize_proximal_gradient

__all__ = ["minimize_proximal_gradient", "SolveResult", "SolverOptions"]

# Single source of truth for the package version: pyproject.toml declares
# ``dynamic = ["version"]`` and reads THIS attribute at build time
# (tool.setuptools.dynamic), so wheels/sdists can never disagree with the
# runtime value.  tests/test_api_docs.py asserts the TOML wiring stays put.
__version__ = "0.3.0"

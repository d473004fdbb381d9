"""SolverOptions: the solver's keyword arguments as one frozen dataclass.

The reference has no config system — pure kwargs with defaults
(zfista/proximal_gradient.py:311-331).  The facade here stays
kwargs-compatible; this dataclass exists for programs that carry solver
configuration around (sweeps, services, serialized experiment specs):

    opts = SolverOptions(nesterov=True, tol=1e-6)
    res = prob.minimize_proximal_gradient(x0, **opts.kwargs())

Registered as a STATIC jax pytree node (``register_static``): every
field is solver configuration, not data, so an options object can ride
through ``jax.jit``/``jax.tree`` transparently as part of the treedef
(it is hashable and compared by value for the jit cache).
"""

from __future__ import annotations

from typing import Any

from dataclasses import asdict, dataclass

import jax


@dataclass(frozen=True)
class SolverOptions:
    """All options of :func:`zfista_tpu.minimize_proximal_gradient`,
    with the reference's defaults."""

    lr: float = 1.0
    tol: float = 1e-5
    tol_rel: float = 0.0
    tol_internal: float = 1e-12
    tol_internal_rel: float = 0.0
    max_iter: int = 1_000_000
    max_iter_internal: int = 100_000
    max_backtrack_iter: int = 100
    warm_start: bool = False
    decay_rate: float = 0.5
    nesterov: bool = False
    nesterov_ratio: tuple[float, float] = (0.0, 0.25)
    return_all: bool = False
    verbose: bool = False
    deprecated: bool = False
    # None = backend-aware auto (64 on TPU in the bitwise-identical
    # scalar fixed-step regime, 1 otherwise) — the facade's default.
    check_every: int | None = None
    adaptive_restart: bool = False
    project_momentum: bool = False
    history_chunk: int = 512

    def kwargs(self) -> dict[str, Any]:
        """As a keyword dict for the solver facade."""
        return asdict(self)

    def replace(self, **changes: Any) -> "SolverOptions":
        from dataclasses import replace as _replace

        return _replace(self, **changes)


# Static node: configuration is part of the program, not its data.
jax.tree_util.register_static(SolverOptions)

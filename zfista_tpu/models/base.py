r"""Problem protocol for multiobjective composite optimization.

Each problem defines :math:`F_i(x) = f_i(x) + g_i(x)` with smooth convex
:math:`f_i` and closed proper convex :math:`g_i` (reference:
zfista/problems.py:25-150).  TPU-first deltas from the reference:

* ``f``/``g``/``jac_f``/``prox_wsum_g`` are **pure jnp functions** — no
  per-call Python validation inside the traced hot path (the reference
  validates ``len(x)`` on every evaluation, problems.py:102,122).
* ``jac_f`` defaults to autodiff (``jax.jacfwd``); subclasses may override
  with the analytic form (both are tested against each other).
* The generic nonsmooth term keeps the reference's exact semantics:
  ``g_i(x) = r_i * ||x - s_i||_1`` plus a box indicator returning ``+inf``
  outside bounds (problems.py:101-117), and ``prox_wsum_g`` is the
  reference's sequential shifted-L1 composition + box projection
  (problems.py:119-138) rebuilt in :mod:`zfista_tpu.ops.prox`.
* ``solve`` / ``solve_batch`` run the jitted solver; ``solve_batch`` replaces
  the reference harness's joblib fan-out with one vmapped device program.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from zfista_tpu._typing import Array
from zfista_tpu.core.solver import minimize_proximal_gradient
from zfista_tpu.ops.prox import make_wsum_shifted_l1_box_prox


class Problem:
    """Base class for test problems (subclasses implement ``f``; ``jac_f``
    optional)."""

    def __init__(
        self,
        n_features: int,
        n_objectives: int,
        l1_ratios: Sequence[float] | None = None,
        l1_shifts: Sequence[float] | None = None,
        bounds: tuple[Any, Any] | None = None,
    ) -> None:
        self.n_features = n_features
        self.n_objectives = n_objectives
        self._l1_ratios_raw = l1_ratios
        self._l1_shifts_raw = l1_shifts
        # HOST float64 constants, cast to the trace dtype at use: a jnp
        # array materialized here would freeze to float32 if the problem
        # is constructed before jax_enable_x64 flips, silently carrying
        # float32 rounding into float64 reference-parity solves (the trap
        # SD's own constants avoid the same way, zoo.py).
        # atleast_1d: a scalar argument must hit the intended ValueError
        # below, not an opaque `len() of unsized object` TypeError.
        self.l1_ratios = (
            None
            if l1_ratios is None
            else np.atleast_1d(np.asarray(l1_ratios, np.float64))
        )
        self.l1_shifts = (
            np.zeros(n_objectives)
            if l1_shifts is None
            else np.atleast_1d(np.asarray(l1_shifts, np.float64))
        )
        self.bounds = bounds
        # Full-shape validation: a (m, 1) array passes a len() check but
        # broadcasts g() to (m, m) and corrupts the solve downstream.
        if l1_ratios is not None and self.l1_ratios.shape != (n_objectives,):
            raise ValueError(
                f"l1_ratios must have shape ({n_objectives},); "
                f"got {self.l1_ratios.shape}"
            )
        if l1_shifts is not None and self.l1_shifts.shape != (n_objectives,):
            raise ValueError(
                f"l1_shifts must have shape ({n_objectives},); "
                f"got {self.l1_shifts.shape}"
            )
        self._prox = make_wsum_shifted_l1_box_prox(
            self.l1_ratios,
            self.l1_shifts,
            None if bounds is None else bounds[0],
            None if bounds is None else bounds[1],
        )
        self.name = self._generate_name()

    # -- naming (kept format-compatible with the reference harness's cache
    #    keys and artifact paths, problems.py:81-91) ------------------------
    def _generate_name(self) -> str:
        parts = [type(self).__name__, f"n_{self.n_features}"]
        if self._l1_ratios_raw is not None:
            parts.append(
                "l1_ratios_" + "_".join(str(v) for v in self._l1_ratios_raw)
            )
            shifts = (
                self._l1_shifts_raw
                if self._l1_shifts_raw is not None
                else [0.0] * self.n_objectives
            )
            parts.append("l1_shifts_" + "_".join(str(v) for v in shifts))
        if self.bounds is not None:
            parts.append(f"bounds_{self.bounds[0]}_{self.bounds[1]}")
        return "_".join(parts)

    def __repr__(self) -> str:
        return self.name

    # -- smooth part --------------------------------------------------------
    def f(self, x: Array) -> Array:
        raise NotImplementedError

    def jac_f(self, x: Array) -> Array:
        """Analytic Jacobian override point; ``None``-equivalent default uses
        autodiff in :meth:`solve`."""
        import jax

        return jax.jacfwd(self.f)(x)

    # -- nonsmooth part ------------------------------------------------------
    def g(self, x: Array) -> Array:
        m = self.n_objectives
        if self.l1_ratios is not None:
            val = self.l1_ratios * jnp.sum(
                jnp.abs(x[None, :] - self.l1_shifts[:, None]), axis=1
            )
        else:
            val = jnp.zeros(m, x.dtype)
        if self.bounds is not None:
            infeasible = jnp.any(x < self.bounds[0]) | jnp.any(x > self.bounds[1])
            val = jnp.where(infeasible, jnp.inf, val)
        return val

    def prox_wsum_g(self, weight, x: Array) -> Array:
        return self._prox(weight, x)

    # -- solver entry points --------------------------------------------------
    def minimize_proximal_gradient(self, x0, **kwargs):
        """Reference-compatible entry (zfista/problems.py:140-150)."""
        return minimize_proximal_gradient(
            self.f, self.g, self.jac_f, self.prox_wsum_g, x0, **kwargs
        )

    solve = minimize_proximal_gradient

    def solve_batch(self, x0s, **kwargs):
        """Solve many initial points as one vmapped device program."""
        from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch

        return minimize_proximal_gradient_batch(
            self.f, self.g, self.jac_f, self.prox_wsum_g, x0s, **kwargs
        )

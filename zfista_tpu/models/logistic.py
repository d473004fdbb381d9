r"""L1-regularized logistic regression — a non-quadratic composite model.

``min_x  (1/m) * sum_i log(1 + exp(-y_i * <a_i, x>))  +  lam * ||x||_1``

The reference library ships only quadratic test problems; this model
exercises the solver surface the quadratics cannot: a non-quadratic smooth
term whose curvature varies over the path, where the backtracking line
search (``decay_rate < 1``) does real work, and where ``lr = 1/L`` from the
GLOBAL Lipschitz bound ``L = ||A||^2 / (4m)`` is pessimistic (the local
curvature shrinks as the classifier saturates, so backtracking typically
sustains much larger steps).

TPU-native construction mirrors :class:`zfista_tpu.models.lasso.Lasso`:
module-level params-style callables (stable identities for the
compiled-driver cache, operands as program arguments), full-precision
products, ``log1p(exp(.))`` computed stably via ``jax.nn.softplus``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zfista_tpu._typing import Array
from zfista_tpu.core.solver import minimize_proximal_gradient
from zfista_tpu.models.lasso import operator_norm_sq
from zfista_tpu.ops.precision import dot_hp
from zfista_tpu.ops.prox import soft_threshold

_DOT = dot_hp


class SparseLogistic:
    """L1-regularized binary logistic regression (labels ``y in {-1, +1}``).

    Instances are effectively FROZEN after construction: the solver
    operands (``A``, ``y``, ``l1_ratio``) are packed into a params tuple
    here, once — mutating the public attributes afterwards will not
    affect ``solve`` (construct a new instance instead)."""

    def __init__(self, A, y, l1_ratio: float = 0.01) -> None:
        A = jnp.asarray(A)
        if not jnp.issubdtype(A.dtype, jnp.floating):
            # Integer design matrices would truncate the l1_ratio scalar
            # to 0 in the params tuple (solver silently unregularized
            # while g/kkt_residual still use the float lambda).
            A = A.astype(jnp.zeros(0).dtype)
        self.A = A
        y = jnp.asarray(y)
        if not bool(jnp.all(jnp.abs(y) == 1)):
            raise ValueError("labels must be -1/+1")
        self.y = y.astype(self.A.dtype)
        self.l1_ratio = float(l1_ratio)
        self.n_samples, self.n_features = self.A.shape
        self.n_objectives = 1
        self._params = (
            self.A,
            self.y,
            jnp.asarray(self.l1_ratio, self.A.dtype),
        )

    # Methods delegate to the module-level params callables below — ONE
    # copy of the softplus/sigmoid margin math, so the solve path and the
    # external kkt_residual certificate can never drift numerically.
    def f(self, x: Array) -> Array:
        return _logistic_f_p(x, self._params)[0]

    def jac_f(self, x: Array) -> Array:
        return _logistic_jac_p(x, self._params)[0]

    def g(self, x: Array) -> Array:
        return _logistic_g_p(x, self._params)[0]

    def prox_wsum_g(self, weight, x: Array) -> Array:
        return _logistic_prox_p(jnp.asarray(weight), x, self._params)

    def lipschitz(self, n_iter: int = 50) -> float:
        """Global bound ``L = lambda_max(A^T A) / (4 m)`` (the logistic
        loss's second derivative is at most 1/4)."""
        return float(operator_norm_sq(self.A, n_iter) / (4 * self.n_samples))

    def solve(self, x0=None, **kwargs):
        """Backtracking FISTA by default (the global ``1/L`` step is
        pessimistic for logistic losses — backtracking finds larger
        steps; pass ``decay_rate=1, lr=1/L`` for the fixed-step path)."""
        if x0 is None:
            x0 = jnp.zeros(self.n_features, self.A.dtype)
        kwargs.setdefault("nesterov", True)
        return minimize_proximal_gradient(
            _logistic_f_p, _logistic_g_p, _logistic_jac_p, _logistic_prox_p,
            x0, params=self._params, **kwargs
        )

    def kkt_residual(self, x) -> float:
        """Max violation of the L1-subgradient optimality conditions —
        an external certificate independent of the solver's own
        convergence test: ``|grad_i| <= lam`` where ``x_i == 0`` and
        ``grad_i == -lam * sign(x_i)`` elsewhere."""
        gr = np.asarray(self.jac_f(jnp.asarray(x)))
        x = np.asarray(x)
        lam = self.l1_ratio
        active = x != 0
        r_active = np.abs(gr[active] + lam * np.sign(x[active]))
        r_zero = np.maximum(np.abs(gr[~active]) - lam, 0.0)
        vals = np.concatenate([r_active, r_zero])
        return float(vals.max()) if vals.size else 0.0


# Params-style callables: p = (A, y, lam).
def _logistic_f_p(x, p):
    A, y, lam = p
    margins = y * _DOT(A, x)
    return jnp.reshape(jnp.mean(jax.nn.softplus(-margins)), (1,))


def _logistic_jac_p(x, p):
    A, y, lam = p
    margins = y * _DOT(A, x)
    coef = -jax.nn.sigmoid(-margins) * y / A.shape[0]
    return jnp.reshape(_DOT(A.T, coef), (1, -1))


def _logistic_g_p(x, p):
    lam = p[2]
    return jnp.reshape(lam * jnp.sum(jnp.abs(x)), (1,))


def _logistic_prox_p(w, x, p):
    lam = p[2]
    w = w[0] if getattr(w, "ndim", 0) else w
    return soft_threshold(x, w * lam)

r"""LASSO / elastic-net: the framework's flagship (north-star) workload.

``min_x ||A x - b||² + λ‖x‖₁ (+ (μ/2)‖x‖²)`` with dense ``A (m, n)``.  The
reference exercises this shape only in its unit tests
(reference: tests/test_proximal_gradient.py:43-114); here it is a first-class
model because BASELINE.json's north-star metric is LASSO n=10k wall-time and
the sharded target is n=1M (configs[0], [4]).

TPU mapping:

* ``f``/``jac_f`` are two dense matvecs — MXU work when batched (the
  scenario batch turns ``A @ x`` into ``A @ X.T``, a true matmul).
* ``prox`` is closed-form soft-thresholding — fused by XLA into the
  gradient step (measured optimal: the hand Pallas kernel in
  :mod:`zfista_tpu.ops.fused` never beat XLA's fusion and is retired to
  experimental; BENCHMARKS.md "Pallas kernel decision").
* For n beyond one chip's HBM, lay out ``A`` as ``P(None, "model")`` and
  ``x`` as ``P("model")`` on a mesh (:mod:`zfista_tpu.parallel.sharding`):
  ``A @ x`` = local partial matvec + psum, ``Aᵀ r`` local — XLA inserts the
  collectives from the shardings.

The Lipschitz constant of ``∇f`` is ``2·λ_max(AᵀA)``, estimated here by
power iteration (matvec-only, so it works sharded at n=1M where forming
the n×n Gram is impossible).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from zfista_tpu._typing import Array
from zfista_tpu.core.solver import minimize_proximal_gradient
from zfista_tpu.models.base import Problem
from zfista_tpu.ops.precision import matmul_hp
from zfista_tpu.ops.prox import soft_threshold

# Exact f32 products: under vmap these matvecs become MXU matmuls whose TPU
# default precision is bf16 — the resulting gradient noise floors the
# solver at ~1e-3.  Bandwidth-bound either way; HIGHEST measured at-or-
# faster than DEFAULT on v5e (BENCHMARKS.md).
_DOT = matmul_hp


def _as_float(A) -> Array:
    """Float-dtype operand: an integer A would truncate the lambda/mu
    scalars packed with it into the params tuple (e.g.
    ``jnp.asarray(0.01, int32) == 0`` — a silently unregularized solve)."""
    A = jnp.asarray(A)
    if not jnp.issubdtype(A.dtype, jnp.floating):
        A = A.astype(jnp.zeros(0).dtype)
    return A


@partial(jax.jit, static_argnames=("n_iter",))
def operator_norm_sq(A: Array, n_iter: int = 50, seed: int = 0) -> Array:
    """λ_max(AᵀA) by power iteration on v ↦ Aᵀ(A v) (matvec-only)."""
    n = A.shape[1]
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (n,), A.dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def body(_, v):
        w = _DOT(A.T, _DOT(A, v))
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = lax.fori_loop(0, n_iter, body, v0)
    w = _DOT(A.T, _DOT(A, v))
    return jnp.dot(v, w)


class Lasso(Problem):
    r"""``F(x) = ||A x - b||² + λ‖x‖₁ + (μ/2)‖x‖²`` (elastic net for μ>0).

    Matches the reference's test formulation ``f = ||Ax-b||²`` (no 1/2 —
    reference tests/test_proximal_gradient.py:49-50,79-80), so ``∇f =
    2 Aᵀ(Ax−b)`` and ``L = 2 λ_max(AᵀA)``.
    """

    def __init__(self, A, b, l1_ratio: float, l2_ratio: float = 0.0) -> None:
        self.A = _as_float(A)
        self.b = jnp.asarray(b, self.A.dtype)
        self.l1_ratio = float(l1_ratio)
        self.l2_ratio = float(l2_ratio)
        super().__init__(
            n_features=self.A.shape[1],
            n_objectives=1,
            l1_ratios=[l1_ratio],
        )

    def f(self, x: Array) -> Array:
        r = _DOT(self.A, x) - self.b
        val = jnp.dot(r, r)
        if self.l2_ratio:
            val = val + 0.5 * self.l2_ratio * jnp.dot(x, x)
        return jnp.reshape(val, (1,))

    def jac_f(self, x: Array) -> Array:
        grad = 2 * _DOT(self.A.T, _DOT(self.A, x) - self.b)
        if self.l2_ratio:
            grad = grad + self.l2_ratio * x
        return jnp.reshape(grad, (1, -1))

    def g(self, x: Array) -> Array:
        return jnp.reshape(self.l1_ratio * jnp.sum(jnp.abs(x)), (1,))

    def prox_wsum_g(self, weight, x: Array) -> Array:
        return soft_threshold(x, jnp.asarray(weight) * self.l1_ratio)

    def lipschitz(self, n_iter: int = 50) -> float:
        """``L = 2 λ_max(AᵀA) (+ μ)`` — use ``lr = 1/L`` with
        ``decay_rate=1`` for the fixed-step fast path."""
        return float(2 * operator_norm_sq(self.A, n_iter) + self.l2_ratio)

    def solve_fixed_step(self, x0, **kwargs):
        """Fixed-step FISTA at ``lr = 1/L`` (no backtracking) — the
        bandwidth-bound hot path the bench measures.

        ``A``/``b``/``lambda``/``mu`` ride through the solver's ``params``
        argument, so the operator streams into the compiled program instead
        of being embedded as a constant (3x at n=10k), and repeat solves
        (any ``A`` of the same shape) reuse one compiled driver.

        .. warning:: The instance is FROZEN after the first call: the
           params tuple and ``1/L`` are cached, so later mutation of
           ``A``/``b``/``l1_ratio``/``l2_ratio`` attributes is silently
           ignored.  Build a new instance per problem (cheap — the
           compiled program is shared across instances of one shape).
        """
        if "lr" not in kwargs:
            # Cache 1/L: the 50-matvec power iteration is the dominant
            # per-call cost for repeat solves on a fixed operator.
            lr = getattr(self, "_lr_cache", None)
            if lr is None:
                lr = self._lr_cache = 1.0 / self.lipschitz()
            kwargs["lr"] = lr
        kwargs.setdefault("decay_rate", 1)
        kwargs.setdefault("nesterov", True)
        p = getattr(self, "_params_cache", None)
        if p is None:
            # Built once: a fresh scalar jnp.asarray per solve costs one
            # host->device transfer each (RTT-priced on remote backends).
            dt = self.A.dtype
            p = (self.A, self.b, jnp.asarray(self.l1_ratio, dt))
            if self.l2_ratio:
                p = p + (jnp.asarray(self.l2_ratio, dt),)
            self._params_cache = p
        return minimize_proximal_gradient(
            _lasso_f_p, _lasso_g_p, _lasso_jac_p, _lasso_prox_p, x0,
            params=p, **kwargs
        )


# Module-level params-style callables for Lasso.solve_fixed_step: stable
# function identities (the solver's compiled-driver cache keys on them) with
# all operand data — A, b, lambda (and mu for elastic net) — in the params
# pytree ``p = (A, b, lam[, l2])``, traced as program arguments.  The tuple
# LENGTH is static (part of the jit key), so pure-LASSO solves omit l2 and
# pay nothing for the elastic-net terms (a traced 0.0 could not be folded).
def _lasso_f_p(x, p):
    A, b, lam = p[:3]
    r = _DOT(A, x) - b
    val = jnp.dot(r, r)
    if len(p) > 3:
        val = val + 0.5 * p[3] * jnp.dot(x, x)
    return jnp.reshape(val, (1,))


def _lasso_jac_p(x, p):
    A, b, lam = p[:3]
    grad = 2 * _DOT(A.T, _DOT(A, x) - b)
    if len(p) > 3:
        grad = grad + p[3] * x
    return jnp.reshape(grad, (1, -1))


def _lasso_g_p(x, p):
    lam = p[2]
    return jnp.reshape(lam * jnp.sum(jnp.abs(x)), (1,))


def _lasso_prox_p(w, x, p):
    lam = p[2]
    w = w[0] if getattr(w, "ndim", 0) else w
    return soft_threshold(x, w * lam)


def make_lasso_lambda_sweep(A, b, l2_ratio: float = 0.0):
    """Problem callables parameterized by per-lane λ for
    :func:`zfista_tpu.parallel.batch.minimize_proximal_gradient_batch`
    (BASELINE configs[2]: 1k-λ elastic-net sweep as one vmapped program).

    ``l2_ratio`` (μ, shared across lanes) adds the elastic-net term
    ``(μ/2)‖x‖²`` with the same convention as :class:`Lasso`; the default
    0 is the pure-LASSO sweep.  Returns ``(f, g, jac_f, prox)`` each
    taking the λ parameter last.
    """
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    mu = float(l2_ratio)

    def f(x, lam):
        r = _DOT(A, x) - b
        val = jnp.dot(r, r)
        if mu:
            val = val + 0.5 * mu * jnp.dot(x, x)
        return jnp.reshape(val, (1,))

    def jac_f(x, lam):
        grad = 2 * _DOT(A.T, _DOT(A, x) - b)
        if mu:
            grad = grad + mu * x
        return jnp.reshape(grad, (1, -1))

    def g(x, lam):
        return jnp.reshape(lam * jnp.sum(jnp.abs(x)), (1,))

    def prox(weight, x, lam):
        w = weight[0] if getattr(weight, "ndim", 0) else weight
        return soft_threshold(x, w * lam)

    return f, g, jac_f, prox


def fista_step_dense(A: Array, b: Array, lam: Array, lr: Array, carry):
    """One fixed-step FISTA iteration on dense LASSO, written as a pure
    function ``carry=(x, y, t) -> carry`` — the jittable forward step used by
    ``__graft_entry__.entry`` and the Pallas-vs-XLA kernel benchmarks.
    """
    x, y, t = carry
    grad = 2 * _DOT(A.T, _DOT(A, y) - b)
    x_new = soft_threshold(y - lr * grad, lr * lam)
    t_new = jnp.sqrt(t * t + 0.25) + 0.5
    y_new = x_new + ((t - 1) / t_new) * (x_new - x)
    return x_new, y_new, t_new


class GroupLasso(Problem):
    r"""``F(x) = ||A x - b||^2 + lam * sum_g ||x_g||_2`` with contiguous
    equal-size feature groups (block soft-threshold prox).

    The reference has no group-lasso problem; this is the grouped-sparsity
    workload of the build targets (group-lasso sweep, BASELINE configs[2]),
    built on :func:`zfista_tpu.ops.prox.prox_group_lasso`.
    """

    def __init__(self, A, b, l1_ratio: float, group_size: int) -> None:
        self.A = _as_float(A)
        self.b = jnp.asarray(b, self.A.dtype)
        self.l1_ratio = float(l1_ratio)
        self.group_size = int(group_size)
        if self.A.shape[1] % self.group_size:
            raise ValueError("n_features must divide by group_size")
        super().__init__(n_features=self.A.shape[1], n_objectives=1)

    def f(self, x: Array) -> Array:
        r = _DOT(self.A, x) - self.b
        return jnp.reshape(jnp.dot(r, r), (1,))

    def jac_f(self, x: Array) -> Array:
        return jnp.reshape(2 * _DOT(self.A.T, _DOT(self.A, x) - self.b), (1, -1))

    def g(self, x: Array) -> Array:
        v = x.reshape(-1, self.group_size)
        return jnp.reshape(
            self.l1_ratio * jnp.sum(jnp.sqrt(jnp.sum(v * v, axis=-1))), (1,)
        )

    def prox_wsum_g(self, weight, x: Array) -> Array:
        from zfista_tpu.ops.prox import prox_group_lasso

        return prox_group_lasso(
            x, jnp.asarray(weight) * self.l1_ratio, self.group_size
        )

    def lipschitz(self, n_iter: int = 50) -> float:
        return float(2 * operator_norm_sq(self.A, n_iter))


def make_group_lasso_lambda_sweep(A, b, group_size: int):
    """Per-lane-lambda group-lasso callables for the batched driver
    (the group-lasso half of the sweep config; block soft-threshold prox).

    Returns ``(f, g, jac_f, prox)``, each taking the lambda last.
    """
    from zfista_tpu.ops.prox import prox_group_lasso

    A = jnp.asarray(A)
    b = jnp.asarray(b)
    gs = int(group_size)
    if A.shape[1] % gs:
        raise ValueError("n_features must divide by group_size")

    def f(x, lam):
        r = _DOT(A, x) - b
        return jnp.reshape(jnp.dot(r, r), (1,))

    def jac_f(x, lam):
        return jnp.reshape(2 * _DOT(A.T, _DOT(A, x) - b), (1, -1))

    def g(x, lam):
        v = x.reshape(-1, gs)
        return jnp.reshape(lam * jnp.sum(jnp.sqrt(jnp.sum(v * v, axis=-1))), (1,))

    def prox(weight, x, lam):
        w = weight[0] if getattr(weight, "ndim", 0) else weight
        return prox_group_lasso(x, w * lam, gs)

    return f, g, jac_f, prox

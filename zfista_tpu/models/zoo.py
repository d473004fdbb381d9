r"""The seven-problem benchmark zoo, written as pure jnp programs.

Formulas follow the published test problems (citations below); behavior
matches the reference implementations (zfista/problems.py:153-578), including
default sizes and box bounds.  All ``f``/``jac_f`` are fully vectorized —
no Python loops, no data-dependent shapes — so they jit, vmap and shard.
Analytic Jacobians are provided (and tested against autodiff).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from zfista_tpu._typing import Array
from zfista_tpu.models.base import Problem
from zfista_tpu.ops.precision import dot_hp

# Exact products: under vmap these contractions lower to MXU matmuls whose
# TPU default precision is bf16, which floors the solver's convergence
# (shared policy helper: zfista_tpu.ops.precision).
_dot = dot_hp

_SQRT2 = math.sqrt(2.0)


class JOS1(Problem):
    r"""Two convex quadratics: f1 = ||x||^2/n, f2 = ||x-2||^2/n.

    Jin, Olhofer & Sendhoff (GECCO'01).  Reference: zfista/problems.py:153-205.
    Default n_features=5.
    """

    def __init__(
        self,
        n_features: int = 5,
        l1_ratios: Sequence[float] | None = None,
        l1_shifts: Sequence[float] | None = None,
        bounds: tuple[Any, Any] | None = None,
    ) -> None:
        super().__init__(n_features, 2, l1_ratios, l1_shifts, bounds)

    def f(self, x: Array) -> Array:
        n = self.n_features
        return jnp.stack([_dot(x, x) / n, _dot(x - 2, x - 2) / n])

    def jac_f(self, x: Array) -> Array:
        n = self.n_features
        return jnp.stack([2 * x / n, 2 * (x - 2) / n])


class SD(Problem):
    r"""Linear + reciprocal bi-objective (Stadler & Dauer 1992), n=4,
    bounds (1e-6, inf).  Reference: zfista/problems.py:208-264.

    The sqrt(2) constants are kept as host float64 and cast to the
    iterate's dtype at call time — a class-level jnp.array would freeze
    them to float32 at import (before any x64 enable), silently breaking
    float64 reference parity by ~1e-7.
    """

    _C1 = np.array([2.0, _SQRT2, _SQRT2, 1.0])
    _C2 = np.array([2.0, 2 * _SQRT2, 2 * _SQRT2, 2.0])

    def __init__(self) -> None:
        super().__init__(4, 2, bounds=(1e-6, jnp.inf))

    def f(self, x: Array) -> Array:
        c1 = jnp.asarray(self._C1, x.dtype)
        c2 = jnp.asarray(self._C2, x.dtype)
        return jnp.stack([_dot(c1, x), jnp.sum(c2 / x)])

    def jac_f(self, x: Array) -> Array:
        c1 = jnp.asarray(self._C1, x.dtype)
        c2 = jnp.asarray(self._C2, x.dtype)
        return jnp.stack([c1, -c2 / x**2])


class FDS(Problem):
    r"""Three objectives: quartic / exp+quadratic / weighted negative-exp
    (Fliege, Grana Drummond & Svaiter, SIAM J. Optim. 2009), default n=10.
    Reference: zfista/problems.py:267-328.
    """

    def __init__(
        self,
        n_features: int = 10,
        l1_ratios: Sequence[float] | None = None,
        l1_shifts: Sequence[float] | None = None,
        bounds: tuple[Any, Any] | None = None,
    ) -> None:
        super().__init__(n_features, 3, l1_ratios, l1_shifts, bounds)
        n = n_features
        self._k = jnp.arange(1, n + 1)
        # k * (n - k + 1), the triangular convolution weights of f3
        self._conv = self._k * self._k[::-1]

    def f(self, x: Array) -> Array:
        n = self.n_features
        k = self._k.astype(x.dtype)
        f1 = _dot(k, (x - k) ** 4) / n**2
        f2 = jnp.exp(jnp.sum(x) / n) + _dot(x, x)
        f3 = _dot(self._conv.astype(x.dtype), jnp.exp(-x)) / (n * (n + 1))
        return jnp.stack([f1, f2, f3])

    def jac_f(self, x: Array) -> Array:
        n = self.n_features
        k = self._k.astype(x.dtype)
        j1 = 4 / n**2 * k * (x - k) ** 3
        j2 = jnp.exp(jnp.sum(x) / n) / n + 2 * x
        j3 = -self._conv.astype(x.dtype) * jnp.exp(-x) / (n * (n + 1))
        return jnp.stack([j1, j2, j3])


class ZDT1(Problem):
    r"""Classic ZDT1 with sqrt coupling (Zitzler, Deb & Thiele 2000),
    default n=30, bounds (1e-6, inf).  Reference: zfista/problems.py:331-386.
    """

    def __init__(self, n_features: int = 30) -> None:
        super().__init__(n_features, 2, bounds=(1e-6, jnp.inf))

    def f(self, x: Array) -> Array:
        n = self.n_features
        f1 = x[0]
        h = 1 + 9 / (n - 1) * jnp.sum(x[1:])
        f2 = h * (1 - jnp.sqrt(f1 / h))
        return jnp.stack([f1, f2])

    def jac_f(self, x: Array) -> Array:
        n = self.n_features
        h = 1 + 9 / (n - 1) * jnp.sum(x[1:])
        e0 = jnp.zeros(n, x.dtype).at[0].set(1.0)
        tail = 9 * (2 - jnp.sqrt(x[0] / h)) / (2 * (n - 1))
        j2 = jnp.full(n, tail, x.dtype).at[0].set(-jnp.sqrt(h / x[0]) / 2)
        return jnp.stack([e0, j2])


class TOI4(Problem):
    r"""Partially separable quadratics (Toint 1983, problem 4), n=4.
    Reference: zfista/problems.py:389-448.
    """

    def __init__(
        self,
        l1_ratios: Sequence[float] | None = None,
        l1_shifts: Sequence[float] | None = None,
        bounds: tuple[Any, Any] | None = None,
    ) -> None:
        super().__init__(4, 2, l1_ratios, l1_shifts, bounds)

    def f(self, x: Array) -> Array:
        f1 = x[0] ** 2 + x[1] ** 2 + 1
        f2 = 0.5 * ((x[0] - x[1]) ** 2 + (x[2] - x[3]) ** 2) + 1
        return jnp.stack([f1, f2])

    def jac_f(self, x: Array) -> Array:
        z = jnp.zeros((), x.dtype)
        j1 = jnp.stack([2 * x[0], 2 * x[1], z, z])
        d01 = x[0] - x[1]
        d23 = x[2] - x[3]
        j2 = jnp.stack([d01, -d01, d23, -d23])
        return jnp.stack([j1, j2])


class TRIDIA(Problem):
    r"""Tridiagonal quadratics (Toint 1983), n=3, m=3.
    Reference: zfista/problems.py:451-514.
    """

    def __init__(
        self,
        l1_ratios: Sequence[float] | None = None,
        l1_shifts: Sequence[float] | None = None,
        bounds: tuple[Any, Any] | None = None,
    ) -> None:
        super().__init__(3, 3, l1_ratios, l1_shifts, bounds)

    def f(self, x: Array) -> Array:
        return jnp.stack(
            [
                (2 * x[0] - 1) ** 2,
                2 * (2 * x[0] - x[1]) ** 2,
                3 * (2 * x[1] - x[2]) ** 2,
            ]
        )

    def jac_f(self, x: Array) -> Array:
        z = jnp.zeros((), x.dtype)
        return jnp.stack(
            [
                jnp.stack([8 * x[0] - 4, z, z]),
                jnp.stack([16 * x[0] - 8 * x[1], 4 * x[1] - 8 * x[0], z]),
                jnp.stack([z, 24 * x[1] - 12 * x[2], 6 * x[2] - 12 * x[1]]),
            ]
        )


class LinearFunctionRank1(Problem):
    r"""Rank-one squared-linear objectives f_i = (i * <k, x> - 1)^2
    (More, Garbow & Hillstrom 1981), defaults n=10, m=4.
    Reference: zfista/problems.py:517-578.
    """

    def __init__(
        self,
        n_features: int = 10,
        n_objectives: int = 4,
        l1_ratios: Sequence[float] | None = None,
        l1_shifts: Sequence[float] | None = None,
        bounds: tuple[Any, Any] | None = None,
    ) -> None:
        super().__init__(n_features, n_objectives, l1_ratios, l1_shifts, bounds)
        self._i = jnp.arange(1, n_objectives + 1)
        self._j = jnp.arange(1, n_features + 1)

    def f(self, x: Array) -> Array:
        i = self._i.astype(x.dtype)
        j = self._j.astype(x.dtype)
        return (i * _dot(j, x) - 1) ** 2

    def jac_f(self, x: Array) -> Array:
        i = self._i.astype(x.dtype)
        j = self._j.astype(x.dtype)
        r = i * _dot(j, x) - 1  # (m,)
        return 2 * (i * r)[:, None] * j[None, :]

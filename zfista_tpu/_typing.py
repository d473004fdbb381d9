"""Shared type aliases for zfista_tpu.

TPU-native rebuild of the aliases in the reference library
(reference: zfista/_typing.py:16-21), generalized to JAX arrays.
"""

from __future__ import annotations

from typing import Any, Callable, Union

import jax
import numpy as np

Array = jax.Array
ArrayLike = Union[jax.Array, np.ndarray, float, int]
Scalar = Union[float, Array]

# f(x) -> (m,) objective values (scalar objectives are normalized to shape (1,)).
ObjectiveFn = Callable[[Array], Array]
# jac_f(x) -> (m, n) Jacobian.
JacobianFn = Callable[[Array], Array]
# prox_wsum_g(weight, x) -> (n,); `weight` is lr (scalar, m==1) or lr*w ((m,), m>1).
ProxFn = Callable[[Any, Array], Array]

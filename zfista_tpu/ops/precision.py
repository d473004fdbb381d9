"""Full-precision product helpers — THE precision policy, in one place.

TPU default matmul/dot precision for f32 operands is bf16.  On this
framework's solve paths that is not a small error: under ``vmap``,
per-lane matvecs lower to MXU matmuls whose bf16 gradient noise floors
the solver's ``||x - y||_inf`` criterion at ~1e-3 — NOTHING converges and
there is no error (DESIGN.md precision policy; measured in
BENCHMARKS.md).  Every product that feeds an iterate, a gradient, or an
accept/convergence decision must therefore run at
``lax.Precision.HIGHEST``; the hot shapes are bandwidth-bound, so full
precision was measured at-or-faster than the default.

These helpers existed as five private per-module copies (``_DOT``,
``_dot``, ``_VDOT``, inline ``precision=`` kwargs); new model code should
import from here so the policy cannot silently regress.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
from jax import lax

#: ``jnp.dot`` at full precision (vector-vector / matrix-vector).
dot_hp = partial(jnp.dot, precision=lax.Precision.HIGHEST)

#: ``jnp.matmul`` at full precision (matrix-matrix / batched).
matmul_hp = partial(jnp.matmul, precision=lax.Precision.HIGHEST)

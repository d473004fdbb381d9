r"""Pallas TPU kernels for the solver's bandwidth-bound hot path.

One FISTA iteration on LASSO-like problems splits into

1. two dense matvecs (``A @ y``, ``Aᵀ r``) — MXU work, left to XLA/GSPMD
   (a hand kernel cannot beat reading ``A`` once per matvec, which XLA
   already achieves; batched solves become true matmuls), and
2. an elementwise chain over ``n``-vectors: gradient step, soft-threshold,
   momentum extrapolation — **HBM-bandwidth-bound**.

The fused kernel here (:func:`fused_prox_momentum`) performs the entire
elementwise chain in a single pass: 3 reads (``y, grad, x``) + 2 writes
(``x⁺, y⁺``) per element, the roofline minimum.  Unfused, the same chain is
7 reads + 3 writes (z, x⁺ as separate kernels); XLA usually fuses most of
it, so both paths were benchmarked against each other — the kernel had to
win at the roofline to justify itself (SURVEY.md §7 step 5).

**STATUS: EXPERIMENTAL — retired from the dispatch path, with evidence.**
The measured v5e sweep (``python -m zfista_tpu.bench.kernels``, table in
BENCHMARKS.md "Pallas kernel decision") shows XLA's own fusion is at
parity over n=1e4..1e6 (Pallas/XLA ratio 0.92-1.02, within noise) and
4.5x FASTER at n=1e7 (XLA pipelines the streaming chain better than this
single-axis blocked kernel).  An elementwise chain is exactly what the
XLA fusion pass is built for; there is no headroom for a hand kernel.
Nothing in the solver dispatches these kernels; they remain here as the
framework's Pallas layer — tested for bit-parity (tests/test_fused.py)
and ready for ops XLA *cannot* fuse (e.g. data-dependent scatter proxes),
none of which this workload family has needed.

All kernels are shape-static and pad to the (8, 128) f32 tile.  Only
``fused_prox_momentum_auto`` falls back to pure-jnp on non-TPU backends;
the raw kernels (``fused_prox_momentum``, ``fista_step_dense_pallas``)
require a TPU unless called with ``interpret=True`` (how the tests run
the Pallas path for bit-parity on CPU) — on other backends they fail in
Pallas lowering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from zfista_tpu._typing import Array
from zfista_tpu.ops.prox import soft_threshold

_LANE = 128
_SUBLANE = 8
_TILE = _LANE * _SUBLANE  # minimum f32 tile, flattened


def _pad_rows(v: Array) -> tuple[Array, int]:
    """Reshape a 1-D vector to (rows, 128) rows padded to a sublane multiple."""
    n = v.shape[0]
    rows = -(-n // _LANE)
    rows_pad = -(-rows // _SUBLANE) * _SUBLANE
    padded = jnp.zeros((rows_pad * _LANE,), v.dtype).at[:n].set(v)
    return padded.reshape(rows_pad, _LANE), n


def _prox_momentum_kernel(y_ref, grad_ref, x_ref, scal_ref, xo_ref, yo_ref):
    """z = y - lr*grad; x+ = soft(z, lr*lam); y+ = x+ + gamma*(x+ - x)."""
    lr = scal_ref[0]
    thresh = scal_ref[1]
    gamma = scal_ref[2]
    z = y_ref[:] - lr * grad_ref[:]
    x_new = soft_threshold(z, thresh)  # the canonical op (bit-parity-tested)
    xo_ref[:] = x_new
    yo_ref[:] = x_new + gamma * (x_new - x_ref[:])


def _have_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("interpret",))
def fused_prox_momentum(
    y: Array,
    grad: Array,
    x: Array,
    lr,
    thresh,
    gamma,
    interpret: bool = False,
) -> tuple[Array, Array]:
    r"""Fused gradient-step + soft-threshold + momentum, one HBM pass.

    Returns ``(x_new, y_new)`` with
    ``x_new = soft(y - lr*grad, thresh)`` and
    ``y_new = x_new + gamma * (x_new - x)``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = y.dtype
    y2, n = _pad_rows(y)
    g2, _ = _pad_rows(grad)
    x2, _ = _pad_rows(x)
    scal = jnp.stack(
        [jnp.asarray(lr, dtype), jnp.asarray(thresh, dtype), jnp.asarray(gamma, dtype)]
    )
    rows = y2.shape[0]
    blk = min(rows, 512)
    grid = (-(-rows // blk),)
    spec = pl.BlockSpec((blk, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    xo, yo = pl.pallas_call(
        _prox_momentum_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, _LANE), dtype),
            jax.ShapeDtypeStruct((rows, _LANE), dtype),
        ),
        grid=grid,
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(spec, spec),
        interpret=interpret,
    )(y2, g2, x2, scal)
    return xo.reshape(-1)[:n], yo.reshape(-1)[:n]


def fused_prox_momentum_xla(y, grad, x, lr, thresh, gamma):
    """Pure-jnp reference of the fused kernel (XLA's own fusion)."""
    x_new = soft_threshold(y - lr * grad, thresh)
    return x_new, x_new + gamma * (x_new - x)


def fused_prox_momentum_auto(y, grad, x, lr, thresh, gamma):
    """Pallas kernel on TPU, jnp fallback elsewhere.  EXPERIMENTAL: the
    solver does not call this — the measured sweep (module header,
    BENCHMARKS.md) showed XLA's own fusion at-or-above parity."""
    if _have_tpu():
        return fused_prox_momentum(y, grad, x, lr, thresh, gamma)
    return fused_prox_momentum_xla(y, grad, x, lr, thresh, gamma)


def fista_step_dense_pallas(A, b, lam, lr, carry, interpret: bool = False):
    """One dense-LASSO FISTA step: XLA matvecs + the Pallas fused
    elementwise chain.  Drop-in for
    :func:`zfista_tpu.models.lasso.fista_step_dense` — same full-precision
    matvecs (bf16-default products diverge; see the precision policy in
    models/lasso.py)."""
    from zfista_tpu.models.lasso import _DOT

    x, y, t = carry
    grad = 2 * _DOT(A.T, _DOT(A, y) - b)
    t_new = jnp.sqrt(t * t + 0.25) + 0.5
    gamma = (t - 1) / t_new
    x_new, y_new = fused_prox_momentum(
        y, grad, x, lr, lr * lam, gamma, interpret=interpret
    )
    return x_new, y_new, t_new

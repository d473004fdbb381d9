r"""Total-variation seminorm and its prox as one jittable XLA program.

BASELINE configs[1] names the flagship imaging workload "TV-regularized
image deblurring"; the reference notebook (examples/cameraman.ipynb)
actually solves the wavelet-L1 formulation because its scipy-based solver
has no TV prox — TV's prox has no closed form.  Here the prox is computed
by FGP (fast gradient projection: FISTA on the dual of the denoising
problem, Beck & Teboulle, IEEE TIP 2009) with a FIXED iteration budget
inside ``lax.fori_loop``: static shapes, no data-dependent control flow,
so the whole prox vmaps over scenario batches and nests inside the outer
solver's compiled step like any closed-form prox.

Discretization: forward differences with Neumann (replicate) boundaries.
The dual field is carried as two dense ``(H, W)`` arrays whose last
row/column are structurally zero — padded static shapes instead of the
papers' ragged ``(H-1, W)``/``(H, W-1)`` pair, so every op is a full-array
vector op on the VPU (no gather/scatter, no dynamic slicing).

``prox_tv`` is INEXACT (a fixed number of dual iterations), like every
practical TV prox; ``n_iter=50`` gives ~1e-6 relative primal-dual gap on
256x256 denoising at typical deblurring strengths (tests assert both the
gap and exactness against a direct 1-D oracle on separable inputs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from zfista_tpu._typing import Array


def _grad2d(u: Array) -> tuple[Array, Array]:
    """Forward differences, zero-padded to ``u.shape`` (Neumann boundary:
    the last row/column of each component is identically zero)."""
    px = jnp.zeros_like(u).at[:-1, :].set(u[1:, :] - u[:-1, :])
    py = jnp.zeros_like(u).at[:, :-1].set(u[:, 1:] - u[:, :-1])
    return px, py


def _div2d(p: Array, q: Array) -> Array:
    """Negative adjoint of :func:`_grad2d` on the padded representation:
    ``<grad u, (p,q)> = <u, -div(p,q)>`` exactly (the structural zeros in
    the last row/column make the padded sum telescope correctly)."""
    dx = p.at[1:, :].add(-p[:-1, :])
    dy = q.at[:, 1:].add(-q[:, :-1])
    return dx + dy


def tv2d(u: Array, isotropic: bool = True) -> Array:
    """Discrete total variation of a 2-D array (scalar).

    Isotropic (default): ``sum_ij sqrt(dx_ij^2 + dy_ij^2)``; anisotropic:
    ``sum |dx| + |dy|``.  Matches the discretization of :func:`prox_tv`.
    """
    px, py = _grad2d(u)
    if isotropic:
        return jnp.sum(jnp.sqrt(px * px + py * py))
    return jnp.sum(jnp.abs(px)) + jnp.sum(jnp.abs(py))


@partial(
    jax.jit, static_argnames=("n_iter", "isotropic", "return_dual", "method")
)
def prox_tv(
    lam: Array,
    v: Array,
    n_iter: int = 50,
    isotropic: bool = True,
    return_dual: bool = False,
    dual0: tuple[Array, Array] | None = None,
    method: str = "auto",
) -> Array | tuple[Array, tuple[Array, Array]]:
    r"""Prox of ``lam * TV``: ``argmin_u 0.5 ||u - v||^2 + lam TV(u)``.

    FGP: FISTA on the dual
    ``max_{||(p,q)||<=1} -0.5 ||lam * div(p,q) - v||^2`` with the fixed
    dual step ``1/(8 lam)`` (8 bounds the squared norm of the 2-D forward
    difference operator).  ``lam`` may be a traced scalar (it is
    ``lr * w * strength`` when called from the solver); ``lam <= 0``
    returns ``v`` exactly.

    The constraint set is the pointwise unit ball — L2 across the two
    components when ``isotropic`` (prox of the group-L2 TV), else the
    unit box (prox of the L1 TV).

    ``dual0`` warm-starts the dual field (e.g. the previous outer
    iteration's dual in a deblurring loop, where consecutive proxes see
    nearly identical inputs): FGP restarts its momentum but resumes from
    the given feasible point, typically reaching a given gap in a small
    fraction of the cold-start budget.

    ``method="pallas"`` runs the dual loop as a single Pallas TPU kernel
    with every field VMEM-resident across all ``n_iter`` iterations
    (:mod:`zfista_tpu.ops.tv_pallas`) — the XLA ``fori_loop`` round-trips
    the carry through HBM each iteration.  Images past the all-VMEM
    budget (~512x512 float32) use the temporally-blocked strip-sweep
    kernel instead (haloed row strips streamed through VMEM,
    :func:`zfista_tpu.ops.tv_pallas.fgp_pallas_strips`); shapes with no
    admissible strip blocking (``strip_rows`` returns ``None``) and
    non-TPU backends fall back to the XLA loop.  ``method="auto"`` (the
    default) IS that dispatch rule spelled out: the best kernel wherever
    one applies, XLA everywhere else — it is the default because the
    kernels are measured faster on TPU at every size they cover
    (1.06-1.21x cold, 1.15x nested in ``TVDeblur.solve_warm`` under the
    wall; 1.42x/1.52x at 1024^2/2048^2 past it;
    BENCHMARKS.md "TV prox kernel on device").  ``method="xla"`` forces
    the XLA loop everywhere (bitwise-reproducible across backends).
    ``method="pallas_interpret"`` forces the kernel through the Pallas
    interpreter on any backend — the CPU test/debug path (orders of
    magnitude slower than XLA; never use it for real work).  Same math,
    NOT bitwise (different FMA scheduling); parity is pinned to ~1e-6 by
    tests.
    """
    lam = jnp.asarray(lam, v.dtype)
    if method not in ("auto", "xla", "pallas", "pallas_interpret"):
        raise ValueError(
            "method must be 'auto', 'xla', 'pallas' or 'pallas_interpret';"
            f" got {method!r}"
        )
    if method == "auto":
        method = "pallas"
    interpret = method == "pallas_interpret"
    use_kernel = interpret or (
        method == "pallas" and jax.default_backend() == "tpu"
    )
    if use_kernel:
        from zfista_tpu.ops import tv_pallas

        # The VMEM budget gates only the REAL kernel; the interpreter has
        # no VMEM and must run the kernel at any size (a capacity fallback
        # here would make large-shape parity tests compare XLA to itself).
        if interpret or tv_pallas.fits_vmem(v.shape, v.dtype):
            kernel_fn = tv_pallas.fgp_pallas
        elif (S := tv_pallas.strip_rows(v.shape, v.dtype)) is not None:
            # Past the all-VMEM wall: temporally-blocked strip sweeps
            # stream the image through VMEM (measured 1.42x/1.52x over
            # the XLA loop at 1024^2/2048^2 — BENCHMARKS.md).  The
            # double-buffered variant overlaps the next strip's input DMA
            # with compute (bitwise-identical on chip, +4-5% at 2048^2);
            # dispatch it unless its 5 extra prefetch tiles would shrink
            # the strip height and with it the halo-redundancy trade.
            pipe = tv_pallas.strip_rows(v.shape, v.dtype, pipelined=True)
            kernel_fn = partial(
                tv_pallas.fgp_pallas_strips, pipelined=pipe == S
            )
        else:
            kernel_fn = None  # no admissible blocking -> XLA loop
        if kernel_fn is not None:
            if dual0 is None:
                p00 = q00 = jnp.zeros_like(v)
            else:
                p00, q00 = dual0
            u_k, p_k, q_k = kernel_fn(
                lam,
                v,
                p00,
                q00,
                n_iter=n_iter,
                isotropic=isotropic,
                interpret=interpret,
            )
            u_k = jnp.where(lam > 0, u_k, v)
            if return_dual:
                return u_k, (p_k, q_k)
            return u_k
        # falls through: too large for any VMEM residency -> XLA loop
    safe = jnp.maximum(lam, jnp.asarray(jnp.finfo(v.dtype).tiny, v.dtype))
    step = 1.0 / (8.0 * safe)

    def project(p: Array, q: Array) -> tuple[Array, Array]:
        if isotropic:
            denom = jnp.maximum(1.0, jnp.sqrt(p * p + q * q))
            return p / denom, q / denom
        return jnp.clip(p, -1.0, 1.0), jnp.clip(q, -1.0, 1.0)

    def body(_, carry):
        p, q, r, s, t = carry
        # Descent on h(z) = 0.5||v - lam*div z||^2: with div^T = -grad on
        # the padded representation, grad h = +lam*grad(v - lam*div z).
        gx, gy = _grad2d(v - lam * _div2d(r, s))
        p_new, q_new = project(r - step * gx, s - step * gy)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        gamma = (t - 1.0) / t_new
        r_new = p_new + gamma * (p_new - p)
        s_new = q_new + gamma * (q_new - q)
        return p_new, q_new, r_new, s_new, t_new

    if dual0 is None:
        p0 = q0 = jnp.zeros_like(v)
    else:
        p0, q0 = dual0
    one = jnp.asarray(1.0, v.dtype)
    p, q, _, _, _ = lax.fori_loop(0, n_iter, body, (p0, q0, p0, q0, one))
    u = jnp.where(lam > 0, v - lam * _div2d(p, q), v)
    if return_dual:
        # The feasible dual iterate — the optimality certificate for
        # :func:`tv_dual_gap` (the subgradient-aligned dual point is NOT a
        # tight certificate: it is zero on flat regions where the optimal
        # dual is nonzero).
        return u, (p, q)
    return u


def tv_dual_gap(
    lam: Array,
    v: Array,
    u: Array,
    dual: tuple[Array, Array],
    isotropic: bool = True,
) -> Array:
    """Primal-dual gap certificate for ``u, dual = prox_tv(..,
    return_dual=True)``.

    ``dual`` must be a feasible point of the pointwise unit ball (FGP's
    iterates are, by projection).  gap = primal(u) - dual_value >= 0
    always, and -> 0 as both converge; tests use it to certify the
    inexactness of the fixed-budget prox without an external solver.
    """
    p, q = dual
    primal = 0.5 * jnp.sum((u - v) ** 2) + lam * tv2d(u, isotropic)
    w = lam * _div2d(p, q)
    # dual(z) = -||lam div z||^2/2 + <v, lam div z>.
    dual_val = -0.5 * jnp.sum(w * w) + jnp.sum(v * w)
    return primal - dual_val

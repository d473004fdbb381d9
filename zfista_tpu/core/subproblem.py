r"""Jittable solvers for the (multiobjective) proximal subproblem.

At each outer iteration the method solves

.. math::

    \min_x \; \max_i \big[ \nabla f_i(y)^\top (x - y) + g_i(x)
        + f_i(y) - F_i(x_{old}) \big] + \tfrac{1}{2\,lr}\|x - y\|^2

via its Fenchel dual over the probability simplex
:math:`\Delta = \{w \ge 0, \sum_i w_i = 1\}` (reference:
zfista/proximal_gradient.py:35-209).  The dual function to *minimize* is

.. math::

    \varphi(w) = -\langle w, g(x_w)\rangle - \tfrac{1}{2\,lr}\|x_w - u_w\|^2
        + \tfrac{lr}{2}\|J^\top w\|^2 + \langle w, F_{old} - f(y)\rangle,

with :math:`u_w = y - lr\,J^\top w` and primal recovery
:math:`x_w = \mathrm{prox}_{lr\,w^\top g}(u_w)`.  By Danskin's theorem
:math:`\nabla\varphi(w)_i = -(g_i(x_w) + \nabla f_i(y)^\top (x_w - y))
+ (F_{old,i} - f_i(y))`, i.e. one prox + one ``g`` + one small matvec per
gradient evaluation.  The primal optimal value equals
:math:`-\varphi(w^\star)` by strong duality (the reference sets
``res.fun = -res_dual.fun``, zfista/proximal_gradient.py:207).

The reference dispatches to ``scipy.optimize.minimize_scalar`` (m=2, Brent)
and ``scipy.optimize.minimize(method='trust-constr')`` (m>=3) — both
data-dependent, non-jittable, CPU-only.  The TPU-native replacements here:

* ``m == 1`` — a single closed-form prox step (no dual problem).
* ``m == 2`` — **vectorized bisection** on the monotone dual derivative
  :math:`\psi(t) = \partial_t \varphi([t, 1-t])`; a fixed, statically-bounded
  iteration count (``ceil(log2(1/tol))``) makes it jit-, vmap- and
  shard-friendly with zero control-flow divergence.
* ``m >= 3`` — **semismooth projected Newton on the simplex**: two-metric
  active-set splitting, an autodiff generalized Hessian (``jax.jacfwd``
  through the piecewise-linear prox), an (m+1)x(m+1) KKT solve per step,
  Armijo backtracking, and a projected-gradient safeguard, all inside
  ``lax.while_loop``.  Second-order because the dual's conditioning spans
  decades on real problems — first-order methods need ~1e5 inner steps.

Everything is shape-static, so the whole subproblem vmaps across scenario
batches and compiles into the outer solver loop as a single XLA program.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax.numpy as jnp
from jax import lax

from zfista_tpu._typing import Array
from zfista_tpu.ops.precision import dot_hp, matmul_hp
from zfista_tpu.ops.prox import project_simplex

# All products in the dual are exact f32/f64: under vmap they lower to MXU
# matmuls whose TPU default precision is bf16 — enough noise to keep the
# outer solver's error criterion from ever reaching tol (the solver
# plateaus at ~1e-3).  GEMV/small-matmul here is bandwidth-bound, so full
# precision costs nothing.
_DOT = matmul_hp
#: Full-precision vector-vector dot.  Same rationale as _DOT: under vmap a
#: batched inner product lowers to a batched dot_general that MAY take the
#: MXU's bf16 default; these dots feed accept/stall decisions (model
#: values, Armijo tests) where 1e-3 relative noise breaks convergence.
_VDOT = dot_hp


class SubproblemResult(NamedTuple):
    x: Array  # (n,) primal solution
    fun: Array  # scalar: primal subproblem objective at the solution
    weight: Array  # (m,) dual solution
    nit: Array  # scalar int32: inner iterations used


def _make_dual(f_y, jac_f_y, F_old, g, prox_wsum_g, lr, y, deprecated: bool):
    """Closures for the dual objective/gradient at a weight ``w``.

    All captured quantities (``f_y``, ``jac_f_y``, ``F_old``) are computed
    once per line-search trial by the caller — the reference recomputes them
    on every subproblem call (zfista/proximal_gradient.py:140-142); evaluating
    each once is a deliberate fix tracked in SURVEY.md §7.
    """
    shift = jnp.zeros_like(f_y) if deprecated else F_old - f_y

    def _eval(w: Array):
        wsum_jac = _DOT(w, jac_f_y)
        u = y - lr * wsum_jac
        x_w = prox_wsum_g(lr * w, u)
        return wsum_jac, u, x_w

    def _fun(w, wsum_jac, u, x_w, g_xw):
        diff = x_w - u
        return (
            -_VDOT(w, g_xw)
            - _VDOT(diff, diff) / (2 * lr)
            + (lr / 2) * _VDOT(wsum_jac, wsum_jac)
            + _VDOT(w, shift)
        )

    def primal_at(w: Array) -> Array:
        return _eval(w)[2]

    def value_and_grad(w: Array):
        wsum_jac, u, x_w = _eval(w)
        g_xw = g(x_w)
        fun = _fun(w, wsum_jac, u, x_w, g_xw)
        grad = -g_xw - _DOT(jac_f_y, x_w - y) + shift
        return fun, grad

    def value_and_primal(w: Array):
        """One evaluation serving both the final dual value AND the primal
        recovery — the finalize sites previously called ``primal_at`` and
        ``value_and_grad`` back to back, paying a redundant prox + matvec
        unless XLA's CSE happened to merge them."""
        wsum_jac, u, x_w = _eval(w)
        fun = _fun(w, wsum_jac, u, x_w, g(x_w))
        return fun, x_w

    return primal_at, value_and_grad, value_and_primal


def solve_small_linear(K: Array, b: Array) -> Array:
    """Solve ``K x = b`` for a SMALL static-size square system by fully
    unrolled Gauss-Jordan elimination with partial pivoting.

    Pure vector ops (gather/where/outer) — no ``lax.linalg`` lowering.
    Batched ``lax.linalg`` kernels are a known hazard on this TPU backend
    at large vmap widths (batched ``eigvalsh`` faults it, see the
    ``Ls``-bound comment in :func:`make_subproblem_solver`; batched LU
    from ``jnp.linalg.solve`` is implicated in the m>=3 large-batch
    crash, BENCHMARKS.md "known cliffs").  For the (m+1)-sized KKT
    systems here (4-6 unknowns) unrolled elimination is also cheaper
    than a general LU.  Singular systems produce inf/nan (zero pivot
    divides through, IEEE semantics) exactly like ``jnp.linalg.solve``,
    which the Newton fallback logic relies on.
    """
    n = K.shape[-1]
    A = jnp.concatenate([K, b[:, None]], axis=-1)
    idx = jnp.arange(n)
    for k in range(n):
        mag = jnp.where(idx < k, -jnp.inf, jnp.abs(A[:, k]))
        p = jnp.argmax(mag)
        rowk, rowp = A[k], A[p]
        A = A.at[k].set(rowp).at[p].set(rowk)
        row_scaled = A[k] / A[k, k]
        factors = jnp.where(idx == k, 0.0, A[:, k])
        A = A - factors[:, None] * row_scaled[None, :]
        A = A.at[k].set(row_scaled)
    return A[:, n]


def make_subproblem_solver(
    g: Callable[[Array], Array],
    prox_wsum_g: Callable[[Array, Array], Array],
    n_objectives: int,
    *,
    tol: float,
    max_iter: int,
    deprecated: bool = False,
) -> Callable[..., SubproblemResult]:
    """Build ``solve(lr, F_old, y, f_y, jac_f_y, w0) -> SubproblemResult``.

    ``n_objectives``, ``tol``, ``max_iter`` and ``deprecated`` are static so
    the returned function traces to a fixed XLA program.
    """
    m = n_objectives

    if m == 1:

        def solve_scalar(lr, F_old, y, f_y, jac_f_y, w0) -> SubproblemResult:
            grad = jac_f_y[0]
            x = prox_wsum_g(lr * jnp.ones((1,), y.dtype), y - lr * grad)
            d = x - y
            fun = _VDOT(grad, d) + g(x)[0] + _VDOT(d, d) / (2 * lr)
            if not deprecated:
                fun = fun + (f_y[0] - F_old[0])
            return SubproblemResult(
                x=x,
                fun=fun,
                weight=jnp.ones((1,), y.dtype),
                nit=jnp.asarray(1, jnp.int32),
            )

        return solve_scalar

    if m == 2:
        # Bisection steps to localize t within `tol` of the optimum
        # (static count, mirrors Brent's xatol in the reference).
        n_bisect = min(
            max(int(math.ceil(math.log2(1.0 / max(tol, 1e-15)))), 1), max_iter
        )

        def solve_m2(lr, F_old, y, f_y, jac_f_y, w0) -> SubproblemResult:
            primal_at, vag, vap = _make_dual(
                f_y, jac_f_y, F_old, g, prox_wsum_g, lr, y, deprecated
            )

            def psi(t):
                # Directional derivative of phi along w = [t, 1-t].
                _, grad = vag(jnp.stack([t, 1 - t]))
                return grad[0] - grad[1]

            dtype = y.dtype
            zero = jnp.asarray(0.0, dtype)
            one = jnp.asarray(1.0, dtype)
            psi0 = psi(zero)
            psi1 = psi(one)

            # Early exit at the dtype's resolution: in f32 the interval
            # bottoms out after ~24 halvings, so the static worst case
            # (n_bisect=40 at tol=1e-12) would waste ~40% of dual evals.
            width_floor = jnp.asarray(
                max(tol, (2.3e-16 if dtype == jnp.float64 else 1.2e-7)), dtype
            )

            def bisect(_):
                def cond(carry):
                    lo, hi, k = carry
                    return (hi - lo > width_floor) & (k < n_bisect)

                def body(carry):
                    lo, hi, k = carry
                    mid = (lo + hi) / 2
                    pm = psi(mid)
                    lo = jnp.where(pm < 0, mid, lo)
                    hi = jnp.where(pm < 0, hi, mid)
                    return lo, hi, k + 1

                lo, hi, k = lax.while_loop(
                    cond, body, (zero, one, jnp.asarray(0, jnp.int32))
                )
                return (lo + hi) / 2, k

            # phi convex => psi nondecreasing. Interior solution iff
            # psi(0) < 0 < psi(1); otherwise the optimum is a vertex.
            # nit reports the ACTUAL dual evaluations (2 endpoint psi's +
            # bisection steps taken, which the width floor can cut short).
            zero_k = jnp.asarray(0, jnp.int32)
            t_star, n_steps = lax.cond(
                psi0 >= 0,
                lambda _: (zero, zero_k),
                lambda _: lax.cond(
                    psi1 <= 0, lambda __: (one, zero_k), bisect, _
                ),
                operand=None,
            )
            w = jnp.stack([t_star, 1 - t_star])
            phi_star, x = vap(w)
            return SubproblemResult(
                x=x,
                fun=-phi_star,
                weight=w,
                nit=n_steps + 2,
            )

        return solve_m2

    # m >= 3: semismooth projected Newton on the simplex.
    #
    # Why not first-order: the dual Hessian is ~ lr * J J^T restricted to the
    # prox-active coordinates; its spectrum on real problems spans 5+ decades
    # (FDS n=10: lambda in [2.3, 1.3e5]), so projected gradient/FISTA needs
    # ~1e5 inner iterations per line-search trial.  The dual has only m
    # variables (m = 3..5 in practice), so a Newton step is an (m+1)x(m+1)
    # KKT solve — conditioning-immune and quadratically convergent.  The
    # generalized Hessian comes from forward-mode autodiff through the prox
    # (piecewise linear => jacfwd yields a valid Clarke-Jacobian element
    # a.e.), the same role BFGS-in-trust-constr plays for the reference
    # (zfista/proximal_gradient.py:192-205) but exact, jittable, vmappable.
    import jax as _jax

    # Quadratic convergence reaches any fixed precision within ~25
    # iterations; the cap only bounds pathological cases (degenerate duals
    # wandering an optimal face with sub-threshold progress per step, e.g.
    # rank-1 Grams with L1 kinks) where extra iterations buy nothing.
    newton_cap = min(max_iter, 30)

    def solve_mk(lr, F_old, y, f_y, jac_f_y, w0) -> SubproblemResult:
        primal_at, vag, vap = _make_dual(
            f_y, jac_f_y, F_old, g, prox_wsum_g, lr, y, deprecated
        )
        dtype = y.dtype
        delta = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)
        stat_tol = jnp.asarray(
            max(tol, 100 * (2.2e-16 if dtype == jnp.float64 else 1.2e-7)), dtype
        )
        grad_fn = lambda w: vag(w)[1]
        hess_fn = _jax.jacfwd(grad_fn)

        # Gradient-mapping scale: an upper bound on the dual's curvature,
        # used for the PG fallback step and the stationarity measure.
        # trace(J Jᵀ) = sum(J²) >= lambda_max and needs no eigensolver —
        # batched eigvalsh faults the TPU backend at scale, and a bound
        # within a factor m only makes the safeguard step conservative.
        lam_bound = jnp.sum(jac_f_y * jac_f_y)
        Ls = jnp.maximum(lr * lam_bound, jnp.asarray(1.0, dtype))

        w_start = project_simplex(w0.astype(dtype))

        class Carry(NamedTuple):
            w: Array
            phi: Array
            k: Array
            done: Array
            nit: Array
            stall: Array  # consecutive iterations without real phi progress

        def cond(c: Carry):
            return (~c.done) & (c.k < newton_cap)

        def body(c: Carry):
            phi, grad = vag(c.w)
            H = hess_fn(c.w) + delta * jnp.eye(m, dtype=dtype)

            # Two-metric projection (Bertsekas 1982): Newton metric on the
            # free coordinates, gradient metric on the pinned ones, and the
            # trial point is the SIMPLEX PROJECTION of w + a*d — never a
            # step capped at the boundary, which stalls at a=0 when a
            # coordinate sits on the constraint (active-set cycling).
            #
            # The active set comes from the projected-gradient point: on the
            # simplex the multiplier condition at a vertex coordinate is
            # ``grad_i >= nu`` (nu = the equality constraint's multiplier),
            # NOT ``grad_i >= 0`` — a sign test against zero misclassifies
            # every "wants to stay at 0" coordinate whose gradient is
            # negative but above nu as free, the Newton step pushes it
            # negative, projection mangles the direction, and Armijo limps
            # at 2^-40 steps (measured: m=8 random duals converged linearly
            # at ratio ~0.89 and burned the whole newton_cap 3e-6 short,
            # tests/test_subproblem_stress.py).  ``project_simplex``
            # computes nu internally, so ``w_pg > 0`` is the
            # multiplier-correct free test.
            w_pg = project_simplex(c.w - grad / Ls)
            free = w_pg > 0
            fm = free.astype(dtype)
            # Pinned coordinates step exactly to their projected value
            # (typically 0); the free block solves the KKT system
            # [H_ff  1_f; 1_f^T  0] [d_f; nu] = [-(grad + H d_a)_f; -sum(d_a)]
            # (frozen rows replaced by d_i = 0) so the combined step keeps
            # sum(w + d) = 1 and models the active coordinates' movement.
            d_active = (1.0 - fm) * (w_pg - c.w)
            K = jnp.zeros((m + 1, m + 1), dtype)
            K = K.at[:m, :m].set(H * jnp.outer(fm, fm) + jnp.diag(1.0 - fm))
            K = K.at[:m, m].set(fm)
            K = K.at[m, :m].set(fm)
            rhs = jnp.concatenate(
                [
                    -(grad + _DOT(H, d_active)) * fm,
                    -jnp.sum(d_active)[None],
                ]
            )
            d_newton = solve_small_linear(K, rhs)[:m] + d_active

            # Feasible-direction PG fallback: w + a*(w_pg - w) stays on the
            # simplex for a in [0,1] and the projection theorem gives
            # <grad, w_pg - w> <= -Ls*||w_pg - w||^2 < 0 — guaranteed
            # descent whenever not stationary.
            d_pg = w_pg - c.w
            bad = (~jnp.all(jnp.isfinite(d_newton))) | (
                _VDOT(grad, d_newton) >= 0
            )
            d_first = jnp.where(bad, d_pg, d_newton)

            # Armijo backtracking along the projection arc
            # w(a) = P_simplex(w + a d), with an O(eps)-slack so marginal
            # accepts are rounding-stable (the same subproblem compiled into
            # a larger fused program sees ~1-ulp different inputs; without
            # the slack those flips change the termination point).
            c1 = jnp.asarray(1e-4, dtype)
            slack = jnp.asarray(
                4 * (2.2e-16 if dtype == jnp.float64 else 1.2e-7), dtype
            ) * (1 + jnp.abs(phi))

            def arc_search(d):
                def accept(w_t, phi_t):
                    # A trial that does not move is never "accepted": it
                    # must fall through to the PG arc, whose failure is the
                    # real stationarity certificate (otherwise a clipped
                    # Newton direction silently freezes the iterate).
                    moved = jnp.any(w_t != c.w)
                    return moved & (
                        phi_t <= phi + c1 * _VDOT(grad, w_t - c.w) + slack
                    )

                def ls_cond(s):
                    a, ok, j, _, _ = s
                    return (~ok) & (j < 40)

                def ls_body(s):
                    a, _, j, _, _ = s
                    a = a * 0.5
                    w_t = project_simplex(c.w + a * d)
                    phi_t, _ = vag(w_t)
                    return (a, accept(w_t, phi_t), j + 1, w_t, phi_t)

                w_first = project_simplex(c.w + d)
                phi_first, _ = vag(w_first)
                _, ok, n, w_t, phi_t = lax.while_loop(
                    ls_cond,
                    ls_body,
                    (
                        jnp.asarray(1.0, dtype),
                        accept(w_first, phi_first),
                        jnp.asarray(1, jnp.int32),
                        w_first,
                        phi_first,
                    ),
                )
                return ok, n, w_t, phi_t

            ok1, n1, w1, phi1 = arc_search(d_first)
            # If the Newton arc fails, retry along the projected-gradient
            # direction, which descends unless genuinely stationary — only
            # ITS failure means we are at the numerical floor.  When the
            # Newton direction was rejected up front (``bad``), d_first IS
            # d_pg and the retry would repeat the identical failed search
            # (up to ~41 redundant dual evaluations, double-counted in
            # nit) — skip it and reuse the first result.
            ok2, n2, w2, phi2 = lax.cond(
                ok1 | bad,
                lambda: (ok1, jnp.asarray(0, jnp.int32), w1, phi1),
                lambda: arc_search(d_pg),
            )
            ok = ok1 | ok2
            n_ls = n1 + n2
            w_new = jnp.where(ok1, w1, w2)
            phi_new = jnp.where(ok1, phi1, phi2)
            w_new = jnp.where(ok, w_new, c.w)
            phi_new = jnp.where(ok, phi_new, phi)

            # Scaled gradient mapping: distance moved by one projected-
            # gradient step at the safe step size (w_pg from the active-set
            # identification above).
            gm = jnp.linalg.norm(c.w - w_pg)
            stationary = gm <= stat_tol * (1 + jnp.linalg.norm(grad) / Ls)
            # Progress-based floor: the arc accept carries an O(eps) slack,
            # so at the dtype's noise floor it keeps "accepting" null steps
            # and the loop would burn the full newton_cap (80+ dual evals
            # per outer iteration, at every line-search trial — enough to
            # outlive device watchdogs at batch scale).  Two consecutive
            # iterations without a real phi decrease terminate the solve:
            # Newton's convergence is quadratic, so genuine progress never
            # pauses twice.
            eps_phi = jnp.asarray(
                (2.2e-16 if dtype == jnp.float64 else 1.2e-7), dtype
            ) * (1 + jnp.abs(phi))
            progressed = (phi - phi_new) > eps_phi
            stall_new = jnp.where(progressed, 0, c.stall + 1).astype(jnp.int32)
            return Carry(
                w=w_new,
                phi=phi_new,
                k=c.k + 1,
                done=stationary | (~ok) | (stall_new >= 2),
                nit=c.nit + n_ls + m + 1,  # m tangents for H + phi evals
                stall=stall_new,
            )

        init = Carry(
            w=w_start,
            phi=jnp.zeros((), dtype),
            k=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
            nit=jnp.asarray(1, jnp.int32),
            stall=jnp.asarray(0, jnp.int32),
        )
        final = lax.while_loop(cond, body, init)

        phi_star, x = vap(final.w)
        return SubproblemResult(x=x, fun=-phi_star, weight=final.w, nit=final.nit)

    return solve_mk

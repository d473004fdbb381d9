r"""TPU-native ISTA/FISTA with the generalized momentum factor.

This is the L2 "solver core" of the framework: the full outer iteration —
backtracking line search, (multiobjective) subproblem, convergence check on
:math:`\|x^k - y^k\|_\infty`, and the generalized momentum rule

.. math::

    t_{k+1} = \sqrt{t_k^2 - a\,t_k + b} + \tfrac12,\qquad
    y^{k+1} = x^k + \frac{t_k - 1}{t_{k+1}} (x^k - x^{k-1})

(reference: zfista/proximal_gradient.py:311-555) — compiled into a **single
XLA program**: one pure pytree ``State`` advanced by a jitted step inside
``lax.while_loop``.  Backtracking is an inner ``while_loop`` carrying ``lr``;
the subproblem solvers (closed-form / bisection / simplex-FISTA) live in
:mod:`zfista_tpu.core.subproblem`.  There is no host round-trip per iteration,
no data-dependent Python control flow, and every shape is static, so the same
step function vmaps over scenario batches and shards over device meshes
unchanged.

Design deltas vs the reference (tracked, per SURVEY.md §7):

* ``F(x_old)``, ``f(y)`` and ``jac_f(y)`` are evaluated once per outer
  iteration and carried (the reference recomputes them 2-3x:
  proximal_gradient.py:141,279).
* ``nit_internal`` is emitted (the reference's metrics read it but its solver
  never sets it: zfista/metrics.py:159).
* ``jac_f`` defaults to autodiff (``jax.jacfwd``); analytic override allowed.
* The verbose trace prints all five declared columns (the reference's
  formatter crashes: proximal_gradient.py:24-32 vs 512-517).

Two drivers share the step function:

* ``while`` — the whole solve is one ``lax.while_loop`` (fastest; used for
  benchmarks): the host touches the device twice per solve.
* ``scan`` — chunked ``lax.scan`` with per-step outputs, used when
  ``return_all=True``; the host loop concatenates chunks until convergence,
  so histories are unbounded without a gigantic preallocation.
"""

from __future__ import annotations

import time as _time
import warnings
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from zfista_tpu._typing import Array
from zfista_tpu.core.result import TERMINATION_MESSAGES, SolveResult
from zfista_tpu.core.subproblem import make_subproblem_solver


class State(NamedTuple):
    """Pure pytree carry for one solve (vmappable across a batch)."""

    x: Array  # current accepted iterate (n,)
    y: Array  # extrapolated point (n,)
    F_x: Array  # F(x) = f(x) + g(x), (m,)
    lr: Array  # current learning rate (scalar)
    t: Array  # momentum t_k (scalar)
    w: Array  # dual warm start (m,)
    err: Array  # last ||x - y||_inf (scalar)
    sub_fun: Array  # last subproblem optimal value (scalar)
    nit: Array  # outer iterations completed (int32)
    nit_internal: Array  # accumulated inner iterations (int32)
    converged: Array  # bool
    failed: Array  # bool (line search exhausted)


class _LS(NamedTuple):
    lr: Array
    k: Array
    done: Array
    x: Array
    F_x: Array
    w: Array
    sub_fun: Array
    nits: Array


def _make_step(
    f: Callable[[Array], Array],
    g: Callable[[Array], Array],
    jac_f: Callable[[Array], Array],
    prox_wsum_g: Callable[[Array, Array], Array],
    n_objectives: int,
    *,
    tol: float,
    tol_rel: float = 0.0,
    tol_internal: float,
    tol_internal_rel: float = 0.0,
    max_iter_internal: int,
    max_backtrack_iter: int,
    warm_start: bool,
    decay_rate: float,
    nesterov: bool,
    nesterov_ratio: tuple[float, float],
    deprecated: bool,
    verbose: bool,
    adaptive_restart: bool = False,
    project_momentum: bool = False,
    track_objective: bool = True,
    unguarded: bool = False,
    max_iter: int | None = None,
) -> Callable[[State], State]:
    """Build the jittable outer-iteration step (all options static).

    ``track_objective=False`` (legal only for scalar fixed-step solves with
    no history/verbose consumer) skips the per-iteration ``F(x) = f(x) +
    g(x)`` evaluation — on dense LASSO that is one of three matvecs, i.e.
    ~1.5x throughput.  Nothing in the scalar fixed-lr iteration *reads*
    ``F``: the prox step needs only the gradient, the convergence test only
    ``||x - y||_inf``.  The carried ``F_x`` goes stale; callers recompute
    it once at the end.  The iterate trajectory is bitwise identical.

    ``unguarded=True`` (only for the chunk-select driver,
    :func:`make_while_driver`) drops the per-step convergence freeze on
    ``y``/``t``: the select makes the next step's matvec wait on the full
    ``||x - y||_inf`` reduction, a pipeline bubble in an otherwise
    straight-line chunk.  The driver's post-hoc fold reproduces the freeze
    exactly (it patches the converging state's ``y``/``t`` from its
    predecessor), so results stay bitwise identical to the guarded step.
    """
    solve_sub = make_subproblem_solver(
        g,
        prox_wsum_g,
        n_objectives,
        tol=tol_internal,
        max_iter=max_iter_internal,
        deprecated=deprecated,
    )
    fixed_lr = decay_rate == 1

    def line_search(state: State, f_y: Array, jac_y: Array) -> _LS:
        F_old = state.F_x

        def trial(lr, w):
            sub = solve_sub(lr, F_old, state.y, f_y, jac_y, w)
            f_t = f(sub.x)
            F_t = f_t + g(sub.x)
            return sub, f_t, F_t

        if fixed_lr:
            # decay_rate == 1: a single subproblem solve, accepted
            # unconditionally (reference: proximal_gradient.py:298-299).
            if track_objective:
                sub, f_t, F_t = trial(state.lr, state.w)
                sub_fun = sub.fun
            else:
                sub = solve_sub(state.lr, F_old, state.y, f_y, jac_y, state.w)
                # Stale placeholders, never read downstream; carrying the
                # OLD sub_fun (not sub.fun) makes the subproblem's model
                # value dead code, so XLA also eliminates its reductions.
                f_t, F_t = f_y, F_old
                sub_fun = state.sub_fun
            w = sub.weight if warm_start else state.w
            return _LS(
                lr=state.lr,
                k=jnp.asarray(1, jnp.int32),
                done=jnp.asarray(True),
                x=sub.x,
                F_x=F_t,
                w=w,
                sub_fun=sub_fun,
                nits=sub.nit,
            )

        def accept_test(f_t, F_t, sub_fun):
            slack = sub_fun + tol_internal
            if tol_internal_rel:
                # Opt-in f32 rescue (default 0 — reference accept test,
                # trajectories bitwise): near the optimum the true decrease
                # falls below the objective's own floating-point rounding,
                # so `F_t - F_old` is pure cancellation noise at scale
                # eps*|F| and the absolute test rejects every trial (even
                # bit-equal objectives: 0 <= sub_fun + 1e-12 is False for
                # any real model decrease), driving lr to the floor and
                # freezing the lane at status=2 (measured: 24/256 TRIDIA
                # f32 starts, BENCHMARKS.md).  A slack proportional to the
                # comparison's own magnitude accepts steps whose apparent
                # increase is within that rounding noise.
                ref = f_y if deprecated else F_old
                slack = slack + tol_internal_rel * jnp.abs(ref)
            if deprecated:
                # Old Paper-1 condition: f(x) - f(y) <= model + tol
                # (reference: proximal_gradient.py:300-301).
                lhs = f_t - f_y
            else:
                lhs = F_t - F_old
            # NaN-safe: comparisons with NaN are False => reject.
            return jnp.all(lhs <= slack)

        def cond(c: _LS):
            return (~c.done) & (c.k < max_backtrack_iter)

        def body(c: _LS):
            sub, f_t, F_t = trial(c.lr, c.w)
            ok = accept_test(f_t, F_t, sub.fun)
            w = sub.weight if warm_start else c.w
            return _LS(
                lr=jnp.where(ok, c.lr, c.lr * decay_rate),
                k=c.k + 1,
                done=ok,
                x=sub.x,
                F_x=F_t,
                w=w,
                sub_fun=sub.fun,
                nits=c.nits + sub.nit,
            )

        init = _LS(
            lr=state.lr,
            k=jnp.asarray(0, jnp.int32),
            done=jnp.asarray(False),
            x=state.x,
            F_x=F_old,
            w=state.w,
            sub_fun=jnp.zeros((), state.x.dtype),
            nits=jnp.asarray(0, jnp.int32),
        )
        return lax.while_loop(cond, body, init)

    # The momentum pair may be python floats (static) or traced jnp scalars
    # (per-lane data under vmap — how the (a,b)-sweep experiments run the
    # whole grid as ONE program; reference sweeps spawn a process per pair,
    # examples/PGM_experiment_with_various_a_b.ipynb).
    a, b = nesterov_ratio

    def step(state: State) -> State:
        f_y = f(state.y)
        jac_y = jac_f(state.y)
        ls = line_search(state, f_y, jac_y)

        failed_now = ~ls.done
        err = jnp.max(jnp.abs(ls.x - state.y))
        if tol_rel:
            # Opt-in iterate-scaled criterion (deliberate divergence from
            # the reference's absolute-only test, proximal_gradient.py:525-529):
            # ||x - y||_inf < tol + tol_rel * ||x||_inf.  Closes the f32
            # floor on problems whose iterate/objective scale puts the
            # representable step size above an absolute tol (e.g. FDS on
            # TPU, DESIGN.md "f32 limitations").  Default 0.0 compiles to
            # the reference criterion exactly (this branch is static).
            converged_now = (err < tol + tol_rel * jnp.max(jnp.abs(ls.x))) & ls.done
        else:
            converged_now = (err < tol) & ls.done

        if nesterov:
            t_k = state.t
            if adaptive_restart:
                # O'Donoghue & Candes gradient-scheme restart: reset the
                # momentum when the step opposes the previous direction
                # (kills the characteristic FISTA ripple near tolerance;
                # opt-in — the reference has no restart, and trajectories
                # with it on diverge from reference trajectories).
                # Full precision: under vmap this dot can lower to a bf16
                # MXU batched product, making the restart sign test
                # noise-driven near zero.
                osc = (
                    jnp.dot(
                        state.y - ls.x,
                        ls.x - state.x,
                        precision=lax.Precision.HIGHEST,
                    )
                    > 0
                )
                t_k = jnp.where(osc, jnp.ones_like(t_k), t_k)
            t_new = jnp.sqrt(t_k**2 - a * t_k + b) + 0.5
            gamma = (t_k - 1) / t_new
            y_new = ls.x + gamma * (ls.x - state.x)
            if project_momentum:
                # Feasible extrapolation (opt-in): map y through the
                # zero-weight prox — for box-constrained problems this is
                # exactly the box projection, keeping y inside dom(f).
                # The reference extrapolates unprojected and FAILS on every
                # accelerated ZDT1/SD-type solve (sqrt/reciprocal leave
                # their domain); this option makes acceleration usable
                # there at the cost of diverging from reference paths.
                y_new = prox_wsum_g(
                    jnp.zeros((n_objectives,), y_new.dtype), y_new
                )
        else:
            t_new = state.t
            y_new = ls.x

        nit_new = state.nit + jnp.where(failed_now, 0, 1)

        if verbose:
            # Skip rows for frozen states: masked drivers (check_every > 1,
            # the scan driver) call step() on already-converged carries and
            # discard the result — printing there would emit phantom rows.
            # The max_iter freeze must be included: a state parked at the
            # iteration cap is neither converged nor failed but is equally
            # frozen (``_active``'s third clause).
            frozen = state.converged | state.failed
            if max_iter is not None:
                frozen = frozen | (state.nit >= max_iter)
            lax.cond(
                frozen,
                lambda *_: None,
                lambda n, ni, e, s, lr_: jax.debug.print(
                    "|{n:>6}|{ni:>8}|{e:>+13.4e}|{s:>+13.4e}|{lr:>10.2e}|",
                    n=n,
                    ni=ni,
                    e=e,
                    s=s,
                    lr=lr_,
                ),
                nit_new,
                state.nit_internal + ls.nits,
                err,
                ls.sub_fun,
                ls.lr,
            )

        keep = failed_now  # on failure, freeze at the last accepted point

        def sel(new, old):
            return jnp.where(keep, old, new)

        if unguarded:
            y_out, t_out = y_new, t_new  # freeze applied by the driver fold
        else:
            y_out = jnp.where(converged_now, state.y, y_new)
            t_out = jnp.where(converged_now, state.t, t_new)

        return State(
            x=sel(ls.x, state.x),
            y=sel(y_out, state.y),
            F_x=sel(ls.F_x, state.F_x),
            lr=sel(ls.lr, state.lr),
            t=sel(t_out, state.t),
            w=sel(ls.w, state.w),
            err=sel(err, state.err),
            sub_fun=sel(ls.sub_fun, state.sub_fun),
            nit=nit_new,
            nit_internal=state.nit_internal + ls.nits,
            converged=converged_now,
            failed=failed_now,
        )

    return step


def init_state(
    x0: Array,
    F0: Array,
    n_objectives: int,
    lr: float,
) -> State:
    dtype = x0.dtype
    m = n_objectives
    return State(
        x=x0,
        y=x0,
        F_x=F0,
        lr=jnp.asarray(lr, dtype),
        t=jnp.asarray(1.0, dtype),
        w=jnp.full((m,), 1.0 / m, dtype),
        err=jnp.asarray(jnp.inf, dtype),
        sub_fun=jnp.asarray(0.0, dtype),
        nit=jnp.asarray(0, jnp.int32),
        nit_internal=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        failed=jnp.asarray(False),
    )


def _active(state: State, max_iter: int) -> Array:
    return ~(state.converged | state.failed) & (state.nit < max_iter)


def make_while_driver(
    step: Callable[[State], State],
    max_iter: int,
    check_every: int = 1,
    chunk_select: bool = False,
):
    """Whole solve as one ``lax.while_loop`` (no history).

    ``check_every > 1`` amortizes the loop-trip overhead (dispatch latency
    dominates cheap fixed-step iterations: measured 2.4-5x iterations/s on
    dense LASSO at unroll 4-8, BENCHMARKS.md): the loop predicate is
    evaluated every ``check_every`` steps, with the chunk constructed so a
    converged/failed state freezes in place — the final state is therefore
    BITWISE IDENTICAL to ``check_every=1``, including ``nit``.

    Two chunk constructions (same semantics, different scheduling):

    * ``chunk_select=False`` — ``fori_loop`` of per-step masked selects
      (``unroll`` capped at 8: the step may contain nested while_loops —
      line search, dual Newton — and fully unrolling those explodes
      compile time).
    * ``chunk_select=True`` — the chunk's steps run UNCONDITIONALLY as
      straight-line code, then ONE reverse select-fold picks the first
      inactive intermediate state (or the last, if none).  Removing the
      per-step select breaks the false dependency between consecutive
      matvecs, letting XLA software-pipeline the chunk like a raw
      ``fori_loop``: measured 23.3k vs 21.6k iter/s (masked, unroll 32) vs
      14.8k (unroll 8) on dense LASSO n=10k, v5e.  Exactness: on chunk
      entry the state is active (the while predicate just held), each
      ``step`` is deterministic, and everything computed past the first
      inactive intermediate is discarded by the fold — identical to
      freezing there.  Only legal when ``step`` is total straight-line
      code (no inner while_loops, no side effects): the facade enables it
      for scalar fixed-step non-verbose solves.
    """

    def masked_step(state: State) -> State:
        active = _active(state, max_iter)
        new = step(state)
        return jax.tree.map(lambda a, b: jnp.where(active, a, b), new, state)

    def chunk_body_select(s: State) -> State:
        # Steps run unconditionally; one reverse fold then picks the first
        # inactive intermediate.  The step is built ``unguarded`` (its
        # output y/t are NOT frozen at convergence — that select would
        # serialize the next matvec on the err reduction), so the fold
        # restores the freeze here: a converged state's y/t are patched
        # from its predecessor.  For a guarded step the patch is a no-op
        # (y/t already equal the predecessor's), so both are exact.
        prev = s
        pairs = []
        for _ in range(check_every):
            c = step(prev)
            # Barrier between steps: without it XLA fuses elementwise ops
            # ACROSS unrolled steps, changing FMA contraction and drifting
            # results by ~1 ulp/op vs the sequential program (caught by
            # the randomized property test).  The barrier pins each step
            # to the sequential program's rounding; it carries no data
            # dependency, so the matvec chain still pipelines (measured
            # no throughput change on the TPU headline).
            c = lax.optimization_barrier(c)
            pairs.append((c, prev))
            prev = c

        def patched(si: State, pr: State) -> State:
            return si._replace(
                y=jnp.where(si.converged, pr.y, si.y),
                t=jnp.where(si.converged, pr.t, si.t),
            )

        out = patched(*pairs[-1])
        for si, pr in reversed(pairs[:-1]):
            stop = ~_active(si, max_iter)
            out = jax.tree.map(
                lambda a, b: jnp.where(stop, a, b), patched(si, pr), out
            )
        return out

    def run(state: State) -> State:
        if check_every == 1:
            return lax.while_loop(
                partial(_active, max_iter=max_iter), step, state
            )
        if chunk_select:
            body = chunk_body_select
        else:
            body = lambda s: lax.fori_loop(
                0,
                check_every,
                lambda _, c: masked_step(c),
                s,
                unroll=min(check_every, 8),
            )
        return lax.while_loop(
            partial(_active, max_iter=max_iter), body, state
        )

    return run


def make_scan_driver(step: Callable[[State], State], max_iter: int, chunk: int):
    """Chunked ``lax.scan`` driver emitting per-step history.

    Each call advances up to ``chunk`` iterations (frozen once inactive) and
    returns stacked ``(x, F, err, recorded)`` per step; the host loop in
    :func:`minimize_proximal_gradient` concatenates chunks until done.
    """

    def masked_step(state: State, _):
        active = _active(state, max_iter)
        new = step(state)
        merged = jax.tree.map(lambda n, o: jnp.where(active, n, o), new, state)
        # A step is recorded iff it ran and was not a line-search failure.
        recorded = active & ~new.failed
        return merged, (merged.x, merged.F_x, merged.err, recorded)

    def run(state: State):
        return lax.scan(masked_step, state, None, length=chunk)

    return run


#: Measured TPU-backend capacity bounds for m>=3 programs (the vmapped or
#: scalar semismooth-Newton dual; DESIGN.md "Known limitations", standalone
#: repro in tools/repro_m3_width_fault.py).  The depth fault mode is pure
#: kernel RUNTIME, independent of batch width — a minutes-long monolithic
#: while_loop faults the device even at width 1 lane — so EVERY unbounded
#: m>=3 dispatch gets its kernel depth bounded.  The width bound applies
#: only to the batch API (parallel/batch.py imports both).
#:
#: These constants encode a BACKEND fault, not framework behavior, and the
#: boundary MOVES between runtime sessions: r3 measured B=1024 clean /
#: B=1536 faulting; r4 ran B=1000 clean under the guard; r5 (2026-08-20)
#: found a 1024-wide dispatch faulting within its first 10 iter_chunk=50
#: kernels (reproduced in three independent processes, old and new dual
#: bodies alike) while B=512 x 60 dispatches ran clean repeatedly — so
#: the lane bound is now 512, the widest width clean in EVERY measured
#: session.
#: ``bench.py`` re-probes the boundary every round (standalone repro +
#: a real guarded framework batch) and records ``m3_fault_probe`` in
#: BENCH_r{N}.json; treat a single clean session as weather, not a trend
#: (r5 observed the repro clean while the real program faulted).
_TPU_M3_SAFE_LANES = 512
_TPU_M3_SAFE_ITER_CHUNK = 50
#: Single-solve (width-1) kernel-depth bound.  The depth fault is kernel
#: RUNTIME (~50 s faults; measured on ~1000-lane programs at 50 outer
#: iterations/kernel).  A width-1 kernel's step is ~3 orders of magnitude
#: lighter, so the batch bound of 50 would only add host round trips
#: (~35 ms each through a remote tunnel); 2000 steps keeps even very
#: heavy single-lane steps (10 ms/step = n~1e8-scale operands) well under
#: the measured fault runtime while making the re-dispatch overhead
#: negligible for the default max_iter=1e6 worst case (500 dispatches).
_TPU_M3_SINGLE_ITER_CHUNK = 2000


def _default_backend() -> str:
    """Backend name for the capacity auto-guard (indirection so tests can
    monkeypatch a 'tpu' answer on the hermetic CPU mesh)."""
    return jax.default_backend()


def make_chunk_driver(step: Callable[[State], State], max_iter: int, chunk: int):
    """At most ``chunk`` masked steps per device call (no history).

    The host loop in :func:`minimize_proximal_gradient` re-dispatches
    until inactive — bounding single-kernel runtime for backends whose
    long monolithic ``while_loop`` kernels fault (the m>=3 TPU depth
    fault).  Frozen states no-op, so the final state is bitwise identical
    to the monolithic while driver's, including ``nit``.
    """

    def masked_step(state: State) -> State:
        active = _active(state, max_iter)
        new = step(state)
        return jax.tree.map(lambda a, b: jnp.where(active, a, b), new, state)

    def run(state: State) -> State:
        return lax.fori_loop(0, chunk, lambda _, s: masked_step(s), state)

    return run


#: Compiled-driver cache: repeated solves with the SAME callables, shapes
#: and options reuse one traced+compiled XLA program instead of retracing
#: per call (host-side tracing otherwise dominates short solves).  Keyed on
#: callable identity — problem callables are assumed pure and frozen; data
#: that changes between solves must ride in ``params`` (a jit argument),
#: not in closures.
_DRIVER_CACHE: dict = {}


class _IdKey:
    """Identity-keyed cache-key wrapper: holds a strong reference, hashes
    and compares by ``is``.  Guards the driver cache against user classes
    with value-based ``__eq__``/``__hash__`` (two instances with different
    data would otherwise alias one compiled program), and — because the
    reference is strong — against id() reuse after garbage collection."""

    __slots__ = ("obj",)

    def __init__(self, obj: Any) -> None:
        self.obj = obj

    def __hash__(self) -> int:
        return id(self.obj)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _IdKey) and self.obj is other.obj


def _callable_key(fn: Any) -> Any:
    """Stable cache key for a problem callable.

    Bound methods are keyed on ``(underlying function, instance identity)``
    — attribute access creates a fresh method object per call, so keying on
    the method itself would defeat the cache, while the method's own
    ``__eq__`` delegates to the instance's (value-based for user classes).
    Everything else is keyed on object identity."""
    if fn is None:
        return None
    self_obj = getattr(fn, "__self__", None)
    func = getattr(fn, "__func__", None)
    if self_obj is not None and func is not None:
        return (func, _IdKey(self_obj))
    return _IdKey(fn)


def _cached_driver(key: Any, build: Callable[[], Callable[..., Any]]) -> Callable[..., Any]:
    try:
        run = _DRIVER_CACHE.get(key)
    except TypeError:
        # Unhashable key leaf (e.g. a traced/jnp scalar passed as an
        # option such as nesterov_ratio).  Such values are baked into the
        # step at trace time, so caching under a value-blind key would
        # serve wrong programs — build uncached instead.
        return build()
    if run is None:
        while len(_DRIVER_CACHE) > 128:
            # FIFO eviction (dicts preserve insertion order): a wholesale
            # clear() would drop the hot entries along with the cold, and
            # unbounded retention would pin closure-embedded operand
            # constants (device buffers) for distinct legacy-closure
            # callables.
            _DRIVER_CACHE.pop(next(iter(_DRIVER_CACHE)))
        run = _DRIVER_CACHE[key] = build()
    return run


#: Device-scalar cache for per-solve option scalars (lr): a fresh
#: ``jnp.asarray(float)`` per call is one host->device transfer, RTT-priced
#: on remote backends — repeat solves with the same lr reuse the upload.
_SCALAR_CACHE: dict = {}


def _device_scalar(v: Any, dtype: Any) -> Array:
    if isinstance(v, jax.Array):
        return v.astype(dtype) if v.dtype != dtype else v
    key = (float(v), str(dtype))
    arr = _SCALAR_CACHE.get(key)
    if arr is None:
        while len(_SCALAR_CACHE) > 1024:
            # FIFO eviction, same rationale as _DRIVER_CACHE: keep the hot
            # recent scalars, drop the oldest.
            _SCALAR_CACHE.pop(next(iter(_SCALAR_CACHE)))
        arr = _SCALAR_CACHE[key] = jnp.asarray(v, dtype)
    return arr


def _device_get_global(tree: Any) -> Any:
    """``jax.device_get`` that also works under a MULTI-PROCESS runtime.

    A leaf sharded across processes (e.g. the iterate of a solve whose
    ``"model"`` mesh axis spans hosts, tests/test_distributed.py TP case) is
    not fully addressable, and plain ``device_get`` raises on it; such
    leaves are assembled with an allgather instead.  Single-process (and
    any fully-addressable leaf) takes the plain ``device_get`` path
    unchanged — one host transfer, zero extra overhead.
    """
    def gettable(leaf: Any) -> bool:
        # device_get reads fully-replicated multi-process arrays from the
        # local copy; only genuinely cross-process-SHARDED leaves need the
        # gather.
        return (
            not isinstance(leaf, jax.Array)
            or leaf.is_fully_addressable
            or leaf.is_fully_replicated
        )

    leaves = jax.tree.leaves(tree)
    if all(gettable(leaf) for leaf in leaves):
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def get(leaf: Any) -> Any:
        if gettable(leaf):
            return jax.device_get(leaf)
        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))

    return jax.tree.map(get, tree)


def _leaf_sig(leaf: Any) -> tuple:
    # NOTE: getattr's default must not be evaluated eagerly —
    # np.asarray on a globally-sharded (non-addressable) jax.Array raises.
    dt = getattr(leaf, "dtype", None)
    if dt is None:
        dt = np.asarray(leaf).dtype
    return (np.shape(leaf), str(dt))


def _params_key(params: Any) -> Any:
    if params is None:
        return None
    leaves, treedef = jax.tree.flatten(params)
    return (treedef, tuple(_leaf_sig(leaf) for leaf in leaves))


def _bind_params(
    f: Callable[..., Any],
    g: Callable[..., Any],
    jac_f: Callable[..., Array] | None,
    prox_wsum_g: Callable[..., Array],
    p: Any,
) -> tuple[Any, Any, Any, Any]:
    """Bind a ``params`` pytree as the trailing argument of the problem
    callables (the single-solve analog of the batch driver's
    ``batch_params`` convention)."""
    fb = lambda x: f(x, p)
    gb = lambda x: g(x, p)
    jacb = (lambda x: jac_f(x, p)) if jac_f is not None else None
    proxb = lambda w, x: prox_wsum_g(w, x, p)
    return fb, gb, jacb, proxb


def _normalize_problem(
    f: Callable[..., Any],
    g: Callable[..., Any],
    jac_f: Callable[..., Array] | None,
    prox_wsum_g: Callable[..., Array],
    x0: Array,
) -> tuple[Any, Any, Any, Any, int, bool]:
    """Normalize user callables to vector form: f,g -> (m,), jac -> (m,n),
    prox(w_vec, x). Returns (f, g, jac, prox, m, scalar_mode)."""
    out = jax.eval_shape(f, x0)
    scalar_mode = out.shape == ()
    if scalar_mode:
        m = 1
        f_v = lambda x: jnp.reshape(f(x), (1,))
        g_v = lambda x: jnp.reshape(g(x), (1,))
        if jac_f is None:
            jac_v = lambda x: jnp.reshape(jax.grad(lambda z: jnp.sum(f(z)))(x), (1, -1))
        else:
            jac_v = lambda x: jnp.reshape(jac_f(x), (1, -1))
        prox_v = lambda w, x: prox_wsum_g(w[0], x)
    else:
        m = out.shape[0]
        f_v = f
        g_v = g
        if jac_f is None:
            jac_v = jax.jacfwd(f)
        else:
            jac_v = lambda x: jnp.reshape(jac_f(x), (m, -1))
        if m == 1:
            # Reference convention: scalar weight when there is one objective
            # (zfista/proximal_gradient.py:147-148).
            prox_v = lambda w, x: prox_wsum_g(w[0], x)
        else:
            prox_v = prox_wsum_g
    return f_v, g_v, jac_v, prox_v, m, scalar_mode


def minimize_proximal_gradient(
    f: Callable[[Array], Any],
    g: Callable[[Array], Any],
    jac_f: Callable[[Array], Array] | None,
    prox_wsum_g: Callable[[Any, Array], Array],
    x0: Array,
    lr: float = 1,
    tol: float = 1e-5,
    tol_rel: float = 0.0,
    tol_internal: float = 1e-12,
    tol_internal_rel: float = 0.0,
    max_iter: int = 1000000,
    max_iter_internal: int = 100000,
    max_backtrack_iter: int = 100,
    warm_start: bool = False,
    decay_rate: float = 0.5,
    nesterov: bool = False,
    nesterov_ratio: tuple[float, float] = (0, 0.25),
    return_all: bool = False,
    verbose: bool = False,
    deprecated: bool = False,
    history_chunk: int = 512,
    initial_state: State | None = None,
    check_every: int | None = None,
    iter_chunk: int | None = None,
    adaptive_restart: bool = False,
    project_momentum: bool = False,
    params: Any = None,
) -> SolveResult:
    r"""Minimize :math:`F(x) = f(x) + g(x)` (scalar- or vector-valued).

    Drop-in facade over the TPU-native solver with the reference's public
    signature and defaults (reference: zfista/proximal_gradient.py:311-331).
    ``f``, ``g``, ``jac_f`` and ``prox_wsum_g`` must be JAX-traceable.
    ``jac_f=None`` derives the Jacobian by autodiff.

    **Freeze contract**: the callables are assumed pure and frozen — repeat
    solves with the same callables/shapes/options reuse one compiled
    program, so data a callable closes over must not change between calls
    (it is baked in at trace time; stale results otherwise).  Data that
    varies between solves rides in ``params`` (a jit argument; see below).

    Returns a :class:`SolveResult` with fields
    ``x, fun, success, status, message, nit, nit_internal, time, weight``
    and, when ``return_all``, ``allvecs / allfuns / allerrs``.

    ``initial_state`` resumes from a checkpointed :class:`State`
    (:mod:`zfista_tpu.utils.checkpoint`); the continuation is bitwise
    identical to the uninterrupted run.  Solver options are not stored in
    the state — pass the same ones.

    ``params`` (optional pytree) is threaded through the compiled program
    as an ARGUMENT, with every callable taking it as its trailing
    parameter: ``f(x, params)``, ``g(x, params)``, ``jac_f(x, params)``,
    ``prox_wsum_g(w, x, params)``.  Use it for large operand data (design
    matrices, observations): a closure-captured operand is embedded in the
    program as a constant (measured 3x slower at n=10k, and it defeats the
    compiled-driver cache), while ``params`` data is streamed per call.
    Repeat solves with the SAME callables/shapes/options reuse one
    compiled program; callables are assumed pure and frozen — mutating
    data they close over between calls yields stale results (pass it via
    ``params`` instead).

    ``tol_rel`` (default 0, the reference behavior) adds an opt-in
    iterate-scaled term to the convergence criterion:
    ``||x - y||_inf < tol + tol_rel * ||x||_inf``.  Use it when the
    problem's scale puts the floating-point error floor above an absolute
    ``tol`` (e.g. FDS objectives ~1e4 in float32 on TPU cannot reach
    ``tol=1e-5`` absolutely); with it 0 every trajectory is bitwise the
    reference criterion.

    ``tol_internal_rel`` (default 0, the reference behavior) is the
    analogous opt-in slack on the backtracking ACCEPT test: the trial is
    accepted when ``F(x_trial) - F(x_k) <= model + tol_internal +
    tol_internal_rel * |F(x_k)|`` (``|f(y)|`` scales the deprecated
    condition).
    Use it when float32 line searches freeze: near the optimum the true
    decrease falls below the objective's own rounding (eps*|F|), the
    absolute test rejects every trial, and the lane ends status=2 with lr
    at the floor (measured: 24/256 TRIDIA f32 starts on TPU,
    BENCHMARKS.md).  A few float32 ulps (e.g. ``1e-6``) accepts steps
    whose apparent increase is within that noise; with it 0 every
    trajectory is bitwise the reference accept test.

    ``check_every`` (default ``None`` = auto) sets how many solver steps
    run between convergence checks; every value is BITWISE identical to
    ``check_every=1`` in trajectory and ``nit`` (the chunked drivers
    re-select the first stopping step).  ``None`` picks 64 on the TPU
    backend for scalar fixed-step solves with no history/verbose — the
    regime where chunking is worth ~25x dispatch-latency amortization —
    and 1 everywhere else (the reference's per-iteration semantics,
    reference zfista/proximal_gradient.py:474-529, is preserved either
    way).  Pass an explicit value to override.

    ``iter_chunk`` bounds how many solver iterations one device kernel
    runs; the host re-dispatches until convergence, bitwise identical to
    the monolithic program (frozen states no-op), including ``nit``.  On
    the TPU backend, m>=3 solves whose ``max_iter`` does not already
    bound the kernel auto-apply it with a warning — this backend's
    measured depth fault is pure kernel runtime, independent of batch
    width (DESIGN.md known limitations; the batch API applies the same
    guard).  An explicitly passed value is always respected
    (``iter_chunk=max_iter`` forces one monolithic kernel).
    """
    if deprecated:
        warnings.warn(
            "The `deprecated` subproblem condition has no global-convergence "
            "proof; prefer the default condition.",
            stacklevel=2,
        )
    if check_every is not None:
        check_every = int(check_every)
        if check_every < 1:
            # A 0-step chunk would compile to an identity body inside
            # lax.while_loop — an un-interruptible device-side hang.
            raise ValueError(f"check_every must be >= 1, got {check_every}")
    start = _time.perf_counter()
    device_faulted = False  # set by the host-chunked driver's fault path

    x0_host = None if isinstance(x0, jax.Array) else np.asarray(x0)
    x0 = jnp.asarray(x0)
    if not jnp.issubdtype(x0.dtype, jnp.floating):
        x0 = x0.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    if params is not None:
        f_b, g_b, jac_b, prox_b = _bind_params(f, g, jac_f, prox_wsum_g, params)
    else:
        f_b, g_b, jac_b, prox_b = f, g, jac_f, prox_wsum_g
    # Only the objective count and the scalar-mode flag are consumed here;
    # each compiled program re-normalizes its own callables (make_step_for,
    # traced_init, traced_final) so params stay traced arguments.
    _, _, _, _, m, scalar_mode = _normalize_problem(
        f_b, g_b, jac_b, prox_b, x0
    )

    if check_every is None:
        # Out-of-the-box TPU latency (VERDICT r4 #6): the headline 27.7k
        # iter/s needs check_every>>1 (convergence checked once per chunk,
        # chunks software-pipelined by XLA), but the reference-compatible
        # default is per-iteration checking.  Auto-pick the tuned value on
        # the exact regime where the chunk-select driver guarantees
        # BITWISE-identical trajectories and nit (scalar fixed-step, no
        # history/verbose; pinned by tests/test_solver_scalar.py) and the
        # backend is TPU (on CPU the chunking gains nothing measurable and
        # per-iteration checking stops earliest).  Any explicit value is
        # always respected.
        check_every = (
            64
            if (
                m == 1
                and decay_rate == 1
                and not return_all
                and not verbose
                and iter_chunk is None
                and _default_backend() == "tpu"
            )
            else 1
        )

    # Scalar fixed-step solves with no per-iteration consumer of F skip the
    # objective evaluation in the hot loop (one of three matvecs on dense
    # problems) and recompute F once at the end; trajectories are
    # bitwise identical (see _make_step).
    skip_F = (
        decay_rate == 1 and m == 1 and not return_all and not verbose
    )
    # Straight-line step (no inner while_loops: fixed lr, closed-form scalar
    # subproblem) and no per-step side effects -> the while driver may run
    # check_every chunks unconditionally and select the first stop
    # afterwards, which XLA software-pipelines (see make_while_driver).
    # Only meaningful on the while driver with chunks; the step is then
    # built ``unguarded`` (no per-step y/t convergence freeze — the fold
    # restores it), which would be wrong for the plain while_loop or the
    # scan driver, hence the gating.
    chunk_select = (
        decay_rate == 1
        and m == 1
        and not verbose
        and not return_all
        and 1 < int(check_every) <= 256
        # ^ upper bound: chunk-select Python-unrolls the WHOLE chunk as
        # straight-line code (that is where its pipelining comes from);
        # throughput plateaus by check_every 64-128 (BENCHMARKS.md unroll
        # sweep) while compile time keeps growing with the unroll, so a
        # huge check_every must not emit a huge program.  Beyond the cap
        # the masked fori driver (device-side loop, unroll<=8) serves the
        # same bitwise-identical semantics at bounded compile cost.
    )
    if tol_rel < 0:
        raise ValueError(f"tol_rel must be >= 0, got {tol_rel}")
    if tol_internal_rel < 0:
        raise ValueError(
            f"tol_internal_rel must be >= 0, got {tol_internal_rel}"
        )
    if iter_chunk is not None and int(iter_chunk) < 1:
        raise ValueError(f"iter_chunk must be >= 1, got {iter_chunk}")
    if (
        iter_chunk is None
        and m >= 3
        and int(max_iter) > _TPU_M3_SINGLE_ITER_CHUNK
        and _default_backend() == "tpu"
    ):
        # Capacity auto-guard, single-solve side (the batch API applies
        # the same bound): the m>=3 semismooth-Newton dual's depth fault
        # is pure kernel runtime and width-INDEPENDENT (DESIGN.md known
        # limitations — a minutes-long monolithic while_loop faults the
        # device even at tiny widths), and the default max_iter=1e6 lets
        # a stalling solve run exactly such a kernel.  Explicitly passed
        # values are always respected (iter_chunk=max_iter forces one
        # monolithic kernel).
        iter_chunk = _TPU_M3_SINGLE_ITER_CHUNK
        warnings.warn(
            f"auto-applying iter_chunk={_TPU_M3_SINGLE_ITER_CHUNK}: with {m} "
            "objectives, a single device kernel running unbounded solver "
            "iterations exceeds this TPU backend's measured capacity "
            "(opaque device fault; DESIGN.md known limitations). Pass "
            "iter_chunk explicitly to choose the bound.",
            stacklevel=2,
        )
    if iter_chunk is not None and not return_all:
        iter_chunk = int(iter_chunk)
        if check_every > 1 and iter_chunk < int(max_iter):
            warnings.warn(
                "check_every > 1 is ignored when iter_chunk bounds the "
                "kernel (the host-chunked driver re-dispatches every "
                "iter_chunk steps).",
                stacklevel=2,
            )
            check_every = 1
            chunk_select = False
    opts = dict(
        tol=tol,
        tol_rel=float(tol_rel),
        tol_internal=tol_internal,
        tol_internal_rel=float(tol_internal_rel),
        max_iter_internal=int(max_iter_internal),
        max_backtrack_iter=int(max_backtrack_iter),
        warm_start=warm_start,
        decay_rate=decay_rate,
        nesterov=nesterov,
        nesterov_ratio=tuple(nesterov_ratio),
        deprecated=deprecated,
        verbose=verbose,
        adaptive_restart=bool(adaptive_restart),
        project_momentum=bool(project_momentum),
        track_objective=not skip_F,
        unguarded=chunk_select,
    )
    max_iter = int(max_iter)

    def make_step_for(p, template):
        """Build the step with ``p`` bound (a tracer when jitted, so operand
        data stays a program argument, never a baked-in constant)."""
        if params is not None:
            fb, gb, jacb, proxb = _bind_params(f, g, jac_f, prox_wsum_g, p)
        else:
            fb, gb, jacb, proxb = f, g, jac_f, prox_wsum_g
        fv, gv, jacv, proxv, _, _ = _normalize_problem(fb, gb, jacb, proxb, template)
        return _make_step(fv, gv, jacv, proxv, m, max_iter=max_iter, **opts)

    cache_key_base = (
        _callable_key(f),
        _callable_key(g),
        _callable_key(jac_f),
        _callable_key(prox_wsum_g),
        x0.shape,
        str(x0.dtype),
        _params_key(params),
        tuple(sorted(opts.items())),
        max_iter,
    )

    if verbose:
        hdr = ["niter", "nit int", "max|xk - yk|", "subprob func", "lr"]
        widths = [6, 8, 13, 13, 10]
        line = "|" + "|".join(h.center(w) for h, w in zip(hdr, widths)) + "|"
        print(line)
        print("|" + "|".join("-" * w for w in widths) + "|")

    def bound_fg(p):
        if params is not None:
            fb, gb, _, _ = _bind_params(f, g, jac_f, prox_wsum_g, p)
        else:
            fb, gb = f, g
        return fb, gb

    def traced_init(x0i: Array, lri: Array, p: Any) -> State:
        """Initial State with F(x0), staged into whichever program calls
        it (an eager F0 would dispatch each primitive separately —
        expensive per-op round trips on remote backends)."""
        fb, gb = bound_fg(p)
        fv, gv, _, _, _, _ = _normalize_problem(fb, gb, None, lambda w, x: x, x0i)
        return init_state(x0i, fv(x0i) + gv(x0i), m, lri)

    def traced_final(st: State, p: Any) -> State:
        """Recompute F(x) for skip_F runs, inside the same program."""
        if not skip_F:
            return st
        fb, gb = bound_fg(p)
        fv, gv, _, _, _, _ = _normalize_problem(fb, gb, None, lambda w, x: x, st.x)
        return st._replace(F_x=fv(st.x) + gv(st.x))

    if initial_state is not None:
        state = initial_state
    else:
        state = None  # fresh solves fold init into the driver program

    if return_all:
        if int(check_every) != 1:
            warnings.warn(
                "check_every > 1 is ignored when return_all=True (the scan "
                "driver records every iteration).",
                stacklevel=2,
            )
        chunk = int(history_chunk)
        if chunk < 1:
            # A 0-length scan records nothing and the host loop would
            # return a bogus never-ran "max iterations" result.
            raise ValueError(f"history_chunk must be >= 1, got {chunk}")
        if iter_chunk is not None:
            # Honor the kernel-runtime bound under return_all too: the
            # scan driver's per-call step count IS the effective
            # iter_chunk (same rule as the batch API under history).
            chunk = min(chunk, int(iter_chunk))

        def build_scan():
            def run(state: State, p):
                step = make_step_for(p, state.x)
                return make_scan_driver(step, max_iter, chunk)(state)

            return jax.jit(run)

        run_chunk = _cached_driver(("scan", chunk) + cache_key_base, build_scan)
        if state is None:
            init_run = _cached_driver(
                ("init",) + cache_key_base, lambda: jax.jit(traced_init)
            )
            state = init_run(x0, _device_scalar(lr, x0.dtype), params)
        if initial_state is not None:
            # Resumed run: the history head must be the RESUME iterate so
            # allvecs[k] and allfuns[k] stay paired (state.F_x is F at
            # state.x, not at the original x0).
            head_x = np.asarray(state.x)
        elif x0_host is not None:
            head_x = np.array(x0_host, dtype=np.dtype(x0.dtype))
        else:
            head_x = np.asarray(x0)
        xs_hist = [head_x[None]]
        fs_hist = [np.asarray(state.F_x)[None]]
        errs_hist = []
        while True:
            state, (xs, Fs, errs, rec) = run_chunk(state, params)
            rec_np = np.asarray(rec)
            n_rec = int(rec_np.sum())
            if n_rec:
                xs_hist.append(np.asarray(xs)[rec_np])
                fs_hist.append(np.asarray(Fs)[rec_np])
                errs_hist.append(np.asarray(errs)[rec_np])
            if not bool(_active(state, max_iter)) or n_rec == 0:
                break
        allvecs = list(np.concatenate(xs_hist, axis=0))
        allfuns_arr = np.concatenate(fs_hist, axis=0)
        allerrs = (
            list(np.concatenate(errs_hist, axis=0)) if errs_hist else []
        )
        if scalar_mode:
            allfuns = [float(v[0]) for v in allfuns_arr]
        else:
            allfuns = list(allfuns_arr)
    elif iter_chunk is not None and iter_chunk < max_iter:
        # Host-chunked driving: at most iter_chunk masked steps per device
        # call, looping on the host until inactive — bounds single-kernel
        # runtime (the m>=3 TPU depth fault; see the auto-guard above).
        # Bitwise identical to the monolithic while driver (frozen states
        # no-op), including nit.
        def build_chunk():
            def run(st: State, p: Any) -> State:
                step = make_step_for(p, st.x)
                return make_chunk_driver(step, max_iter, iter_chunk)(st)

            return jax.jit(run)

        run_chunk = _cached_driver(
            ("iterchunk", iter_chunk) + cache_key_base, build_chunk
        )
        if state is None:
            init_run = _cached_driver(
                ("init",) + cache_key_base, lambda: jax.jit(traced_init)
            )
            state = init_run(x0, _device_scalar(lr, x0.dtype), params)
        chunk_faulted = False
        while bool(_active(state, max_iter)):
            prev = state
            try:
                state = jax.block_until_ready(run_chunk(state, params))
            except jax.errors.JaxRuntimeError as exc:
                # Device fault mid-solve (m>=3 capacity modes are backend
                # weather, DESIGN.md).  Best-effort partial result from the
                # last completed chunk — the reference's error contract
                # (zfista/proximal_gradient.py:493-509) returns the last
                # good iterate with success=False.  If even the previous
                # state is unfetchable (device memory lost), re-raise.
                try:
                    prev_host = _device_get_global(prev)
                except Exception:
                    raise exc from None
                warnings.warn(
                    f"device fault after {int(prev_host.nit)} iterations — "
                    f"returning partial result (success=False). Original "
                    f"error: {type(exc).__name__}: {str(exc)[:200]}",
                    stacklevel=2,
                )
                # Stay OFF the device from here on: re-uploading or
                # dispatching on a wedged backend usually faults again
                # (review finding) — the partial state is numpy, which
                # the result packing below consumes as-is.
                state = prev_host._replace(failed=np.asarray(True))
                chunk_faulted = device_faulted = True
                break
        if skip_F:
            if chunk_faulted:
                # The carried F_x was never updated under skip_F, so NaN
                # is the honest objective for the partial result (numpy —
                # no post-fault device dispatch).
                state = state._replace(
                    F_x=np.full_like(np.asarray(state.F_x), np.nan)
                )
            else:
                final_run = _cached_driver(
                    ("final",) + cache_key_base, lambda: jax.jit(traced_final)
                )
                state = final_run(state, params)
        allvecs = allfuns = allerrs = None
    else:
        if state is None:
            # Fresh solve: init + while-loop + final-F as ONE compiled
            # program — a single dispatch per solve (round trips dominate
            # short solves on remote backends).
            def build_full():
                def run(x0i: Array, lri: Array, p: Any) -> State:
                    st = traced_init(x0i, lri, p)
                    step = make_step_for(p, st.x)
                    st = make_while_driver(
                        step, max_iter, int(check_every), chunk_select
                    )(st)
                    return traced_final(st, p)

                return jax.jit(run)

            run_full = _cached_driver(
                ("while_full", int(check_every)) + cache_key_base, build_full
            )
            # No block_until_ready: the device_get below forces completion,
            # and a separate block is one extra round trip per solve
            # (~35 ms through the tunnel, measured).
            state = run_full(x0, _device_scalar(lr, x0.dtype), params)
        else:

            def build_while():
                def run(st: State, p: Any) -> State:
                    step = make_step_for(p, st.x)
                    st = make_while_driver(
                        step, max_iter, int(check_every), chunk_select
                    )(st)
                    return traced_final(st, p)

                return jax.jit(run)

            run = _cached_driver(
                ("while", int(check_every)) + cache_key_base, build_while
            )
            state = run(state, params)  # device_get below is the sync point
        allvecs = allfuns = allerrs = None

    # One host transfer for everything (field-by-field conversion would
    # issue a device round trip per field); when the caller passed host
    # data, reuse their copy instead of fetching the uploaded x0 back.
    if x0_host is not None:
        host = _device_get_global(state)
        # Fresh copy: aliasing the caller's buffer would let a later
        # in-place mutation of their x0 silently rewrite res.x0.
        x0_res = np.array(x0_host, dtype=np.dtype(x0.dtype))
    else:
        host, x0_res = _device_get_global((state, x0))
    elapsed = _time.perf_counter() - start

    converged = bool(host.converged)
    failed = bool(host.failed)
    fun = host.F_x[0] if scalar_mode else host.F_x
    res = SolveResult(
        x0=x0_res,
        tol=tol,
        tol_rel=tol_rel,
        tol_internal=tol_internal,
        tol_internal_rel=tol_internal_rel,
        nesterov=nesterov,
        nesterov_ratio=nesterov_ratio,
        x=np.asarray(host.x),
        fun=np.asarray(fun),
        weight=np.asarray(host.w),
        nit=int(host.nit),
        nit_internal=int(host.nit_internal),
        lr=float(host.lr),
        error_criterion=float(host.err),
        time=elapsed,
        allvecs=allvecs,
        allfuns=allfuns,
        allerrs=allerrs,
        state=host,  # resumable carry (utils.checkpoint / initial_state)
    )
    if failed:
        res.success = False
        res.status = 2
        # A device fault is NOT a line-search failure — don't blame
        # backtracking for it (review finding; the batch API's partial
        # message got the same fix).
        res.message = (
            f"Error: device fault — partial result at iteration "
            f"{int(host.nit)} (success=False)."
            if device_faulted
            else TERMINATION_MESSAGES[2]
        )
    elif converged:
        res.success = True
        res.status = 1
        res.message = TERMINATION_MESSAGES[1]
    else:
        res.success = False
        res.status = 0
        res.message = TERMINATION_MESSAGES[0]
        warnings.warn(res.message, stacklevel=2)
    return res

r"""Vmapped scenario-batch solver: many solves as ONE device program.

The reference fans independent solves (different initial points, different
regularization weights) out to OS processes via ``joblib.Parallel``
(reference: benchmarks/benchmark.py:325-334, 341-351, 360-371).  On TPU the
idiomatic design is the opposite: put the scenario axis *inside* the program
with ``jax.vmap`` so one compiled ``lax.while_loop`` advances every lane at
once on the VPU/MXU, and let the batch axis shard across chips on a mesh
(:mod:`zfista_tpu.parallel.sharding`).

Key mechanics:

* Each lane carries its own full solver :class:`~zfista_tpu.core.solver.State`
  (learning rate, momentum, dual weights, convergence flags), so lanes
  diverge freely in *data* while sharing one program in *control flow*.
* The outer ``while_loop`` runs until **all** lanes are inactive
  (``jnp.any(active)`` consensus); finished lanes are frozen by a masked
  ``tree.map(where(active, new, old))`` — the same trick the sharded driver
  uses for cross-device accept/reject consensus.
* Per-lane problem parameters (e.g. a λ sweep) enter through
  ``batch_params``: a pytree whose leaves have a leading batch axis, passed
  as the second argument of ``f``/``g``/``jac_f``/``prox_wsum_g``.

History (``history=True``) records per-iteration objective values and the
error criterion (the quantities the reference's plots consume,
benchmarks/benchmark.py:78-249) without materializing per-iteration iterates.
"""

from __future__ import annotations

import time as _time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from zfista_tpu.core.result import TERMINATION_MESSAGES, SolveResult
from zfista_tpu.core.solver import (
    State,
    _active,
    _make_step,
    _normalize_problem,
    init_state,
)


class BatchResult(SolveResult):
    """A :class:`SolveResult` whose array fields carry a leading batch axis.

    ``to_list()`` explodes it into per-lane :class:`SolveResult` objects with
    the reference's per-solve semantics (for the metrics/benchmark layers,
    which consume lists of results: reference zfista/metrics.py:103-199).
    """

    def to_list(self) -> list[SolveResult]:
        n = len(self.x)
        out = []
        for i in range(n):
            r = SolveResult(
                x0=self.x0[i],
                x=self.x[i],
                fun=self.fun[i],
                weight=self.weight[i],
                nit=int(self.nit[i]),
                nit_internal=int(self.nit_internal[i]),
                lr=float(self.lr[i]),
                error_criterion=float(self.error_criterion[i]),
                success=bool(self.success[i]),
                status=int(self.status[i]),
                message=(
                    "Error: Backtracking failed to find a suitable stepsize."
                    if int(self.status[i]) == 2
                    else TERMINATION_MESSAGES.get(
                        int(self.status[i]), self.message
                    )
                ),
                time=self.time / n,  # amortized wall time per lane
                tol=self.tol,
                tol_internal=self.tol_internal,
                nesterov=self.nesterov,
                nesterov_ratio=self.nesterov_ratio,
            )
            if self.get("allfuns") is not None:
                mask = self.history_mask[i]
                r.allfuns = list(np.asarray(self.allfuns[i])[mask])
                r.allerrs = list(np.asarray(self.allerrs[i])[mask])
            out.append(r)
        return out


def _bind(fn: Callable, p: Any) -> Callable:
    if p is None:
        return fn
    return lambda x: fn(x, p)


def minimize_proximal_gradient_batch(
    f: Callable,
    g: Callable,
    jac_f: Callable | None,
    prox_wsum_g: Callable,
    x0s: Any,
    batch_params: Any = None,
    batch_nesterov_ratio: Any = None,
    lr: float = 1,
    tol: float = 1e-5,
    tol_internal: float = 1e-12,
    max_iter: int = 1000000,
    max_iter_internal: int = 100000,
    max_backtrack_iter: int = 100,
    warm_start: bool = False,
    decay_rate: float = 0.5,
    nesterov: bool = False,
    nesterov_ratio: tuple[float, float] = (0, 0.25),
    deprecated: bool = False,
    history: bool = False,
    history_chunk: int = 256,
    in_sharding: Any = None,
    check_every: int = 1,
    adaptive_restart: bool = False,
    project_momentum: bool = False,
    initial_states: State | None = None,
    keep_state: bool = True,
    iter_chunk: int | None = None,
) -> BatchResult:
    r"""Solve a batch of independent problems as one vmapped XLA program.

    ``x0s`` has shape ``(B, n)``.  When ``batch_params`` is given (a pytree
    with leading axis ``B``), the problem callables take it as a second
    argument: ``f(x, p)``, ``g(x, p)``, ``jac_f(x, p)``,
    ``prox_wsum_g(w, x, p)`` — this is how λ-sweeps and per-lane operators
    are expressed.  ``batch_nesterov_ratio`` (shape ``(B, 2)``) gives each
    lane its own momentum pair ``(a, b)`` — the (a,b)-sweep experiments of
    the reference papers as ONE device program (the reference runs a joblib
    process per pair, examples/PGM_experiment_with_various_a_b.ipynb).
    ``in_sharding`` (a ``jax.sharding.Sharding``) places the batch axis on
    a device mesh; everything else is sharding-agnostic.

    Returns a :class:`BatchResult`; per-solve views via ``.to_list()``.
    """
    start = _time.perf_counter()
    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n_features); got {x0s.shape}")
    if batch_nesterov_ratio is not None:
        # A per-lane momentum grid implies acceleration; running it with
        # nesterov=False would silently measure plain ISTA for every pair.
        nesterov = True
    if in_sharding is not None:
        x0s = jax.device_put(x0s, in_sharding)
        if initial_states is not None:
            initial_states = jax.tree.map(
                lambda a: jax.device_put(a, in_sharding), initial_states
            )
    if not jnp.issubdtype(x0s.dtype, jnp.floating):
        x0s = x0s.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    has_params = batch_params is not None
    p0 = (
        jax.tree.map(lambda a: jnp.asarray(a)[0], batch_params)
        if has_params
        else None
    )

    if has_params:
        prox0 = lambda w, x: prox_wsum_g(w, x, p0)
    else:
        prox0 = prox_wsum_g
    jac0 = _bind(jac_f, p0) if jac_f is not None else None
    _, _, _, _, m, scalar_mode = _normalize_problem(
        _bind(f, p0), _bind(g, p0), jac0, prox0, x0s[0]
    )

    static = dict(
        tol=tol,
        tol_internal=tol_internal,
        max_iter_internal=int(max_iter_internal),
        max_backtrack_iter=int(max_backtrack_iter),
        warm_start=warm_start,
        decay_rate=decay_rate,
        nesterov=nesterov,
        nesterov_ratio=tuple(nesterov_ratio),
        deprecated=deprecated,
        verbose=False,
        adaptive_restart=bool(adaptive_restart),
        project_momentum=bool(project_momentum),
    )
    max_iter = int(max_iter)

    def lane_init(x0, p):
        fp = _bind(f, p)
        gp = _bind(g, p)
        jacp = _bind(jac_f, p) if jac_f is not None else None
        proxp = (lambda w, x: prox_wsum_g(w, x, p)) if has_params else prox_wsum_g
        f_v, g_v, _, _, _, _ = _normalize_problem(fp, gp, jacp, proxp, x0)
        return init_state(x0, f_v(x0) + g_v(x0), m, lr)

    has_ab = batch_nesterov_ratio is not None
    ab_arr = (
        jnp.asarray(batch_nesterov_ratio, x0s.dtype)
        if has_ab
        else jnp.zeros((x0s.shape[0], 2), x0s.dtype)
    )
    if has_ab and ab_arr.shape != (x0s.shape[0], 2):
        raise ValueError(
            f"batch_nesterov_ratio must be (batch, 2); got {ab_arr.shape}"
        )

    def lane_step(state: State, p, ab) -> State:
        fp = _bind(f, p)
        gp = _bind(g, p)
        jacp = _bind(jac_f, p) if jac_f is not None else None
        proxp = (lambda w, x: prox_wsum_g(w, x, p)) if has_params else prox_wsum_g
        f_v, g_v, jac_v, prox_v, _, _ = _normalize_problem(fp, gp, jacp, proxp, x0s[0])
        opts = dict(static)
        if has_ab:
            # Traced per-lane momentum pair (see core.solver._make_step).
            opts["nesterov_ratio"] = (ab[0], ab[1])
        step = _make_step(f_v, g_v, jac_v, prox_v, m, **opts)
        active = _active(state, max_iter)
        new = step(state)
        return jax.tree.map(lambda a, b: jnp.where(active, a, b), new, state)

    if has_params:
        vinit = jax.vmap(lane_init)
        vstep = jax.vmap(lane_step, in_axes=(0, 0, 0))
        init_args = (x0s, batch_params)
        run_step = lambda s: vstep(s, batch_params, ab_arr)
    else:
        vinit = jax.vmap(lambda x0: lane_init(x0, None))
        vstep = jax.vmap(lambda s, ab: lane_step(s, None, ab), in_axes=(0, 0))
        init_args = (x0s,)
        run_step = lambda s: vstep(s, ab_arr)

    def any_active(states: State):
        return jnp.any(_active(states, max_iter))

    if history:
        chunk = int(history_chunk)

        def masked_scan_step(states: State, _):
            active = jax.vmap(partial(_active, max_iter=max_iter))(states)
            new = run_step(states)
            rec = active & ~new.failed
            return new, (new.F_x, new.err, rec)

        @jax.jit
        def run_chunk(states: State):
            return lax.scan(masked_scan_step, states, None, length=chunk)

        states = (
            initial_states
            if initial_states is not None
            else jax.jit(vinit)(*init_args)
        )
        f_hist, e_hist, m_hist = [], [], []
        while True:
            states, (Fs, errs, rec) = run_chunk(states)
            rec_np = np.asarray(rec)  # (chunk, B)
            f_hist.append(np.asarray(Fs))
            e_hist.append(np.asarray(errs))
            m_hist.append(rec_np)
            if not bool(np.asarray(any_active(states))) or not rec_np.any():
                break
        allfuns = np.concatenate(f_hist, axis=0).swapaxes(0, 1)  # (B, T, m)
        allerrs = np.concatenate(e_hist, axis=0).swapaxes(0, 1)  # (B, T)
        hist_mask = np.concatenate(m_hist, axis=0).swapaxes(0, 1)  # (B, T)
    else:

        if iter_chunk is not None:
            # Host-chunked driving: at most iter_chunk masked steps per
            # device call, looping on the host until all lanes finish.
            # Bounds single-kernel runtime — long monolithic while_loops
            # over heavy lanes can outlive the device watchdog ("TPU
            # device error" on ~20-minute kernels).  Bitwise identical to
            # the single-kernel path (frozen lanes no-op).
            K = int(iter_chunk)

            @jax.jit
            def run_chunk(states):
                return lax.fori_loop(0, K, lambda _, s: run_step(s), states)

            states = (
                initial_states
                if initial_states is not None
                else jax.jit(vinit)(*init_args)
            )
            while bool(np.asarray(any_active(states))):
                states = jax.block_until_ready(run_chunk(states))
            allfuns = allerrs = hist_mask = None
            elapsed = _time.perf_counter() - start
            return _pack_result(
                states,
                x0s,
                scalar_mode,
                elapsed,
                tol,
                tol_internal,
                nesterov,
                nesterov_ratio,
                allfuns,
                allerrs,
                hist_mask,
                keep_state,
            )

        @jax.jit
        def run(*args):
            states = vinit(*args) if initial_states is None else initial_states
            if check_every == 1:
                return lax.while_loop(any_active, run_step, states)
            # Amortize loop-trip overhead: the predicate (a cross-lane
            # any-reduce, an all-reduce under sharding) is evaluated every
            # check_every steps; lanes are masked per step, so results are
            # bitwise identical (see core.solver.make_while_driver).
            return lax.while_loop(
                any_active,
                lambda s: lax.fori_loop(
                    0,
                    int(check_every),
                    lambda _, c: run_step(c),
                    s,
                    unroll=min(int(check_every), 8),
                ),
                states,
            )

        states = jax.block_until_ready(run(*init_args))
        allfuns = allerrs = hist_mask = None

    elapsed = _time.perf_counter() - start
    return _pack_result(
        states,
        x0s,
        scalar_mode,
        elapsed,
        tol,
        tol_internal,
        nesterov,
        nesterov_ratio,
        allfuns,
        allerrs,
        hist_mask,
        keep_state,
    )


def _pack_result(
    states,
    x0s,
    scalar_mode,
    elapsed,
    tol,
    tol_internal,
    nesterov,
    nesterov_ratio,
    allfuns,
    allerrs,
    hist_mask,
    keep_state,
) -> BatchResult:
    converged = np.asarray(states.converged)
    failed = np.asarray(states.failed)
    status = np.where(failed, 2, np.where(converged, 1, 0)).astype(np.int32)
    fun = np.asarray(states.F_x)
    if scalar_mode:
        fun = fun[:, 0]
    res = BatchResult(
        x0=np.asarray(x0s),
        x=np.asarray(states.x),
        fun=fun,
        weight=np.asarray(states.w),
        nit=np.asarray(states.nit),
        nit_internal=np.asarray(states.nit_internal),
        lr=np.asarray(states.lr),
        error_criterion=np.asarray(states.err),
        success=converged & ~failed,
        status=status,
        message="batched solve",
        time=elapsed,
        tol=tol,
        tol_internal=tol_internal,
        nesterov=nesterov,
        nesterov_ratio=nesterov_ratio,
    )
    if allfuns is not None:
        res.allfuns = allfuns
        res.allerrs = allerrs
        res.history_mask = hist_mask
    if keep_state:
        # Resumable batched carry (utils.checkpoint round-trips it; pass
        # back via initial_states to continue bitwise-identically).  Costs
        # a device->host copy of ~2x the iterate batch (x and y) —
        # pass keep_state=False for huge-n sweeps that never checkpoint.
        res.state = jax.tree.map(np.asarray, states)
    else:
        res.state = None
    return res

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
benchmarks/benchmark.py:78-249); ``record_vecs=True`` additionally keeps the
per-iteration iterates, giving every lane the reference's full
``return_all`` triple (allvecs/allfuns/allerrs,
reference zfista/proximal_gradient.py:432-436, 546-549).
"""

from __future__ import annotations

import time as _time
import warnings
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
    _bind_params,
    _cached_driver,
    _callable_key,
    _make_step,
    _normalize_problem,
    _params_key,
    init_state,
)


#: Measured single-program lane-width capacity for m>=3 batches on this
#: TPU backend: the vmapped semismooth-Newton dual runs clean at B=1024
#: and hard-faults the device ("TPU device error") at B=1536 (round-3
#: on-chip isolation, DESIGN.md "Known limitations"; standalone repro in
#: tools/repro_m3_width_fault.py).  Batches wider than this auto-chunk.
#: The kernel-depth bound (_TPU_M3_SAFE_ITER_CHUNK = 50 outer iterations
#: per dispatched kernel) guards the width-INDEPENDENT runtime fault mode:
#: round-4 bisection found B=1000 full-depth faulted where B=512 ran
#: clean, and a B=256 batch whose lanes all ran to max_iter=3000 (a
#: minutes-long monolithic while_loop kernel) faulted too.  Both constants
#: live in core.solver (whose single-solve facade applies its own depth
#: guard) and are re-exported here for the tests that pin the guard.
from zfista_tpu.core.solver import (  # noqa: E402  (after docstring refs)
    _TPU_M3_SAFE_ITER_CHUNK,
    _TPU_M3_SAFE_LANES,
)


def _default_backend() -> str:
    """Backend name for the capacity auto-guard (indirection so tests can
    monkeypatch a 'tpu' answer on the hermetic CPU mesh)."""
    return jax.default_backend()


#: Result fields carrying a leading lane axis — the lane_chunk merge's
#: classification registry (see _lane_chunked_solve): an ndarray field of
#: chunk-width length must appear here to be concatenated across chunks.
_PER_LANE_RESULT_KEYS = frozenset(
    {
        "x0",
        "x",
        "fun",
        "weight",
        "nit",
        "nit_internal",
        "lr",
        "error_criterion",
        "success",
        "status",
        "nesterov_ratio",  # (B, 2) when the batch ran per-lane pairs
        "allfuns",
        "allerrs",
        "history_mask",
        "allvecs",
        "F0",
        "vec_head",
    }
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
                message=TERMINATION_MESSAGES.get(
                    int(self.status[i]), self.message
                ),
                time=self.time / n,  # amortized wall time per lane
                tol=self.tol,
                tol_rel=self.get("tol_rel", 0.0),
                tol_internal=self.tol_internal,
                tol_internal_rel=self.get("tol_internal_rel", 0.0),
                nesterov=self.nesterov,
                # (B, 2) when the batch ran per-lane momentum pairs
                nesterov_ratio=(
                    tuple(float(v) for v in self.nesterov_ratio[i])
                    if getattr(self.nesterov_ratio, "ndim", 0) == 2
                    else self.nesterov_ratio
                ),
            )
            if self.get("allfuns") is not None:
                mask = self.history_mask[i]
                funs = np.asarray(self.allfuns[i])[mask]
                scalar = np.ndim(self.fun[i]) == 0
                # Prepend F(x0) so histories align with the single-solve /
                # reference ``return_all`` format, whose allfuns[0] is the
                # initial value (reference proximal_gradient.py:432-436).
                if self.get("F0") is not None:
                    F0_i = np.asarray(self.F0[i])
                    r.allfuns = [float(F0_i[0]) if scalar else F0_i]
                else:
                    r.allfuns = []
                r.allfuns += [float(v[0]) if scalar else v for v in funs]
                r.allerrs = list(np.asarray(self.allerrs[i])[mask])
                if self.get("allvecs") is not None:
                    # History head: the iterate the run actually started
                    # from — x0 for fresh solves, the resume iterate for
                    # initial_states runs (so the head pair matches
                    # allfuns[0]/F0, mirroring the single-solve path).
                    head = (
                        np.asarray(self.vec_head[i])
                        if self.get("vec_head") is not None
                        else np.asarray(self.x0[i])
                    )
                    r.allvecs = [head] + list(
                        np.asarray(self.allvecs[i])[mask]
                    )
            out.append(r)
        return out


def _host_array(a: Any) -> np.ndarray:
    """Device array -> host numpy, gathering across processes when the
    array is globally sharded (multi-process runs own only local shards;
    ``np.asarray`` alone raises on non-fully-addressable arrays).
    Delegates to the solver's :func:`_device_get_global` so the
    addressable/replicated/sharded decision lives in exactly one place."""
    from zfista_tpu.core.solver import _device_get_global

    return np.asarray(_device_get_global(a))


def _lane_chunked_solve(
    f,
    g,
    jac_f,
    prox_wsum_g,
    x0s,
    *,
    batch_params,
    batch_nesterov_ratio,
    initial_states,
    lane_chunk,
    keep_state,
    start,
    solver_kwargs,
) -> "BatchResult":
    """Run :func:`minimize_proximal_gradient_batch` in batch-axis chunks of
    ``lane_chunk`` lanes and concatenate the per-lane results.

    Every chunk is PADDED to exactly ``lane_chunk`` lanes (duplicating its
    first lane) so all device calls share ONE compiled program — a ragged
    tail chunk would retrace+recompile from scratch.  Padded lanes are
    trimmed before concatenation, so the merged result is lane-for-lane
    what the unchunked call returns (pinned by tests/test_batch.py).

    This is the device-capacity workaround for very wide m>=3 batches:
    the vmapped semismooth-Newton dual program faults this TPU backend
    past a SESSION-DEPENDENT width (DESIGN.md known limitations — r3
    measured B=1024 clean / B=1536 faulting; r5 measured B=1024 faulting
    while B=512 ran clean repeatedly, and the guard width is 512).  Do
    not treat any historical width as current fact; consult
    ``_TPU_M3_SAFE_LANES`` and the latest BENCH_r{N}.json
    ``m3_fault_probe`` record.
    """
    B = int(x0s.shape[0])
    K = int(lane_chunk)

    # Host copies ONCE, outside the per-chunk loop: np.asarray inside the
    # chunk loop would re-transfer every device-resident input leaf B/K
    # times (a 15-chunk sweep would pay 15 full device->host copies).
    x0s = np.asarray(x0s)
    batch_params = jax.tree.map(np.asarray, batch_params)
    batch_nesterov_ratio = (
        None
        if batch_nesterov_ratio is None
        else np.asarray(batch_nesterov_ratio)
    )
    initial_states = (
        None
        if initial_states is None
        else jax.tree.map(np.asarray, initial_states)
    )

    def _cut(tree, s, e):
        pad = K - (e - s)

        def one(a):
            seg = a[s:e]
            if pad:
                seg = np.concatenate([seg, np.repeat(seg[:1], pad, axis=0)])
            return seg

        return jax.tree.map(one, tree)

    def _failed_part(template: "BatchResult", s: int, e: int) -> "BatchResult":
        """Synthesize a chunk result marking every lane failed (status=2,
        x = x0, NaN objective) with the SAME field schema as a solved
        chunk, so the merge below concatenates it lane-for-lane.  This is
        the batch analog of the reference's partial-result contract
        (reference zfista/proximal_gradient.py:493-509: any error returns
        the last good iterate with success=False) for device faults that
        kill a whole chunk dispatch."""
        x0_chunk = _cut(x0s, s, e)
        part = BatchResult()
        for key, v in template.items():
            if key == "state":
                part[key] = None
            elif key in ("x0", "x", "vec_head"):
                part[key] = np.array(x0_chunk)
            elif (
                key == "nesterov_ratio"
                and batch_nesterov_ratio is not None
                and isinstance(v, np.ndarray)
            ):
                # The failed lanes' momentum pairs are INPUTS, not solver
                # outputs — report the real values, not NaN fill.
                part[key] = np.array(_cut(batch_nesterov_ratio, s, e))
            elif isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == K:
                shape = (K,) + (
                    ((0,) + v.shape[2:])
                    if key in ("allfuns", "allerrs", "history_mask", "allvecs")
                    else v.shape[1:]
                )
                if key == "success":
                    part[key] = np.zeros(shape, v.dtype)
                elif key == "status":
                    part[key] = np.full(shape, 2, v.dtype)
                elif key in ("nit", "nit_internal"):
                    part[key] = np.zeros(shape, v.dtype)
                elif key == "error_criterion":
                    part[key] = np.full(shape, np.inf, v.dtype)
                elif v.dtype == np.bool_:
                    part[key] = np.zeros(shape, v.dtype)
                elif np.issubdtype(v.dtype, np.floating):
                    part[key] = np.full(shape, np.nan, v.dtype)
                else:
                    part[key] = np.zeros(shape, v.dtype)
            else:
                part[key] = v
        return part

    parts: list[BatchResult] = []
    counts: list[int] = []
    fault: Exception | None = None
    fault_lane = B
    for s in range(0, B, K):
        e = min(s + K, B)
        if fault is None:
            try:
                part = minimize_proximal_gradient_batch(
                    f,
                    g,
                    jac_f,
                    prox_wsum_g,
                    _cut(x0s, s, e),
                    batch_params=(
                        None if batch_params is None else _cut(batch_params, s, e)
                    ),
                    batch_nesterov_ratio=(
                        None
                        if batch_nesterov_ratio is None
                        else _cut(batch_nesterov_ratio, s, e)
                    ),
                    initial_states=(
                        None if initial_states is None else _cut(initial_states, s, e)
                    ),
                    keep_state=keep_state,
                    **solver_kwargs,
                )
            except jax.errors.JaxRuntimeError as exc:
                if s == 0:
                    # No solved chunk to take the result schema from (and
                    # nothing to salvage) — propagate.
                    raise
                # Device fault mid-batch (the m>=3 capacity modes are
                # session-dependent, DESIGN.md known limitations).  Keep
                # every chunk already solved; mark this chunk AND all
                # remaining lanes failed WITHOUT further dispatches — on
                # the measured backend a post-fault dispatch in the same
                # process usually faults again.
                fault = exc
                fault_lane = s
                part = _failed_part(parts[0], s, e)
        else:
            part = _failed_part(parts[0], s, e)
        parts.append(part)
        counts.append(e - s)

    if fault is not None:
        warnings.warn(
            f"device fault at lane chunk [{fault_lane}:{B}] — returning "
            f"partial results: lanes 0:{fault_lane} solved, lanes "
            f"{fault_lane}:{B} marked status=2 (x = x0, fun = NaN). "
            f"Original error: {type(fault).__name__}: {str(fault)[:200]}",
            stacklevel=3,
        )

    first = parts[0]
    # Histories: chunks stop at different iteration counts, so pad every
    # history array to the longest T before joining on the lane axis.
    # Padded steps carry history_mask=False, so ``to_list`` (which filters
    # on the mask) never surfaces the filler.
    hist_keys = {"allfuns", "allerrs", "history_mask", "allvecs"}
    T = (
        max(np.asarray(p.allfuns).shape[1] for p in parts)
        if first.get("allfuns") is not None
        else 0
    )

    def cat(key, hist):
        segs = []
        for p, c in zip(parts, counts):
            a = np.asarray(p[key])[:c]
            if hist and a.shape[1] < T:
                widths = [(0, 0), (0, T - a.shape[1])]
                widths += [(0, 0)] * (a.ndim - 2)
                fill = False if a.dtype == np.bool_ else np.nan
                a = np.pad(a, widths, constant_values=fill)
            segs.append(a)
        return np.concatenate(segs, axis=0)

    # SHAPE-driven merge (not a hard-coded field list): every per-lane
    # ndarray field of the part results — whatever _pack_result emits now
    # or grows later — is concatenated lane-for-lane; scalar/global fields
    # are taken from the first part.  A name list here would silently drop
    # future per-lane fields from chunked results only.  The registry
    # check below is the inverse safety net (round-3 advisor finding): a
    # future GLOBAL ndarray field whose length coincidentally equals the
    # chunk width must not be silently concatenated — growing the result
    # schema requires classifying the field here.
    res = BatchResult()
    for key, v in first.items():
        if key == "state":
            continue
        if isinstance(v, np.ndarray) and v.ndim >= 1 and len(v) == K:
            if key not in _PER_LANE_RESULT_KEYS:
                raise RuntimeError(
                    f"lane_chunk merge: result field {key!r} is an ndarray "
                    "of chunk-width length but is not registered as "
                    "per-lane; add it to _PER_LANE_RESULT_KEYS (if it has "
                    "a leading lane axis) or keep global fields non-array"
                )
            res[key] = cat(key, key in hist_keys)
        else:
            res[key] = v
    res.time = _time.perf_counter() - start
    if fault is not None:
        res.message = (
            f"partial: device fault — lanes {fault_lane}:{B} not solved "
            f"(status=2, x = x0): {type(fault).__name__}: {str(fault)[:160]}"
        )
    if keep_state and first.get("state") is not None and fault is None:
        res.state = jax.tree.map(
            lambda *ls: np.concatenate(
                [np.asarray(a)[:c] for a, c in zip(ls, counts)], axis=0
            ),
            *[p.state for p in parts],
        )
    else:
        # No resumable carry after a fault: the failed chunks have no
        # device state to resume from (and mixing real and synthetic
        # carries would resume the failed lanes from garbage).
        res.state = None
    return res


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
    deprecated: bool = False,
    history: bool = False,
    history_chunk: int = 256,
    record_vecs: bool = False,
    in_sharding: Any = None,
    check_every: int = 1,
    adaptive_restart: bool = False,
    project_momentum: bool = False,
    initial_states: State | None = None,
    keep_state: bool = True,
    iter_chunk: int | None = None,
    lane_chunk: int | None = None,
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

    ``history=True`` records per-iteration ``allfuns``/``allerrs``;
    ``record_vecs=True`` additionally records per-iteration iterates
    (``allvecs``, the reference's full ``return_all``) at a memory cost of
    ``history_chunk x B x n`` floats per device chunk.

    Returns a :class:`BatchResult`; per-solve views via ``.to_list()``.

    ``lane_chunk`` bounds how many lanes one device program carries: the
    batch is split into identically-shaped (tail-padded) chunks of
    ``lane_chunk`` lanes — all sharing ONE compiled program — and the
    results are concatenated lane-for-lane.  This is the device-capacity
    workaround for very wide m>=3 batches (the vmapped semismooth-Newton
    dual faults this TPU backend above ~1024 lanes, DESIGN.md known
    limitations) and a kernel-runtime bound for heavy sweeps.  It is a
    single-process knob: combining it with ``in_sharding`` raises.
    **Capacity auto-guard**: on the TPU backend, m>=3 batches auto-apply
    the knobs the backend's measured fault modes require, with a warning
    naming what was chosen: ``lane_chunk=1024`` when the batch is wider
    than 1024 lanes (one program past that width faults the device
    regardless of kernel length), and ``iter_chunk=50`` whenever
    ``max_iter`` does not already bound the kernel (long-running
    monolithic kernels fault the device at ANY width — a B=256 batch
    running minutes-long faulted where ``iter_chunk=50`` runs clean).
    Explicitly passed values are always respected —
    ``lane_chunk=len(x0s), iter_chunk=max_iter`` forces one unchunked
    program.

    ``iter_chunk`` bounds how many solver iterations one device kernel
    runs (the kernel-runtime guard for heavy lanes); with ``history=True``
    the scan driver's per-call step count becomes
    ``min(history_chunk, iter_chunk)``, so the bound is honored on every
    driver.  ``tol_rel`` adds the opt-in iterate-scaled convergence term
    and ``tol_internal_rel`` the opt-in objective-scaled line-search
    accept slack (both default 0 — reference behavior; see
    :func:`zfista_tpu.minimize_proximal_gradient`).

    **Freeze contract** (same as the single-solve facade): repeat batch
    solves with the same callables, shapes and options reuse one compiled
    program, so the callables must be pure and frozen — per-solve data
    rides in ``x0s``/``batch_params``/``batch_nesterov_ratio``, never in
    mutated closures.
    """
    start = _time.perf_counter()
    x0s = jnp.asarray(x0s)
    if x0s.ndim != 2:
        raise ValueError(f"x0s must be (batch, n_features); got {x0s.shape}")
    if tol_rel < 0:
        raise ValueError(f"tol_rel must be >= 0, got {tol_rel}")
    if tol_internal_rel < 0:
        raise ValueError(
            f"tol_internal_rel must be >= 0, got {tol_internal_rel}"
        )
    # Normalize the GLOBAL momentum pair to a tuple up front: an
    # array-valued (a, b) would be stored in results as an ndarray, and an
    # ndarray of length == lane_chunk would be wrongly concatenated by the
    # chunk merge's per-lane registry ('nesterov_ratio' is registered for
    # the (B, 2) per-lane form; the global form must stay non-array).
    # Tuples/lists keep their elements as-is (the momentum sweep passes
    # exact Fractions); only arrays are converted.
    if isinstance(nesterov_ratio, (np.ndarray, jax.Array)):
        nesterov_ratio = tuple(np.asarray(nesterov_ratio).ravel().tolist())
    else:
        nesterov_ratio = tuple(nesterov_ratio)
    if len(nesterov_ratio) != 2:
        raise ValueError(
            f"nesterov_ratio must be a pair (a, b); got {nesterov_ratio!r}"
        )
    if not jnp.issubdtype(x0s.dtype, jnp.floating):
        x0s = x0s.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    has_params = batch_params is not None
    # Probe the objective count ABSTRACTLY (shape/dtype only): no data is
    # touched, so globally-sharded multi-process inputs never need an eager
    # gather or a closure over non-addressable shards.
    x_tmpl = jax.ShapeDtypeStruct(x0s.shape[1:], x0s.dtype)
    if has_params:
        p_tmpl = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(
                np.shape(a)[1:],
                a.dtype if hasattr(a, "dtype") else np.asarray(a).dtype,
            ),
            batch_params,
        )
        out_shape = jax.eval_shape(lambda x, p: f(x, p), x_tmpl, p_tmpl)
    else:
        out_shape = jax.eval_shape(f, x_tmpl)
    scalar_mode = out_shape.shape == ()
    m = 1 if scalar_mode else out_shape.shape[0]

    if m >= 3 and in_sharding is None and _default_backend() == "tpu":
        # Capacity auto-guard for the vmapped m>=3 semismooth-Newton dual,
        # which hard-faults this TPU backend with an opaque "TPU device
        # error" in two measured modes (DESIGN.md "Known limitations";
        # standalone repro: tools/repro_m3_width_fault.py):
        #   width  — one program wider than ~1024 lanes faults regardless
        #            of kernel length -> chunk the lane axis;
        #   depth  — a long-running monolithic while_loop kernel faults at
        #            ANY width (round-4 bisection: B=1000 full-depth
        #            faulted where iter_chunk=50 ran clean; a B=256 batch
        #            with all lanes at max_iter=3000 — a minutes-long
        #            kernel — faulted too) -> bound every kernel's step
        #            count unless max_iter already bounds it.
        # Both knobs are parity-preserving (the chunked drivers are
        # bitwise the monolithic one, test-pinned); explicitly passed
        # values are always respected.
        applied = []
        if lane_chunk is None and int(x0s.shape[0]) > _TPU_M3_SAFE_LANES:
            lane_chunk = _TPU_M3_SAFE_LANES
            applied.append(f"lane_chunk={_TPU_M3_SAFE_LANES}")
        if iter_chunk is None and int(max_iter) > _TPU_M3_SAFE_ITER_CHUNK:
            iter_chunk = _TPU_M3_SAFE_ITER_CHUNK
            applied.append(f"iter_chunk={_TPU_M3_SAFE_ITER_CHUNK}")
        if applied:
            warnings.warn(
                f"auto-applying {' and '.join(applied)}: with {m} "
                "objectives, a single program wider than "
                f"{_TPU_M3_SAFE_LANES} lanes OR running more than "
                f"~{_TPU_M3_SAFE_ITER_CHUNK} unbounded solver iterations "
                "per dispatched kernel exceeds this TPU backend's measured "
                "capacity (opaque device fault; DESIGN.md known "
                "limitations). Pass lane_chunk/iter_chunk explicitly to "
                "choose the bounds (explicit values are respected).",
                stacklevel=2,
            )
    if lane_chunk is not None:
        if int(lane_chunk) < 1:
            raise ValueError(f"lane_chunk must be >= 1; got {lane_chunk}")
        if in_sharding is not None:
            # Checked whenever lane_chunk is passed (not only when it
            # actually splits): the documented contract is "raises if
            # combined", and a B-dependent raise would let a probe pass
            # at small B then explode on the production batch.
            raise ValueError(
                "lane_chunk cannot be combined with in_sharding: "
                "chunking is a single-process device-capacity knob — "
                "shard OR chunk the batch axis, not both"
            )
        if int(lane_chunk) < int(x0s.shape[0]):
            return _lane_chunked_solve(
                f,
                g,
                jac_f,
                prox_wsum_g,
                x0s,
                batch_params=batch_params,
                batch_nesterov_ratio=batch_nesterov_ratio,
                initial_states=initial_states,
                lane_chunk=int(lane_chunk),
                keep_state=keep_state,
                start=start,
                solver_kwargs=dict(
                    lr=lr,
                    tol=tol,
                    tol_rel=tol_rel,
                    tol_internal=tol_internal,
                    tol_internal_rel=tol_internal_rel,
                    max_iter=max_iter,
                    max_iter_internal=max_iter_internal,
                    max_backtrack_iter=max_backtrack_iter,
                    warm_start=warm_start,
                    decay_rate=decay_rate,
                    nesterov=nesterov,
                    nesterov_ratio=nesterov_ratio,
                    deprecated=deprecated,
                    history=history,
                    history_chunk=history_chunk,
                    record_vecs=record_vecs,
                    check_every=check_every,
                    adaptive_restart=adaptive_restart,
                    project_momentum=project_momentum,
                    iter_chunk=iter_chunk,
                ),
            )
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

    if record_vecs:
        history = True  # iterate recording rides the history scan driver
    # Scalar fixed-step batches with no history consumer skip the
    # per-iteration F evaluation (one of three matvecs on dense problems)
    # and recompute F once after the loop — trajectories are bitwise
    # identical (see core.solver._make_step track_objective).
    skip_F = decay_rate == 1 and m == 1 and not history
    static = dict(
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
        verbose=False,
        adaptive_restart=bool(adaptive_restart),
        project_momentum=bool(project_momentum),
        track_objective=not skip_F,
    )
    max_iter = int(max_iter)

    def _lane_callables(p):
        """Bind this lane's params — the single shared binding convention
        (core.solver._bind_params); identity when the batch has none."""
        if not has_params:
            return f, g, jac_f, prox_wsum_g
        return _bind_params(f, g, jac_f, prox_wsum_g, p)

    def lane_init(x0, p):
        fp, gp, jacp, proxp = _lane_callables(p)
        f_v, g_v, _, _, _, _ = _normalize_problem(fp, gp, jacp, proxp, x0)
        return init_state(x0, f_v(x0) + g_v(x0), m, lr)

    has_ab = batch_nesterov_ratio is not None
    # When no per-lane momentum is used the placeholder stays a host numpy
    # array: passed through ``step_args`` it is uploaded uncommitted, which
    # keeps the non-ab path valid under multi-process meshes (a
    # device-committed placeholder would conflict with global inputs).
    ab_arr = (
        jnp.asarray(batch_nesterov_ratio, x0s.dtype)
        if has_ab
        else np.zeros((x0s.shape[0], 2), np.dtype(x0s.dtype))
    )
    if has_ab and ab_arr.shape != (x0s.shape[0], 2):
        raise ValueError(
            f"batch_nesterov_ratio must be (batch, 2); got {ab_arr.shape}"
        )

    def lane_step(state: State, p, ab) -> State:
        fp, gp, jacp, proxp = _lane_callables(p)
        # state.x is this lane's tracer — shape/dtype template only (a
        # closure over x0s[0] would capture non-addressable global shards).
        f_v, g_v, jac_v, prox_v, _, _ = _normalize_problem(
            fp, gp, jacp, proxp, state.x
        )
        opts = dict(static)
        if has_ab:
            # Traced per-lane momentum pair (see core.solver._make_step).
            opts["nesterov_ratio"] = (ab[0], ab[1])
        step = _make_step(f_v, g_v, jac_v, prox_v, m, **opts)
        active = _active(state, max_iter)
        new = step(state)
        return jax.tree.map(lambda a, b: jnp.where(active, a, b), new, state)

    # Per-step data (lane params, momentum pairs) is threaded through the
    # jitted drivers as ARGUMENTS, never closures: a closure would embed the
    # batch as a program constant (slow for big operands, and outright
    # disallowed for globally-sharded multi-process arrays).
    if has_params:
        vinit = jax.vmap(lane_init)
        vstep = jax.vmap(lane_step, in_axes=(0, 0, 0))
        init_args = (x0s, batch_params)
        run_step = lambda s, bp, ab: vstep(s, bp, ab)
        step_args = (batch_params, ab_arr)
    else:
        vinit = jax.vmap(lambda x0: lane_init(x0, None))
        vstep = jax.vmap(lambda s, ab: lane_step(s, None, ab), in_axes=(0, 0))
        init_args = (x0s,)
        run_step = lambda s, ab: vstep(s, ab)
        step_args = (ab_arr,)

    # Compiled-driver cache (same design + freeze contract as the
    # single-solve facade, core.solver._DRIVER_CACHE): repeat batch solves
    # with the same callables/shapes/options reuse one traced+compiled
    # program instead of retracing per call — retracing a 1000-lane vmapped
    # while_loop costs seconds on the host, and per-pair timed sweeps
    # (bench.momentum_sweep measure_times) would otherwise recompile 15x.
    cache_key_base = (
        "batch",
        _callable_key(f),
        _callable_key(g),
        _callable_key(jac_f),
        _callable_key(prox_wsum_g),
        x0s.shape,
        str(x0s.dtype),
        _params_key(batch_params),
        has_ab,
        tuple(sorted(static.items())),
        max_iter,
        in_sharding,
        # lr is baked into the lane_init closure (init_state's starting
        # stepsize), not passed as a program argument — omitting it here
        # silently reused the first call's compiled program (and its lr)
        # for a later solve with a different lr.
        float(lr),
    )
    vinit_j = _cached_driver(
        ("init",) + cache_key_base, lambda: jax.jit(vinit)
    )

    def finalize_F(states: State) -> State:
        """Recompute F(x) for skip_F runs (one batched eval; vinit already
        computes F at its argument, so reuse its compiled program)."""
        if not skip_F:
            return states
        fresh = vinit_j(states.x, *init_args[1:])
        return states._replace(F_x=fresh.F_x)

    def any_active(states: State):
        return jnp.any(_active(states, max_iter))

    check_every = int(check_every)
    if check_every < 1:
        # A 0-step chunk is an identity while_loop body: device-side hang.
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    if iter_chunk is not None:
        if int(iter_chunk) < 1:
            # A 0-step chunk program is the identity: the host loop would
            # re-dispatch no-op kernels forever (same guard as check_every).
            raise ValueError(f"iter_chunk must be >= 1, got {iter_chunk}")
        if check_every != 1 and not history:
            warnings.warn(
                "check_every > 1 is ignored when iter_chunk is set (the "
                "chunked driver runs plain masked steps and re-checks "
                "between chunks).",
                stacklevel=2,
            )
    if history:
        if check_every != 1:
            warnings.warn(
                "check_every > 1 is ignored when history=True (the scan "
                "driver records every iteration).",
                stacklevel=2,
            )
        chunk = int(history_chunk)
        if chunk < 1:
            # scan(length=0) returns the init carry with empty outputs:
            # the history loop would break immediately and report a bogus
            # never-ran result (same guard as the single-solve facade,
            # core.solver history_chunk validation).
            raise ValueError(f"history_chunk must be >= 1, got {history_chunk}")
        if iter_chunk is not None:
            # Honor the kernel-runtime bound under history too: the scan
            # driver's per-call step count IS the effective iter_chunk.
            # (Round-3 verdict: passing both silently dropped the runtime
            # bound — the one fault-relevant gap in the option surface.)
            chunk = min(chunk, int(iter_chunk))

        def build_hist_chunk():
            def run_chunk(states: State, *sa):
                def masked_scan_step(states: State, _):
                    active = jax.vmap(partial(_active, max_iter=max_iter))(
                        states
                    )
                    new = run_step(states, *sa)
                    rec = active & ~new.failed
                    out = (new.F_x, new.err, rec)
                    if record_vecs:
                        out = out + (new.x,)
                    return new, out

                return lax.scan(masked_scan_step, states, None, length=chunk)

            return jax.jit(run_chunk)

        run_chunk = _cached_driver(
            ("hist", chunk, record_vecs) + cache_key_base, build_hist_chunk
        )

        states = (
            initial_states
            if initial_states is not None
            else vinit_j(*init_args)
        )
        # Initial value F(x0) (or the resume point's value): prepended to
        # each lane's history by ``to_list`` for reference return_all parity.
        F0_all = _host_array(states.F_x)
        # Matching history-head iterate for allvecs (resume runs start from
        # states.x, not x0s; fresh runs leave this None -> to_list uses x0).
        vec_head = (
            _host_array(states.x)
            if (record_vecs and initial_states is not None)
            else None
        )
        f_hist, e_hist, m_hist, x_hist = [], [], [], []
        while True:
            states, outs = run_chunk(states, *step_args)
            Fs, errs, rec = outs[:3]
            rec_np = _host_array(rec)  # (chunk, B)
            f_hist.append(_host_array(Fs))
            e_hist.append(_host_array(errs))
            m_hist.append(rec_np)
            if record_vecs:
                x_hist.append(_host_array(outs[3]))
            if not bool(np.asarray(any_active(states))) or not rec_np.any():
                break
        allfuns = np.concatenate(f_hist, axis=0).swapaxes(0, 1)  # (B, T, m)
        allerrs = np.concatenate(e_hist, axis=0).swapaxes(0, 1)  # (B, T)
        hist_mask = np.concatenate(m_hist, axis=0).swapaxes(0, 1)  # (B, T)
        allvecs = (
            np.concatenate(x_hist, axis=0).swapaxes(0, 1) if record_vecs else None
        )  # (B, T, n)
    else:

        if iter_chunk is not None:
            # Host-chunked driving: at most iter_chunk masked steps per
            # device call, looping on the host until all lanes finish.
            # Bounds single-kernel runtime — long monolithic while_loops
            # over heavy lanes can outlive the device watchdog ("TPU
            # device error" on ~20-minute kernels).  Bitwise identical to
            # the single-kernel path (frozen lanes no-op).
            K = int(iter_chunk)

            run_chunk = _cached_driver(
                ("iterchunk", K) + cache_key_base,
                lambda: jax.jit(
                    lambda states, *sa: lax.fori_loop(
                        0, K, lambda _, s: run_step(s, *sa), states
                    )
                ),
            )

            states = (
                initial_states
                if initial_states is not None
                else vinit_j(*init_args)
            )
            while bool(np.asarray(any_active(states))):
                states = jax.block_until_ready(run_chunk(states, *step_args))
            states = finalize_F(states)
            elapsed = _time.perf_counter() - start
            return _pack_result(
                states,
                x0s,
                scalar_mode,
                elapsed,
                tol,
                tol_internal,
                nesterov,
                _host_array(ab_arr) if has_ab else nesterov_ratio,
                None,
                None,
                None,
                keep_state,
                tol_rel=tol_rel,
                tol_internal_rel=tol_internal_rel,
            )

        def drive(states, *sa):
            body = lambda s: run_step(s, *sa)
            if check_every == 1:
                return lax.while_loop(any_active, body, states)
            # Amortize loop-trip overhead: the predicate (a cross-lane
            # any-reduce, an all-reduce under sharding) is evaluated every
            # check_every steps; lanes are masked per step, so results are
            # bitwise identical (see core.solver.make_while_driver).
            return lax.while_loop(
                any_active,
                lambda s: lax.fori_loop(
                    0,
                    int(check_every),
                    lambda _, c: body(c),
                    s,
                    unroll=min(int(check_every), 8),
                ),
                states,
            )

        def traced_finalize(states, *sa):
            if not skip_F:
                return states
            fresh = (
                vinit(states.x, sa[0]) if has_params else vinit(states.x)
            )
            return states._replace(F_x=fresh.F_x)

        # Init + while-loop + final-F as ONE jitted program (fresh solves)
        # — a single device dispatch per batch solve; round trips are
        # ~tens of ms each on remote backends (see core.solver).
        def build_run_full():
            def run_full(x0s_in, *sa):
                states = (
                    vinit(x0s_in, sa[0]) if has_params else vinit(x0s_in)
                )
                return traced_finalize(drive(states, *sa), *sa)

            return jax.jit(run_full)

        def build_run_resume():
            return jax.jit(
                lambda states, *sa: traced_finalize(drive(states, *sa), *sa)
            )

        # Build only the driver this call uses: fresh solves never call
        # run_resume and resumed solves never call run_full — materializing
        # both would burn two FIFO cache slots per configuration and evict
        # hot programs twice as fast in sweep workloads.
        if initial_states is not None:
            run_resume = _cached_driver(
                ("while", check_every, "resume") + cache_key_base,
                build_run_resume,
            )
            states = jax.block_until_ready(
                run_resume(initial_states, *step_args)
            )
        else:
            run_full = _cached_driver(
                ("while", check_every, "full") + cache_key_base, build_run_full
            )
            states = jax.block_until_ready(run_full(x0s, *step_args))
        allfuns = allerrs = hist_mask = allvecs = None
        F0_all = None
        vec_head = None

    elapsed = _time.perf_counter() - start
    return _pack_result(
        states,
        x0s,
        scalar_mode,
        elapsed,
        tol,
        tol_internal,
        nesterov,
        # Per-lane momentum pairs (an (a,b)-sweep) become a (B, 2) field so
        # to_list() can report each lane's ACTUAL pair — previously every
        # lane claimed the global default.
        _host_array(ab_arr) if has_ab else nesterov_ratio,
        allfuns,
        allerrs,
        hist_mask,
        keep_state,
        allvecs=allvecs,
        F0=F0_all,
        vec_head=vec_head,
        tol_rel=tol_rel,
        tol_internal_rel=tol_internal_rel,
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
    allvecs=None,
    F0=None,
    vec_head=None,
    tol_rel=0.0,
    tol_internal_rel=0.0,
) -> BatchResult:
    converged = _host_array(states.converged)
    failed = _host_array(states.failed)
    status = np.where(failed, 2, np.where(converged, 1, 0)).astype(np.int32)
    fun = _host_array(states.F_x)
    if scalar_mode:
        fun = fun[:, 0]
    res = BatchResult(
        x0=_host_array(x0s),
        x=_host_array(states.x),
        fun=fun,
        weight=_host_array(states.w),
        nit=_host_array(states.nit),
        nit_internal=_host_array(states.nit_internal),
        lr=_host_array(states.lr),
        error_criterion=_host_array(states.err),
        success=converged & ~failed,
        status=status,
        message="batched solve",
        time=elapsed,
        tol=tol,
        tol_rel=tol_rel,
        tol_internal=tol_internal,
        tol_internal_rel=tol_internal_rel,
        nesterov=nesterov,
        nesterov_ratio=nesterov_ratio,
    )
    if allfuns is not None:
        res.allfuns = allfuns
        res.allerrs = allerrs
        res.history_mask = hist_mask
        res.F0 = F0
        if allvecs is not None:
            res.allvecs = allvecs
            if vec_head is not None:
                res.vec_head = vec_head
    if keep_state:
        # Resumable batched carry (utils.checkpoint round-trips it; pass
        # back via initial_states to continue bitwise-identically).  Costs
        # a device->host copy of ~2x the iterate batch (x and y) —
        # pass keep_state=False for huge-n sweeps that never checkpoint.
        res.state = jax.tree.map(_host_array, states)
    else:
        res.state = None
    return res

"""Headline benchmark: LASSO n=10k dense-A FISTA iterations/s on one chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

The north-star metric (BASELINE.json) is iterations/s + wall-time to 1e-8
optimality gap on LASSO n=10k with dense A.  ``vs_baseline`` is measured
against the same iteration loop executed here on the host CPU via numpy
(the reference's compute pattern) so the ratio is apples-to-apples on this
machine (target: >= 50x).  ``reference_solver_iters_per_s`` additionally
times the ACTUAL reference implementation (``zfista.minimize_proximal_gradient``
from the mounted tree, reference: zfista/proximal_gradient.py:311) on the
identical workload — the numpy loop is the *faster* of the two baselines,
so ``vs_baseline`` is the conservative ratio.

The headline ``value`` is the PUBLIC API path at DEFAULT kwargs
(``Lasso.solve_fixed_step`` end-to-end; ``check_every`` auto-picks its
TPU chunking since round 5 — the out-of-the-box number).
``raw_loop_iters_per_s`` is the hand-rolled ``fori_loop`` over the same
step, ``public_over_raw`` is their ratio — the framework overhead users
pay (target: >= 0.85) — and ``tuned_ce128_iters_per_s`` (budget
permitting) is the formerly-headline hand-tuned ``check_every=128``
variant for cross-round comparison.

Failure behavior: the accelerator tunnel can be down.  The backend is
probed in killable subprocesses with retries + backoff (a bare
``jax.devices()`` hangs forever when the tunnel is down); on failure the
JSON line still carries every CPU-side number that was measured, so a
transient outage costs the accelerator value only, not the whole record.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

METRIC = "lasso_n10k_fista_iterations_per_s"


def _make_problem(m: int = 2000, n: int = 10000):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(m)
    x_true = np.zeros(n, np.float32)
    idx = rng.choice(n, 100, replace=False)
    x_true[idx] = rng.standard_normal(100).astype(np.float32)
    b = A @ x_true + 0.01 * rng.standard_normal(m).astype(np.float32)
    return A, b, 0.01


def _operator_norm_sq_np(A: np.ndarray, n_iter: int = 100) -> float:
    """||A||_2^2 by power iteration on A^T A (numpy, float64)."""
    A = np.asarray(A, np.float64)
    rng = np.random.default_rng(1)
    v = rng.standard_normal(A.shape[1])
    v /= np.linalg.norm(v)
    for _ in range(n_iter):
        w = A.T @ (A @ v)
        v = w / np.linalg.norm(w)
    return float(v @ (A.T @ (A @ v)))


def _reference_style_cpu_iters_per_s(A, b, lam, lr, n_iter=100, repeats=3):
    """Classic FISTA iteration in numpy — the reference's compute pattern
    (gradient matvecs + soft-threshold + momentum, float64, host CPU).
    Best of ``repeats`` timed runs after a warmup, so the ratio is against
    the host CPU at its fastest (conservative for the accelerator number)."""
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)

    def run_once():
        x = np.zeros(A.shape[1])
        y = x.copy()
        t = 1.0
        start = time.perf_counter()
        for _ in range(n_iter):
            grad = 2 * (A.T @ (A @ y - b))
            z = y - lr * grad
            x_new = np.sign(z) * np.maximum(np.abs(z) - lr * lam, 0)
            t_new = np.sqrt(t * t + 0.25) + 0.5
            y = x_new + ((t - 1) / t_new) * (x_new - x)
            x, t = x_new, t_new
        return time.perf_counter() - start

    run_once()  # warmup (BLAS init, page faults)
    return n_iter / min(run_once() for _ in range(repeats))


def _reference_solver_iters_per_s(A, b, lam, lr, n_iter=50):
    """Time the ACTUAL reference solver (zfista.minimize_proximal_gradient,
    reference: zfista/proximal_gradient.py:311) on the same fixed-step FISTA
    workload: decay_rate=1 (no backtracking), nesterov=True, tol=0 pins the
    iteration count.  Returns None if the mounted reference is unavailable."""
    import warnings

    try:
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from zfista import minimize_proximal_gradient  # noqa: PLC0415
    except Exception:
        return None

    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)

    def f(x):
        r = A @ x - b
        return float(r @ r)

    def jac(x):
        return 2 * (A.T @ (A @ x - b))

    def g(x):
        return lam * float(np.abs(x).sum())

    def prox(w, x):  # n_obj==1: called as prox(lr, y - lr*grad)
        t = w * lam
        return np.sign(x) * np.maximum(np.abs(x) - t, 0)

    x0 = np.zeros(A.shape[1])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # max-iter warning is expected (tol=0)
        t0 = time.perf_counter()
        res = minimize_proximal_gradient(
            f, g, jac, prox, x0, lr=lr, decay_rate=1.0, nesterov=True,
            tol=0.0, max_iter=n_iter,
        )
        elapsed = time.perf_counter() - t0
    return res.nit / elapsed


def _public_api_iters_per_s(A, b, lam, lr, n_iter: int, **extra) -> float:
    """Time ``Lasso.solve_fixed_step`` END-TO-END — the path users call:
    public facade -> compiled-driver cache -> ``lax.while_loop`` driver.
    With no ``extra`` this is the DEFAULT-kwargs path (``check_every``
    auto-picks its chunking on the TPU backend — the out-of-the-box number,
    VERDICT r4 #6); pass ``check_every=...`` to measure a tuned variant.
    ``tol=0`` pins the iteration count to ``n_iter`` so the number is
    comparable with the raw loop."""
    import jax.numpy as jnp

    from zfista_tpu.models.lasso import Lasso

    prob = Lasso(A, b, l1_ratio=float(lam))
    # Device-resident x0, same as the raw loop's carry: re-uploading a host
    # x0 every call costs ~28 ms through the device tunnel and would charge
    # data movement (not framework overhead) to the public/raw ratio.
    x0 = jnp.zeros(A.shape[1], jnp.float32)
    opts = dict(lr=float(lr), tol=0.0, **extra)
    prob.solve_fixed_step(x0, max_iter=n_iter, **opts)  # compile + warm
    best = np.inf
    for _ in range(3):
        start = time.perf_counter()
        res = prob.solve_fixed_step(x0, max_iter=n_iter, **opts)
        best = min(best, time.perf_counter() - start)
    assert res.nit == n_iter
    return n_iter / best


def _probe_m3_fault_boundary(timeout_s: int = 180) -> dict:
    """Re-probe the m>=3 wide-batch TPU fault each round (VERDICT r4 weak
    #6): the capacity auto-guards (`_TPU_M3_SAFE_LANES` / iter-chunk bounds,
    zfista_tpu/core/solver.py, parallel/batch.py) encode a measured backend
    fault whose boundary has already moved between rounds.  This runs the
    standalone repro (tools/repro_m3_width_fault.py, --mode width: B=1536
    lanes, short kernel — the fast-faulting mode) in a killable subprocess
    and records the outcome, so a libtpu update that fixes the fault is
    NOTICED instead of leaving the guard as silent pure overhead.

    Returns a JSON-serializable dict for the bench record.  Runs AFTER the
    headline measurement so a backend left wedged by the induced fault
    cannot contaminate the timing numbers.  Skip with BENCH_SKIP_M3_PROBE=1.
    """
    import os
    import subprocess

    if os.environ.get("BENCH_SKIP_M3_PROBE"):
        return {"skipped": "BENCH_SKIP_M3_PROBE set"}
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "repro_m3_width_fault.py")
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            [sys.executable, probe, "--mode", "width"],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return {
            "mode": "width",
            "faulted": None,
            "note": f"probe timed out after {timeout_s}s — slow tunnel "
                    "compile or hang; treat as unknown, not as a fault "
                    "verdict",
        }
    seconds = round(time.perf_counter() - t0, 1)
    tail = (p.stdout or "").strip().splitlines()
    out = {
        "mode": "width",
        "rc": p.returncode,
        # rc==1 + "FAULT" marker = the repro caught the backend fault, the
        # guarded regime is unchanged; rc==0 = the backend SURVIVED the
        # fault workload.  Any other rc is a probe breakage, not a signal.
        "faulted": (
            True
            if p.returncode == 1 and any("FAULT" in ln for ln in tail)
            else (False if p.returncode == 0 else None)
        ),
        "seconds": seconds,
        "tail": tail[-1][:200] if tail else "",
    }
    if out["faulted"] is False:
        out["note"] = (
            "backend did not fault on the m>=3 width repro — either the "
            "backend improved or the repro no longer captures the live "
            "fault shape (round 5 observed BOTH on one day: repro clean "
            "twice, then a real guarded FDS B=2048 batch faulted).  "
            "The framework_canary field is the authoritative signal."
        )
    return out


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (shared, /tmp): tunnel compile
    latency is the bench's dominant variance source (measured 60-440 s for
    the SAME m>=3 program cold across one session) and re-compiling
    identical programs per probe subprocess is pure waste.  Numerics are
    unaffected — the cache stores compiled executables keyed by program."""
    import jax

    for k, v in (
        ("jax_compilation_cache_dir", "/tmp/zfista_tpu_jax_cache"),
        ("jax_persistent_cache_min_compile_time_secs", 0.5),
    ):
        try:
            jax.config.update(k, v)
        except Exception:
            pass  # older jax without this flag


def _probe_m3_framework_canary(timeout_s: int = 300) -> dict:
    """The authoritative per-round m>=3 health check: ONE guarded REAL
    framework batch (FDS m=3, B at the lane-guard width, short max_iter)
    in its own subprocess.  Round 5 proved the standalone repro can run
    clean while this exact program faults (and vice versa is conceivable),
    so the longitudinal record tracks the program users actually run."""
    import os
    import subprocess

    code = (
        "import sys, time, warnings, numpy as np;"
        "sys.path.insert(0, '.');"
        "import bench; bench._enable_compilation_cache();"
        "from zfista_tpu.models.zoo import FDS;"
        "from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch;"
        "from zfista_tpu.core.solver import _TPU_M3_SAFE_LANES as W;"
        "fds = FDS(n_features=10);"
        "x0 = np.random.default_rng(0).uniform(-2, 2, (W, 10)).astype(np.float32);"
        "t0 = time.perf_counter();"
        "w = warnings.catch_warnings(); w.__enter__(); warnings.simplefilter('ignore');"
        "r = minimize_proximal_gradient_batch("
        "  fds.f, fds.g, fds.jac_f, fds.prox_wsum_g, x0,"
        "  nesterov=True, max_iter=200);"
        "print(f'CANARY_OK lanes={W} conv={int(np.sum(np.asarray(r.success)))}"
        "/{W} secs={time.perf_counter()-t0:.1f}')"
    )
    t0 = time.perf_counter()
    try:
        p = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=timeout_s,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
    except subprocess.TimeoutExpired:
        return {
            "ok": None,
            "note": f"canary timed out after {timeout_s}s — slow tunnel "
                    "compile or hang; unknown, NOT a measured fault "
                    "(cold compiles of this program measured 60-440s "
                    "across one session)",
        }
    tail = (p.stdout or "").strip().splitlines()
    ok = p.returncode == 0 and any("CANARY_OK" in ln for ln in tail)
    out = {
        "ok": ok,
        "seconds": round(time.perf_counter() - t0, 1),
        "tail": (tail[-1][:200] if tail else
                 (p.stderr or "").strip().splitlines()[-1][:200]
                 if (p.stderr or "").strip() else ""),
    }
    if not ok:
        out["note"] = (
            "the GUARDED m>=3 framework program faults on this runtime — "
            "the capacity guard is insufficient today (boundary moved "
            "again); see DESIGN.md known limitations"
        )
    return out


def _probe_backend_once(timeout_s: int) -> str | None:
    """One probe attempt in a killable subprocess (``jax.devices()`` hangs
    indefinitely when a tunneled backend is down; a subprocess turns an
    unbounded harness hang into a bounded, explained failure)."""
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True,
            timeout=timeout_s,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return f"backend probe timed out after {timeout_s}s (tunnel down?)"
    if p.returncode != 0:
        lines = p.stderr.strip().splitlines() if p.stderr else []
        return f"backend init failed: {lines[-1][:200] if lines else 'unknown'}"
    return None


def _probe_backend(attempt_timeouts=(40, 80, 160), backoffs=(10, 10)) -> str | None:
    """Probe with retries + backoff inside a ~300 s total budget: tunnel
    outages are often transient, so one failed probe should not forfeit the
    whole benchmark record.  Timeouts ESCALATE (40 -> 160 s): the first
    attempt answers fast when the backend is up and healthy; the last one
    tolerates a slow-but-alive backend init without eating the budget on
    every attempt."""
    err = None
    for i, t in enumerate(attempt_timeouts):
        err = _probe_backend_once(t)
        if err is None:
            return None
        if i < len(backoffs):
            time.sleep(backoffs[i])
    return f"{err} [{len(attempt_timeouts)} attempts]"


def main() -> None:
    # Persistent XLA compile cache for THIS process and every probe
    # subprocess (env is inherited): tunnel compile latency is the
    # dominant variance source (60-440 s cold for one program measured in
    # one session) and probes re-compile identical programs otherwise.
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zfista_tpu_jax_cache")
    t_start = time.perf_counter()

    def mark(phase: str) -> None:
        # stderr breadcrumbs (stdout stays one JSON line): when a run is
        # killed by a harness timeout, the last mark says WHERE the time
        # went (tunnel compile congestion measured at 60-440 s/program).
        print(
            f"[bench {time.perf_counter() - t_start:6.1f}s] {phase}",
            file=sys.stderr,
            flush=True,
        )

    A_np, b_np, lam = _make_problem()
    L = 2 * _operator_norm_sq_np(A_np)
    lr = 1.0 / L
    mark("problem + operator norm ready")

    # CPU-side baselines first: they survive into the error JSON if the
    # accelerator tunnel turns out to be down.
    cpu_ips = _reference_style_cpu_iters_per_s(A_np, b_np, lam, lr)
    mark("cpu numpy baseline done")
    ref_ips = _reference_solver_iters_per_s(A_np, b_np, lam, lr)
    mark("reference solver baseline done")

    partial = {
        "cpu_iters_per_s": round(cpu_ips, 2),
        "reference_solver_iters_per_s": round(ref_ips, 2) if ref_ips else None,
    }

    err = _probe_backend()
    mark("backend probe done")
    if err is not None:
        print(json.dumps({"metric": METRIC, "error": err, **partial}))
        raise SystemExit(1)

    import jax

    _enable_compilation_cache()
    import jax.numpy as jnp
    from jax import lax

    from zfista_tpu.models.lasso import fista_step_dense

    n = A_np.shape[1]
    dev_dtype = jnp.float32
    A = jnp.asarray(A_np, dev_dtype)
    b = jnp.asarray(b_np, dev_dtype)
    lam_dev = jnp.asarray(lam, dev_dtype)
    lr_dev = jnp.asarray(lr, dev_dtype)

    n_iter = 4000

    @jax.jit
    def run(A, b, carry):
        # A/b as arguments (not closure constants); deep unroll lets XLA
        # software-pipeline consecutive steps (measured: 27.8k iter/s at
        # unroll=128 vs 17.1k at 8 on v5e; BENCHMARKS.md unroll sweep).
        def body(_, c):
            return fista_step_dense(A, b, lam_dev, lr_dev, c)

        return lax.fori_loop(0, n_iter, body, carry, unroll=128)

    x0 = jnp.zeros((n,), dev_dtype)
    carry0 = (x0, x0, jnp.asarray(1.0, dev_dtype))
    jax.block_until_ready(run(A, b, carry0))  # compile + warm
    mark("raw loop compiled")
    start = time.perf_counter()
    out = jax.block_until_ready(run(A, b, carry0))
    elapsed = time.perf_counter() - start
    raw_iters_per_s = n_iter / elapsed
    del out
    mark("raw loop measured")

    # The SAME workload through the public solver facade at DEFAULT kwargs
    # (the number users get out of the box; raw-loop vs public gap =
    # framework overhead, target <= ~15%).  The tuned check_every=128
    # variant is reported alongside when budget remains: default-vs-tuned
    # should stay within ~5%.
    public_iters_per_s = _public_api_iters_per_s(A_np, b_np, lam, lr, n_iter)
    mark("public default-kwargs measured")

    # Everything below is optional extras under a soft deadline so a
    # slow-compile day (60-440 s cold for ONE program, measured) cannot
    # starve the headline record — the JSON line must always print within
    # the harness budget.
    budget = float(os.environ.get("BENCH_TIME_BUDGET_S", "540"))

    def left() -> float:
        return budget - (time.perf_counter() - t_start)

    tuned_iters_per_s = None
    if left() > 120:
        tuned_iters_per_s = _public_api_iters_per_s(
            A_np, b_np, lam, lr, n_iter, check_every=128
        )
        mark("tuned ce=128 measured")

    # m>=3 capacity probes, last so they cannot contaminate the headline.
    # ORDER MATTERS between the two: the framework canary (the
    # authoritative health check) runs FIRST, against a backend no probe
    # has deliberately faulted yet; the width repro — which EXPECTS to
    # fault the backend — runs after it, so an induced fault can never
    # masquerade as "the capacity guard is insufficient" in the
    # longitudinal record (review finding).
    if left() < 60:
        m3_probe = {"skipped": f"time budget exhausted ({left():.0f}s left)"}
    else:
        import os as _os

        if _os.environ.get("BENCH_SKIP_M3_PROBE"):
            m3_probe = {"skipped": "BENCH_SKIP_M3_PROBE set"}
        else:
            canary = _probe_m3_framework_canary(
                timeout_s=min(300, int(left() * 0.7))
            )
            mark("framework canary done")
            if left() > 60:
                m3_probe = _probe_m3_fault_boundary(
                    timeout_s=min(180, int(left()))
                )
            else:
                m3_probe = {
                    "mode": "width",
                    "faulted": None,
                    "note": "skipped: time budget exhausted",
                }
            m3_probe["framework_canary"] = canary
            mark("width repro probe done")

    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(public_iters_per_s, 2),
                "unit": "iter/s",
                "vs_baseline": round(public_iters_per_s / cpu_ips, 2),
                "raw_loop_iters_per_s": round(raw_iters_per_s, 2),
                "public_over_raw": round(public_iters_per_s / raw_iters_per_s, 3),
                "tuned_ce128_iters_per_s": (
                    round(tuned_iters_per_s, 2) if tuned_iters_per_s else None
                ),
                "default_over_tuned": (
                    round(public_iters_per_s / tuned_iters_per_s, 3)
                    if tuned_iters_per_s
                    else None
                ),
                "m3_fault_probe": m3_probe,
                **partial,
            }
        )
    )


if __name__ == "__main__":
    main()

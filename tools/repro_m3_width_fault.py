#!/usr/bin/env python
"""Standalone repro for the m>=3 wide-batch TPU backend fault.

No framework imports — this is the isolated compute structure that faults
the v5e backend (DESIGN.md "Known limitations"; BENCHMARKS.md "m=3 past
the device's width limit"): B lanes of a FISTA-style outer ``while_loop``,
each iteration solving a 3-objective dual subproblem by semismooth
projected Newton (autodiff Hessian through a piecewise-linear prox,
unrolled Gauss-Jordan KKT solve, inner Armijo ``while_loop``), all vmapped
into ONE XLA program.  Two isolated fault modes on the v5e (round 3):

  (a) width   — B=1536 faults at dispatch even with short kernels
                (``--mode width``);
  (b) runtime — back-to-back ~50 s monolithic dispatches fault on the
                SECOND dispatch even at B=1024 (``--mode runtime``).
                Round 4: this mode is WIDTH-INDEPENDENT — a single
                minutes-long monolithic dispatch faults even at B=256
                (``--mode runtime --lanes 256 --iters 3000``).

Usage:
  python tools/repro_m3_width_fault.py --mode smoke             # sanity, any backend
  python tools/repro_m3_width_fault.py --mode width             # expect fault on v5e
  python tools/repro_m3_width_fault.py --mode runtime           # expect 2nd-dispatch fault
  python tools/repro_m3_width_fault.py --mode width --dump-hlo out.hlo   # HLO only, no run

The framework's shipped remedy is the public ``lane_chunk``/``iter_chunk``
batch options (zfista_tpu/parallel/batch.py) plus a TPU auto-guard; this
script exists so the underlying backend bug stays reportable upstream and
re-testable on every future runtime in one command.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

M, N = 3, 10  # objectives x features, the benchmarked FDS(m=3, n=10) shape


def project_simplex(w):
    u = jnp.sort(w)[::-1]
    k = jnp.arange(1, M + 1, dtype=w.dtype)
    lam = (1.0 - jnp.cumsum(u)) / k
    rho = jnp.sum((u + lam) > 0) - 1
    return jnp.maximum(w + lam[rho], 0.0)


def gauss_jordan(K, b):
    """Unrolled partial-pivot elimination on the (M+1)x(M+1) KKT system —
    the framework uses this exact structure to AVOID batched lax.linalg
    lowerings (which faulted at ~400 lanes); the residual fault reproduced
    here survives even with no linalg kernels in the program."""
    n = K.shape[-1]
    A = jnp.concatenate([K, b[:, None]], axis=-1)
    idx = jnp.arange(n)
    for k in range(n):
        mag = jnp.where(idx < k, -jnp.inf, jnp.abs(A[:, k]))
        p = jnp.argmax(mag)
        rowk, rowp = A[k], A[p]
        A = A.at[k].set(rowp).at[p].set(rowk)
        row = A[k] / A[k, k]
        fac = jnp.where(idx == k, 0.0, A[:, k])
        A = (A - fac[:, None] * row[None, :]).at[k].set(row)
    return A[:, n]


def fista_lane(x0, n_outer):
    """One lane: n_outer FISTA steps on a 3-objective quadratic family with
    an L1 term, each step solving the dual by projected Newton."""
    lam = jnp.asarray(0.05, x0.dtype)
    scales = jnp.stack(
        [jnp.ones(N), 1.0 + jnp.arange(N) / N, 2.0 - jnp.arange(N) / N]
    ).astype(x0.dtype)
    shifts = jnp.stack([jnp.zeros(N), jnp.ones(N), -jnp.ones(N)]).astype(x0.dtype)

    f = lambda x: jnp.sum(scales * (x[None, :] - shifts) ** 2, axis=1) / N
    jac_f = jax.jacfwd(f)
    prox = lambda t, u: jnp.sign(u) * jnp.maximum(jnp.abs(u) - t * lam, 0.0)
    g = lambda x: jnp.full((M,), lam * jnp.sum(jnp.abs(x)), x.dtype)
    lr = jnp.asarray(0.5, x0.dtype)

    def dual_vag(w, y, J, fy, Fold):
        u = y - lr * (w @ J)
        xw = prox(lr * jnp.sum(w), u)
        gx = g(xw)
        d = xw - u
        phi = (
            -w @ gx
            - d @ d / (2 * lr)
            + (lr / 2) * (w @ J) @ (w @ J)
            + w @ (Fold - fy)
        )
        return phi, -gx - J @ (xw - y) + (Fold - fy)

    def newton(y, J, fy, Fold):
        vag = lambda w: dual_vag(w, y, J, fy, Fold)
        hess = jax.jacfwd(lambda w: vag(w)[1])
        Ls = jnp.maximum(lr * jnp.sum(J * J), 1.0)

        def body(c):
            w, _, k, done = c
            phi, grad = vag(w)
            H = hess(w) + 1e-6 * jnp.eye(M, dtype=w.dtype)
            free = (~((w <= 1e-6) & (grad > 0))).astype(w.dtype)
            K = jnp.zeros((M + 1, M + 1), w.dtype)
            K = K.at[:M, :M].set(H * jnp.outer(free, free) + jnp.diag(1 - free))
            K = K.at[:M, M].set(free).at[M, :M].set(free)
            d = gauss_jordan(K, jnp.concatenate([-grad * free, jnp.zeros(1, w.dtype)]))[:M]
            d = d - (1 - free) * grad / Ls
            d = jnp.where(jnp.all(jnp.isfinite(d)) & (grad @ d < 0), d, -grad / Ls)

            def ls_body(s):
                a, _, j, w_t, phi_t = s
                a = a * 0.5
                w_n = project_simplex(w + a * d)
                phi_n, _ = vag(w_n)
                ok = phi_n <= phi + 1e-4 * (grad @ (w_n - w)) + 1e-6 * (1 + jnp.abs(phi))
                return a, ok, j + 1, w_n, phi_n

            w1 = project_simplex(w + d)
            phi1, _ = vag(w1)
            ok0 = phi1 <= phi + 1e-4 * (grad @ (w1 - w)) + 1e-6 * (1 + jnp.abs(phi))
            _, ok, _, w_t, phi_t = lax.while_loop(
                lambda s: (~s[1]) & (s[2] < 40),
                ls_body,
                (jnp.asarray(1.0, w.dtype), ok0, jnp.asarray(1, jnp.int32), w1, phi1),
            )
            gm = jnp.linalg.norm(w - project_simplex(w - grad / Ls))
            return (
                jnp.where(ok, w_t, w),
                jnp.where(ok, phi_t, phi),
                k + 1,
                (gm <= 1e-6) | (~ok),
            )

        w0 = jnp.full((M,), 1.0 / M, y.dtype)
        w, _, _, _ = lax.while_loop(
            lambda c: (~c[3]) & (c[2] < 30),
            body,
            (w0, jnp.zeros((), y.dtype), jnp.asarray(0, jnp.int32), jnp.asarray(False)),
        )
        u = y - lr * (w @ J)
        return prox(lr * jnp.sum(w), u)

    def outer(c):
        x, x_old, y, t, k = c
        fy, J = f(y), jac_f(y)
        Fold = f(x) + g(x)
        x_new = newton(y, J, fy, Fold)
        t_new = jnp.sqrt(t * t + 0.25) + 0.5
        y_new = x_new + ((t - 1) / t_new) * (x_new - x)
        return x_new, x, y_new, t_new, k + 1

    x, *_ = lax.while_loop(
        lambda c: c[4] < n_outer,
        outer,
        (x0, x0, x0, jnp.asarray(1.0, x0.dtype), jnp.asarray(0, jnp.int32)),
    )
    return x


def build(batch, n_outer):
    fn = jax.jit(jax.vmap(lambda x0: fista_lane(x0, n_outer)))
    x0 = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (batch, N)), jnp.float32)
    return fn, x0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["smoke", "width", "runtime"], default="smoke")
    ap.add_argument("--lanes", type=int, default=None, help="override batch width")
    ap.add_argument("--iters", type=int, default=None, help="override outer iterations")
    ap.add_argument("--dump-hlo", default=None, help="write optimized HLO here and exit")
    ap.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. 'cpu'); needed on hosts whose "
        "sitecustomize re-registers an accelerator plugin over JAX_PLATFORMS",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # Defaults per mode: width = wide batch, short kernel (fault mode a);
    # runtime = safe width, two long back-to-back dispatches (fault mode b).
    lanes = args.lanes or {"smoke": 64, "width": 1536, "runtime": 1024}[args.mode]
    iters = args.iters or {"smoke": 20, "width": 50, "runtime": 2000}[args.mode]
    dispatches = 2 if args.mode == "runtime" else 1

    print(f"backend={jax.default_backend()} lanes={lanes} iters={iters} "
          f"dispatches={dispatches}", flush=True)
    fn, x0 = build(lanes, iters)

    if args.dump_hlo:
        hlo = fn.lower(x0).compile().as_text()
        with open(args.dump_hlo, "w") as fh:
            fh.write(hlo)
        print(f"wrote optimized HLO ({len(hlo)} bytes) to {args.dump_hlo}")
        return 0

    for d in range(dispatches):
        t0 = time.perf_counter()
        try:
            out = jax.block_until_ready(fn(x0))
        except Exception as exc:  # noqa: BLE001 — the fault IS the finding
            print(f"dispatch {d + 1}: FAULT after {time.perf_counter() - t0:.1f}s: "
                  f"{type(exc).__name__}: {exc}", flush=True)
            return 1
        print(f"dispatch {d + 1}: ok in {time.perf_counter() - t0:.1f}s, "
              f"mean|x|={float(jnp.mean(jnp.abs(out))):.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

r"""TV-regularized image deblurring (BASELINE configs[1]).

Solves  min_X ||blur(X) - b||^2 + lam * TV(X)  on the image domain with
fixed-step accelerated proximal gradient (lr = 1/L), where the TV prox is
the fixed-budget FGP dual solver of :mod:`zfista_tpu.ops.tv` compiled into
the solver step.  The reference notebook solves the wavelet-L1 surrogate of
this workload (its scipy solver has no TV prox); this example runs BOTH
formulations on the same blurred observation and reports PSNR vs the ground
truth, so the two regularizers are directly comparable.

Usage:
    python examples/tv_deblur.py [--size 256] [--image path.png]
        [--tv-ratio 2e-4] [--l1-ratio 2e-5] [--max-iter 500]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

# Checkout-runnable without installation: `python examples/<name>.py` puts
# examples/ (not the repo root) on sys.path.
try:
    import zfista_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((a - b) ** 2))
    return float(10 * np.log10(peak**2 / mse)) if mse > 0 else np.inf


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--image", type=Path, default=None)
    parser.add_argument("--tv-ratio", type=float, default=2e-4)
    parser.add_argument("--l1-ratio", type=float, default=2e-5)
    parser.add_argument("--noise", type=float, default=1e-3)
    parser.add_argument("--max-iter", type=int, default=500)
    parser.add_argument("--tol", type=float, default=1e-5)
    parser.add_argument("--prox-iter", type=int, default=30)
    args = parser.parse_args()

    import jax.numpy as jnp

    from zfista_tpu.models.deblur import (
        TVDeblur,
        WaveletDeblur,
        gaussian_kernel,
        make_blur,
        synthetic_cameraman,
    )

    if args.image is not None:
        from PIL import Image

        truth = np.asarray(
            Image.open(args.image).convert("L"), dtype=np.float64
        ) / 255.0
    else:
        truth = np.asarray(synthetic_cameraman(args.size))

    kernel = gaussian_kernel()
    blur = make_blur(kernel)
    rng = np.random.default_rng(0)
    observed = np.array(blur(jnp.asarray(truth)))
    observed += args.noise * rng.standard_normal(observed.shape)
    print(f"observed PSNR: {psnr(observed, truth):.2f} dB")

    def timed_solve(prob, **kw):
        """(cold, warm) wall seconds: the first call compiles the program
        (30-400 s through a tunneled device), the second reuses it — the
        warm time is the device-speed number."""
        t0 = time.perf_counter()
        res = prob.solve(**kw)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = prob.solve(**kw)
        warm = time.perf_counter() - t0
        return res, cold, warm

    tv = TVDeblur(
        observed,
        tv_ratio=args.tv_ratio,
        kernel=kernel,
        prox_iter=args.prox_iter,
    )
    res_tv, cold_tv, warm_tv = timed_solve(tv, max_iter=args.max_iter, tol=args.tol)
    rec_tv = np.asarray(res_tv.x).reshape(observed.shape)
    print(
        f"TV       : {res_tv.nit:4d} it, {warm_tv:6.2f} s warm "
        f"({cold_tv:6.2f} s incl. compile), PSNR {psnr(rec_tv, truth):.2f} dB, "
        f"F={float(np.ravel(res_tv.fun)[0]):.6g}"
    )

    # Warm-dual fast path: FGP duals carried across outer iterations,
    # prox_iter=8 instead of 30 (same quality; see BENCHMARKS.md).
    tv.solve_warm(max_iter=args.max_iter, tol=args.tol)  # compile
    t0 = time.perf_counter()
    warm = tv.solve_warm(max_iter=args.max_iter, tol=args.tol)
    t_warm = time.perf_counter() - t0
    rec_warm = warm["x"].reshape(observed.shape)
    print(
        f"TV (warm): {warm['nit']:4d} it, {t_warm:6.2f} s warm run, "
        f"PSNR {psnr(rec_warm, truth):.2f} dB, F={warm['fun']:.6g}"
    )

    wl = WaveletDeblur(jnp.asarray(observed), l1_ratio=args.l1_ratio)
    res_wl, cold_wl, warm_wl = timed_solve(wl, max_iter=args.max_iter, tol=args.tol)
    from zfista_tpu.models.deblur import idwt2

    rec_wl = np.asarray(
        idwt2(jnp.reshape(jnp.asarray(res_wl.x), observed.shape), wl.levels)
    )
    print(
        f"waveletL1: {res_wl.nit:4d} it, {warm_wl:6.2f} s warm "
        f"({cold_wl:6.2f} s incl. compile), PSNR {psnr(rec_wl, truth):.2f} dB, "
        f"F={float(np.ravel(res_wl.fun)[0]):.6g}"
    )


if __name__ == "__main__":
    main()

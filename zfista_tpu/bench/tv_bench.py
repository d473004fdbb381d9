r"""TV/FGP prox kernel benchmark: XLA ``fori_loop`` vs the VMEM-resident
Pallas kernel (:mod:`zfista_tpu.ops.tv_pallas`), cold and nested inside the
deblurring solve — the round-2 verdict's "Pallas attempt #2" measurement.

Usage:
    python -m zfista_tpu.bench.tv_bench [--sizes 256,512,1024]
        [--n-iter 30] [--repeats 5] [--deblur-iters 200]

Timing discipline (see BENCHMARKS.md / memory): each measurement times N
applications inside ONE dispatched program where possible, and otherwise
takes the best of ``repeats`` dispatches after a warmup; isolated-op
timings through a remote tunnel are meaningless (~35 ms RTT floor).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _time_best(fn, repeats: int) -> float:
    import jax

    jax.block_until_ready(fn())  # compile + warm
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="256,512,1024")
    parser.add_argument("--n-iter", type=int, default=30)
    parser.add_argument("--calls", type=int, default=20,
                        help="prox calls per timed program (cold bench)")
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--deblur-size", type=int, default=256)
    parser.add_argument("--deblur-iters", type=int, default=200)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from zfista_tpu.ops import tv_pallas
    from zfista_tpu.ops.tv import prox_tv

    backend = jax.default_backend()
    interpret = backend != "tpu"
    # Off-TPU, method="pallas" falls back to the XLA loop (so timing it
    # would compare XLA against itself); force the interpreter instead so
    # the kernel actually runs — labelled, and never a perf claim.
    kernel_method = "pallas_interpret" if interpret else "pallas"
    print(f"backend: {backend} (pallas interpret={interpret})")

    rng = np.random.default_rng(0)
    n_iter = int(args.n_iter)
    calls = int(args.calls)

    print(f"\n== cold prox: {calls} chained prox calls per dispatch, "
          f"n_iter={n_iter}, best of {args.repeats} ==")
    print(f"{'size':>6} {'kernel':>9} {'xla ms/call':>12} {'pallas ms/call':>15} {'speedup':>8}")
    for size in [int(s) for s in args.sizes.split(",")]:
        v0 = jnp.asarray(rng.standard_normal((size, size)), jnp.float32)
        lam = jnp.asarray(0.1, jnp.float32)
        fits = tv_pallas.fits_vmem((size, size), jnp.float32)
        strips = tv_pallas.strip_rows((size, size), jnp.float32)
        # What method="pallas" resolves to at this size (prox_tv dispatch
        # order): all-VMEM residency, then temporally-blocked strips
        # (real kernel only — the interpreter always runs the all-VMEM
        # form), then the XLA fallback.
        if fits:
            kind = "vmem"
        elif strips is not None and not interpret:
            kind = f"strip/{strips}"
        else:
            kind = None

        def chained(method):
            # `calls` dependent prox applications inside one program: the
            # output feeds the next input, so nothing can be elided and
            # per-call cost excludes dispatch overhead.
            @jax.jit
            def run(v):
                def body(_, u):
                    return prox_tv(lam, u, n_iter=n_iter, method=method)

                return lax.fori_loop(0, calls, body, v)

            return lambda: run(v0)

        t_x = _time_best(chained("xla"), args.repeats)
        row = f"{size:>6} {kind or '(xla)':>9} {1e3 * t_x / calls:>12.3f}"
        if kind is not None:
            t_p = _time_best(chained(kernel_method), args.repeats)
            row += f" {1e3 * t_p / calls:>15.3f} {t_x / t_p:>8.2f}x"
        else:
            row += f" {'(xla fallback)':>15} {'-':>8}"
        print(row)

    # Nested-in-deblur: the real consumer — TVDeblur warm-dual solve.
    from zfista_tpu.models.deblur import TVDeblur, gaussian_kernel, make_blur

    size = int(args.deblur_size)
    img = np.zeros((size, size), np.float32)
    img[size // 4 : 3 * size // 4, size // 4 : 3 * size // 4] = 1.0
    img[size // 2 :, : size // 2] = 0.5
    kernel = gaussian_kernel(9, 2.0)
    observed = np.array(make_blur(kernel)(jnp.asarray(img)))  # writable copy
    observed += 0.01 * rng.standard_normal(observed.shape).astype(np.float32)

    print(f"\n== nested: TVDeblur.solve_warm {size}x{size}, "
          f"max_iter={args.deblur_iters}, prox_iter=8 ==")
    for method in ("xla", kernel_method):
        prob = TVDeblur(
            observed, tv_ratio=1e-3, kernel=kernel, prox_method=method
        )
        r = prob.solve_warm(max_iter=args.deblur_iters, tol=0.0, prox_iter=8)
        r2 = prob.solve_warm(max_iter=args.deblur_iters, tol=0.0, prox_iter=8)
        print(
            f"  {method:>6}: {r2['time']:.3f}s warm-cache "
            f"({r['time']:.3f}s first call), nit={r2['nit']}, "
            f"F={r2['fun']:.6g}"
        )


if __name__ == "__main__":
    main()

r"""Wavelet-L1 image deblurring with a momentum-pair sweep.

Script counterpart of the reference's flagship notebook
(examples/cameraman.ipynb): blur a 256x256 test image with a 9x9 Gaussian
(sigma=4), then recover it by solving

    min_x ||blur(IDWT(x)) - b||^2 + 2e-5 * ||x||_1

with fixed-step accelerated proximal gradient (lr = 1/L from the blur
kernel's Fourier symbol) for each of the paper's 15 momentum pairs (a, b).

TPU-native twist: all 15 momentum pairs run as ONE vmapped device program
(per-lane (a, b) momentum data) instead of one joblib process per pair.
The cameraman photograph itself is not redistributable, so a deterministic
synthetic image with similar structure is used; pass --image to use any
square power-of-two grayscale image instead.

Usage:
    python examples/cameraman_deblur.py [--size 256] [--out examples/data]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--out", type=Path, default=Path("examples/data"))
    parser.add_argument("--image", type=Path, default=None)
    parser.add_argument("--max-iter", type=int, default=2000)
    parser.add_argument("--tol", type=float, default=1e-5)
    args = parser.parse_args()

    import jax.numpy as jnp

    from zfista_tpu.bench.momentum_sweep import AB_GRID, write_ab_csv
    from zfista_tpu.models.deblur import (
        WaveletDeblur,
        gaussian_kernel,
        make_blur,
        synthetic_cameraman,
    )
    from zfista_tpu.parallel.batch import minimize_proximal_gradient_batch

    if args.image is not None:
        from PIL import Image

        img = jnp.asarray(
            np.asarray(Image.open(args.image).convert("L"), dtype=np.float64)
            / 255.0
        )
    else:
        img = synthetic_cameraman(args.size)

    kernel = gaussian_kernel(9, 4.0)
    observed = make_blur(kernel)(img)
    prob = WaveletDeblur(observed, l1_ratio=2e-5, kernel=kernel)
    lr = 1.0 / prob.lipschitz()
    x0 = np.asarray(prob.x0())

    n_pairs = len(AB_GRID)
    x0_lanes = np.tile(x0[None, :], (n_pairs, 1))
    ab_lanes = np.asarray([[float(a), float(b)] for a, b in AB_GRID])

    t0 = time.perf_counter()
    res = minimize_proximal_gradient_batch(
        prob.f,
        prob.g,
        prob.jac_f,
        prob.prox_wsum_g,
        x0_lanes,
        batch_nesterov_ratio=ab_lanes,
        nesterov=True,
        lr=lr,
        decay_rate=1,
        tol=args.tol,
        max_iter=args.max_iter,
        check_every=8,
    )
    total = time.perf_counter() - t0

    nit = np.asarray(res.nit, dtype=float)
    time_share = total * nit / nit.sum()
    rows = [
        dict(
            a=str(a),
            b=str(b),
            time=float(time_share[i]),
            nit=float(nit[i]),
            error_rate=float(~res.success[i]),
        )
        for i, (a, b) in enumerate(AB_GRID)
    ]
    out_csv = args.out / "cameraman_ab.csv"
    write_ab_csv(rows, out_csv)
    print(f"wrote {out_csv} ({total:.1f}s wall for all {n_pairs} pairs)")
    for r in rows:
        print(f"  (a={r['a']}, b={r['b']}): {r['nit']:.0f} iterations")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from zfista_tpu.models.deblur import idwt2

        best = int(np.argmin(nit))
        rec = np.asarray(
            idwt2(jnp.reshape(jnp.asarray(res.x[best]), img.shape), prob.levels)
        )
        fig, axes = plt.subplots(1, 3, figsize=(10, 3.5))
        for ax, (data, title) in zip(
            axes,
            [
                (np.asarray(img), "original"),
                (np.asarray(observed), "blurred"),
                (rec, f"recovered ({AB_GRID[best]})"),
            ],
        ):
            ax.imshow(data, cmap="gray")
            ax.set_title(title, fontsize=9)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(args.out / "cameraman_deblur.png", dpi=120)
        print(f"wrote {args.out / 'cameraman_deblur.png'}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()

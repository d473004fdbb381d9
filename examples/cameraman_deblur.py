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

# Checkout-runnable without installation: `python examples/<name>.py` puts
# examples/ (not the repo root) on sys.path.
try:
    import zfista_tpu  # noqa: F401
except ModuleNotFoundError:
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--out", type=Path, default=Path("examples/data"))
    parser.add_argument("--image", type=Path, default=None)
    parser.add_argument("--max-iter", type=int, default=2000)
    parser.add_argument("--tol", type=float, default=1e-5)
    args = parser.parse_args()

    import jax.numpy as jnp

    from zfista_tpu.bench.momentum_sweep import AB_GRID, momentum_sweep, write_ab_csv
    from zfista_tpu.models.deblur import (
        WaveletDeblur,
        gaussian_kernel,
        make_blur,
        synthetic_cameraman,
    )

    if args.image is not None:
        # Any photograph works (requires the `examples` extra: pillow).
        # Non-square / non-power-of-two inputs are center-cropped to square
        # and resized to --size x --size.  For the canonical cameraman
        # comparison, pass the 256x256 cameraman photo (e.g. saved from
        # skimage.data.camera() on a machine that has scikit-image; the
        # image itself is not redistributable with this repo).
        from PIL import Image

        pil = Image.open(args.image).convert("L")
        w, h = pil.size
        if w != h:
            side = min(w, h)
            left, top = (w - side) // 2, (h - side) // 2
            pil = pil.crop((left, top, left + side, top + side))
        if pil.size != (args.size, args.size):
            pil = pil.resize((args.size, args.size), Image.LANCZOS)
        img = jnp.asarray(np.asarray(pil, dtype=np.float64) / 255.0)
    else:
        img = synthetic_cameraman(args.size)

    kernel = gaussian_kernel(9, 4.0)
    observed = make_blur(kernel)(img)
    prob = WaveletDeblur(observed, l1_ratio=2e-5, kernel=kernel)
    lr = 1.0 / prob.lipschitz()
    x0 = np.asarray(prob.x0())

    n_pairs = len(AB_GRID)

    # One shared vmapped sweep for iteration counts + the recovered image,
    # then each (a, b) pair re-run as its own timed solve — the `time`
    # column is MEASURED per-pair seconds (n_starts=1, so seconds for that
    # pair's full solve), directly comparable with the reference's
    # examples/data/cameraman_ab.csv column.
    t0 = time.perf_counter()
    rows, res = momentum_sweep(
        prob,
        0.0,
        0.0,  # box unused: explicit deterministic start below
        n_starts=1,
        x0s=x0[None, :],
        measure_times=True,
        nesterov=True,
        lr=lr,
        decay_rate=1,
        tol=args.tol,
        max_iter=args.max_iter,
        check_every=8,
    )
    total = time.perf_counter() - t0

    nit = np.asarray(res.nit, dtype=float)
    out_csv = args.out / "cameraman_ab.csv"
    write_ab_csv(rows, out_csv)
    print(f"wrote {out_csv} ({total:.1f}s wall for all {n_pairs} pairs)")
    for r in rows:
        if r["nit"] is None:
            print(f"  (a={r['a']}, b={r['b']}): no converged start")
        else:
            print(
                f"  (a={r['a']}, b={r['b']}): {r['nit']:.0f} iterations, "
                f"{r['time']:.3f}s measured"
            )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from zfista_tpu.models.deblur import idwt2

        # best CONVERGED pair only: unconverged lanes sit at max_iter and
        # argmin over raw nit could render a non-recovered iterate
        ok = np.asarray(res.success, bool)
        if not ok.any():
            print("no converged pair; skipping the recovered-image figure")
            return
        best = int(np.argmin(np.where(ok, nit, np.inf)))
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

r"""Momentum-pair (a, b) sweep across the multiobjective problem suite.

Script counterpart of the reference's
examples/PGM_experiment_with_various_a_b.ipynb: for JOS1 (n=50), JOS1+L1,
SD, FDS (n=10) and FDS constrained, run many random starts for each of the
15 momentum pairs and write ``{problem}_ab.csv`` rows ``a ,b,time,nit``
(mean over converged starts — same semantics as examples/data/*.csv).

The whole grid x starts product per problem is ONE vmapped device program.

Usage:
    python examples/momentum_experiment.py [--n-starts 1000] [--out examples/data]
"""

from __future__ import annotations

import argparse
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
    parser.add_argument("--n-starts", type=int, default=1000)
    parser.add_argument("--out", type=Path, default=Path("examples/data"))
    parser.add_argument("--max-iter", type=int, default=10_000)
    parser.add_argument("--lane-chunk", type=int, default=None)
    args = parser.parse_args()

    from zfista_tpu.bench.momentum_sweep import momentum_sweep, write_ab_csv
    from zfista_tpu.models.zoo import FDS, JOS1, SD

    suite = [
        ("JOS1", JOS1(n_features=50), -2, 4),
        (
            "JOS1_L1",
            JOS1(n_features=50, l1_ratios=[1 / 50, 2 / 50], l1_shifts=[0, -1]),
            -2,
            4,
        ),
        ("SD", SD(), 1, 2),
        ("FDS", FDS(n_features=10), -2, 2),
        ("FDS_CONSTRAINED", FDS(n_features=10, bounds=(0, np.inf)), 0, 2),
    ]
    for name, prob, low, high in suite:
        rows, _ = momentum_sweep(
            prob,
            low,
            high,
            n_starts=args.n_starts,
            max_iter=args.max_iter,
            lane_chunk=args.lane_chunk,
        )
        out = args.out / f"{name}_ab.csv"
        write_ab_csv(rows, out)
        # Pairs with zero converged starts carry nit=None (momentum_sweep
        # contract) — skip them in the summary instead of crashing.
        ok_rows = [r for r in rows if r["nit"] is not None]
        if not ok_rows:
            print(f"{name}: no momentum pair converged for any start")
            continue
        best = min(ok_rows, key=lambda r: r["nit"])
        classic = rows[0]
        classic_s = (
            f"{classic['nit']:.1f} it" if classic["nit"] is not None else "failed"
        )
        print(
            f"{name}: classic (0,0) {classic_s} -> best "
            f"(a={best['a']}, b={best['b']}) {best['nit']:.1f} it"
        )


if __name__ == "__main__":
    main()

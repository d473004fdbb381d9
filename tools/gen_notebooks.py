"""Build + execute the example notebooks (examples/notebooks/*.ipynb).

The reference ships its examples as Jupyter notebooks
(reference: examples/cameraman.ipynb, examples/PGM_*.ipynb); this repo's
examples are CI-smoke-tested scripts.  This generator closes the
notebook-form gap without giving up testability: notebooks are built
from the cell sources below (the single source of truth —
tests/test_notebooks.py asserts the committed .ipynb cells match, so a
notebook can never drift from what was reviewed), then EXECUTED on the
hermetic CPU backend at small scale so the committed files carry real
outputs.

Usage::

    python tools/gen_notebooks.py            # build + execute + write
    python tools/gen_notebooks.py --no-exec  # build only (fast)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "examples" / "notebooks"

# Every code cell starts from this prelude in cell 1: force the hermetic
# CPU backend exactly like tests/conftest.py (the session's default
# backend may be a remote TPU tunnel).
GETTING_STARTED = [
    (
        "md",
        """\
# Getting started with `zfista_tpu`

A TPU-native (JAX/XLA) framework for single- and multi-objective
proximal gradient methods — the accelerated variants of FISTA with the
momentum family of the reference papers.  This notebook walks the same
ground as the reference's quickstart: a scalar composite problem, a
multiobjective problem from the zoo, a vmapped scenario batch, and the
quality metrics.

Everything here runs on CPU in seconds; the same code runs unchanged on
a TPU mesh (see `docs/DISTRIBUTED.md`).""",
    ),
    (
        "code",
        """\
import jax

# hermetic CPU for the notebook (a session may default to a TPU tunnel)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import zfista_tpu

print(jax.default_backend(), zfista_tpu.__version__)""",
    ),
    (
        "md",
        """\
## 1. A scalar composite problem

Minimize $F(x) = f(x) + g(x)$ with smooth $f(x) = (x-1)^2$ and
nonsmooth $g(x) = 0.1\\,|x|$.  The solver needs $f$, $g$, an optional
Jacobian (``None`` → autodiff), and the prox of the weighted sum of
$g$'s components — here plain soft-thresholding.  The closed-form
solution is $x^* = 1 - 0.1/2 = 0.95$.""",
    ),
    (
        "code",
        """\
f = lambda x: (x[0] - 1.0) ** 2
g = lambda x: 0.1 * jnp.abs(x[0])
prox = lambda t, x: jnp.sign(x) * jnp.maximum(jnp.abs(x) - 0.1 * t, 0)

res = zfista_tpu.minimize_proximal_gradient(
    f, g, None, prox, np.array([3.0]), lr=0.4, nesterov=True
)
print(res.message)
print("x* =", float(res.x[0]), " nit =", res.nit)""",
    ),
    (
        "md",
        """\
## 2. A multiobjective problem from the zoo

`JOS1` is the classic convex bi-objective test problem
($f_1 = \\tfrac1n\\|x\\|^2$, $f_2 = \\tfrac1n\\|x-2\\|^2$).  Each solve
finds one Pareto-stationary point; the per-step subproblem (the dual of
the multiobjective descent step) is solved in closed form / by
vectorized bisection inside the compiled program.""",
    ),
    (
        "code",
        """\
from zfista_tpu.models.zoo import JOS1

prob = JOS1(n_features=5)
r = prob.solve(np.full(5, 3.0), nesterov=True, tol=1e-6)
print("F(x*) =", np.asarray(r.fun))
print("nit =", r.nit, " success =", r.success)""",
    ),
    (
        "md",
        """\
## 3. Scenario batches: many solves as ONE device program

The reference fans independent starts out to OS processes
(`joblib.Parallel`); on TPU the idiomatic design is `jax.vmap` — every
lane advances inside one compiled `while_loop`, and the batch axis can
shard across a device mesh unchanged.""",
    ),
    (
        "code",
        """\
from zfista_tpu.parallel import minimize_proximal_gradient_batch

rng = np.random.default_rng(0)
X0 = rng.uniform(-2.0, 4.0, size=(32, 5))
batch = minimize_proximal_gradient_batch(
    prob.f, prob.g, prob.jac_f, prob.prox_wsum_g, X0,
    nesterov=True, tol=1e-6, max_iter=2000,
)
print("converged:", int(np.asarray(batch.success).sum()), "/ 32")
print("mean nit:", float(np.asarray(batch.nit).mean()))""",
    ),
    (
        "md",
        """\
## 4. Front quality metrics

`calculate_metrics` reproduces the reference's metrics table (purity,
spread Γ/Δ, hypervolume, error rate, iteration/time averages) from
lists of per-solve results — `BatchResult.to_list()` explodes the
batch into exactly that.""",
    ),
    (
        "code",
        """\
from zfista_tpu.metrics import calculate_metrics

# {metric name: {algorithm name: value}} — the reference's table layout
metrics, ratios = calculate_metrics(("accelerated", batch.to_list()))
for k, per_algo in sorted(metrics.items()):
    print(f"{k:28s} {per_algo['accelerated']:.6g}")""",
    ),
    (
        "md",
        """\
## 5. Momentum variants

The `(a, b)` momentum family of the reference papers is a solver
argument (`nesterov_ratio`), and two opt-in improvements the reference
does not have are measured in `BENCHMARKS.md`: `adaptive_restart`
(O'Donoghue–Candès; 1.7–3.7× fewer iterations where FISTA ripples) and
`project_momentum` (fixes the reference's 100% ZDT1 failure).""",
    ),
    (
        "code",
        """\
for kw in (dict(nesterov_ratio=(0, 0.25)), dict(nesterov_ratio=(1, 1)),
           dict(adaptive_restart=True)):
    r = prob.solve(np.full(5, 3.0), nesterov=True, tol=1e-8, **kw)
    print(kw, "-> nit", r.nit)""",
    ),
]

TV_DEBLUR = [
    (
        "md",
        """\
# TV-regularized image deblurring

The flagship imaging workload (BASELINE configs[1]).  The reference
notebook (`examples/cameraman.ipynb`) solves the *wavelet-L1* surrogate
because its scipy-based solver has no TV prox; here the TV prox is
computed by FGP (FISTA on the dual) with a fixed iteration budget
inside the compiled solver step — and on TPU it dispatches to a Pallas
kernel (`docs/KERNELS.md`).

This notebook runs a small synthetic scene on CPU;
`examples/cameraman_deblur.py --image <photo>` runs the full-size
pipeline (512², measured in BENCHMARKS.md).""",
    ),
    (
        "code",
        """\
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from zfista_tpu.models.deblur import TVDeblur, gaussian_kernel, make_blur""",
    ),
    (
        "md",
        """\
## Build a blurred, noisy observation

A piecewise-constant scene (the regime TV shines in), blurred by a 9×9
Gaussian kernel — applied as two banded matmuls `G @ X @ Gᵀ`, because a
single-channel `lax.conv` is catastrophic on TPU (45–65× measured,
BENCHMARKS.md "Separable blur") — plus white noise.""",
    ),
    (
        "code",
        """\
size = 64
rng = np.random.default_rng(0)
truth = np.zeros((size, size), np.float32)
truth[size // 4 : 3 * size // 4, size // 4 : 3 * size // 4] = 1.0
truth[size // 2 :, : size // 2] = 0.5

kernel = gaussian_kernel(9, 2.0)
observed = np.array(make_blur(kernel)(jnp.asarray(truth)))
observed += 0.01 * rng.standard_normal(observed.shape).astype(np.float32)
print("observed MSE vs truth:", float(np.mean((observed - truth) ** 2)))""",
    ),
    (
        "md",
        """\
## Solve $\\min_X \\|\\mathrm{blur}(X) - b\\|^2 + \\lambda\\,TV(X)$

`TVDeblur` wires the data term, its Jacobian (the true blur adjoint),
the TV value, and the FGP prox into the solver.  The prox is inexact
(fixed dual budget) — monotone descent at this budget is asserted by
the test suite.""",
    ),
    (
        "code",
        """\
prob = TVDeblur(observed, tv_ratio=1e-3, kernel=kernel, prox_iter=30)
res = prob.solve(max_iter=300, tol=1e-7)
restored = np.asarray(res.x).reshape(observed.shape)

mse_obs = float(np.mean((observed - truth) ** 2))
mse_rec = float(np.mean((restored - truth) ** 2))
print(f"MSE observed {mse_obs:.5f} -> restored {mse_rec:.5f} "
      f"({mse_obs / mse_rec:.1f}x better), nit={res.nit}")""",
    ),
    (
        "code",
        """\
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 3, figsize=(9, 3))
for ax, (img, title) in zip(
    axes,
    [(truth, "truth"), (observed, "observed"), (restored, "restored")],
):
    ax.imshow(img, cmap="gray", vmin=0, vmax=1)
    ax.set_title(title)
    ax.axis("off")
fig.tight_layout()""",
    ),
    (
        "md",
        """\
## Warm-dual fast path

Consecutive outer iterations see nearly identical prox inputs, so
`solve_warm` carries the dual field between prox calls and cuts the
per-call budget (`prox_iter=8` reaches the cold path's quality —
test-pinned; 1.15× measured on TPU nested in the solve).""",
    ),
    (
        "code",
        """\
warm = prob.solve_warm(max_iter=300, tol=1e-7, prox_iter=8)
print(f"warm: F={warm['fun']:.6g} nit={warm['nit']} "
      f"(cold F={float(np.ravel(res.fun)[0]):.6g})")""",
    ),
    (
        "md",
        """\
## Checkpointing with a kernel pin

The TV prox has two same-math-but-not-bitwise implementations (XLA
loop, Pallas kernels); `checkpoint_meta()` records which one produced a
state so a resume under a different backend/default can detect the
numerics change (`utils.checkpoint.load_meta`).""",
    ),
    (
        "code",
        """\
print(prob.checkpoint_meta())""",
    ),
]

NOTEBOOKS = {
    "getting_started.ipynb": GETTING_STARTED,
    "tv_deblur.ipynb": TV_DEBLUR,
}


def build(cells):
    import nbformat

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "name": "python3",
        "display_name": "Python 3",
        "language": "python",
    }
    for kind, src in cells:
        if kind == "md":
            nb.cells.append(nbformat.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(src))
    return nb


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-exec", action="store_true")
    args = parser.parse_args(argv)
    import nbformat

    OUT.mkdir(parents=True, exist_ok=True)
    for name, cells in NOTEBOOKS.items():
        nb = build(cells)
        if not args.no_exec:
            from nbclient import NotebookClient

            client = NotebookClient(
                nb, timeout=900, kernel_name="python3",
                resources={"metadata": {"path": str(ROOT)}},
            )
            client.execute()
        nbformat.write(nb, OUT / name)
        n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
        print(f"wrote {name}: {len(nb.cells)} cells, {n_out} outputs")
    return 0


if __name__ == "__main__":
    sys.exit(main())

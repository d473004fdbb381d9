"""Examples are user-facing entry points: run each at tiny scale as a
subprocess (hermetic CPU, like everything in tests/) so interface drift or
option-handling regressions surface here instead of in a user's shell.
The momentum-experiment all-failed-pair crash motivating this file was
exactly such a drift."""

import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = f"{ROOT}{os.pathsep}" + env.get("PYTHONPATH", "")
    # The conftest's CPU forcing is pytest-only; examples must force via
    # a -c prelude because a sitecustomize may re-register other backends.
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        f"import runpy, sys; sys.argv={args!r}; "
        f"runpy.run_path(r'{ROOT}/examples/{args[0]}', run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=ROOT,
    )


def test_tv_deblur_example(tmp_path):
    r = _run(["tv_deblur.py", "--size", "32", "--max-iter", "30"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TV (warm)" in r.stdout and "waveletL1" in r.stdout


def test_momentum_experiment_example(tmp_path):
    r = _run(
        [
            "momentum_experiment.py",
            "--n-starts",
            "4",
            "--max-iter",
            "300",
            "--out",
            str(tmp_path),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # five suites, a CSV each
    assert len(list(tmp_path.glob("*_ab.csv"))) == 5


def test_large_lasso_example():
    r = _run(["large_lasso.py", "--n", "512", "--m", "64", "--iters", "20"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "large_lasso_iterations_per_s" in r.stdout


def test_cameraman_deblur_example(tmp_path):
    r = _run(
        [
            "cameraman_deblur.py",
            "--size",
            "32",
            "--max-iter",
            "60",
            "--out",
            str(tmp_path),
        ],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "cameraman_ab.csv").exists()


def test_optimality_gap_example():
    r = _run(
        [
            "optimality_gap.py",
            "--n",
            "400",
            "--m",
            "100",
            "--refine-iters",
            "100",
        ],
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "wall_to_1e-08_gap_s" in r.stdout


def test_cameraman_deblur_image_flag(tmp_path):
    """--image accepts a real photograph (non-square: center-cropped +
    resized) and produces the measured-time CSV."""
    import matplotlib
    from PIL import Image

    sample = (
        Path(matplotlib.__file__).parent / "mpl-data" / "sample_data" / "grace_hopper.jpg"
    )
    if not sample.exists():
        import numpy as np

        sample = tmp_path / "photo.png"
        rng = np.random.default_rng(0)
        Image.fromarray(
            (rng.uniform(0, 255, (96, 80))).astype("uint8")
        ).save(sample)
    r = _run(
        [
            "cameraman_deblur.py",
            "--size",
            "32",
            "--max-iter",
            "600",
            "--tol",
            "1e-3",
            "--image",
            str(sample),
            "--out",
            str(tmp_path),
        ],
        timeout=900,  # the heaviest example config; match the others
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "cameraman_ab.csv").exists()
    # measured time column: a real (positive) seconds value for at least
    # one converged pair, not just the right row count
    lines = (tmp_path / "cameraman_ab.csv").read_text().strip().splitlines()
    assert len(lines) == 15
    times = [ln.split(",")[2] for ln in lines]
    assert any(t and float(t) > 0 for t in times), times

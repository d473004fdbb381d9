"""Multi-process distributed runtime tests: spawn real OS processes, each
owning a slice of one global mesh (CPU backend, Gloo collectives), and
assert the globally-sharded batched solve equals a single-device solve.

The reference has no distributed backend at all (SURVEY.md §2.6); this is
the multi-host execution path of the TPU-native build, exercised the way
JAX CI tests multi-host code — ``jax.distributed.initialize`` over
localhost processes (the same launch shape as one process per TPU host).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_parity_workers(n_processes: int, local_devices: int) -> None:
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env["PYTHONPATH"] = str(REPO)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "zfista_tpu.parallel.distributed",
                "--coordinator",
                f"localhost:{port}",
                "--num-processes",
                str(n_processes),
                "--process-id",
                str(i),
                "--local-devices",
                str(local_devices),
                "--platform",
                "cpu",
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"PARITY_OK process={i}/{n_processes}" in out, out[-2000:]
        # The tensor-parallel case (model axis spanning processes) ran too.
        assert f"TP_PARITY_OK process={i}/{n_processes}" in out, out[-2000:]


def test_two_process_sharded_solve_matches_single():
    _run_parity_workers(2, 2)


def test_four_process_sharded_solve_matches_single():
    """Four OS processes, one device each — the one-process-per-host
    launch shape at a wider fan-out than the 2-process case (catches
    collectives/packing bugs that only appear past two participants,
    e.g. gather orderings that happen to commute with two)."""
    _run_parity_workers(4, 1)

"""Multi-process distributed runtime test: spawns TWO real OS processes,
each owning half the devices of one global mesh (CPU backend, Gloo
collectives), and asserts the globally-sharded batched solve equals a
single-device solve.

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


def test_two_process_sharded_solve_matches_single():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
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
                "2",
                "--process-id",
                str(i),
                "--platform",
                "cpu",
            ],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
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
        assert f"PARITY_OK process={i}/2" in out, out[-2000:]

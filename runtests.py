"""Benchmark-suite CLI, reference-compatible entry point
(reference: runtests.py:5-10 — ``python runtests.py [--overwrite] [--verbose]``).
"""

from zfista_tpu.bench.harness import main

if __name__ == "__main__":
    main()

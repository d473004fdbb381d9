"""Benchmark harness: problem sweep, cached runs, metrics, plots, CLI."""

from zfista_tpu.bench.harness import (
    benchmark,
    initialize_problems,
    load_or_run_results,
    main,
)

__all__ = ["benchmark", "initialize_problems", "load_or_run_results", "main"]

"""Solver-state checkpoint/resume.

The reference has no solver checkpointing; its only resume granularity is
the benchmark harness's per-(problem x variant) pickle cache
(reference: benchmarks/benchmark.py:279-300 — kept, see
zfista_tpu/bench/harness.py).  Because our entire solve state is ONE pytree
(:class:`zfista_tpu.core.solver.State`), per-iteration checkpointing is a
flat npz dump, and any solve can resume exactly where it stopped via
``minimize_proximal_gradient(..., initial_state=...)`` — bitwise identical
to the uninterrupted run (the iteration is deterministic).

Batched states (leading lane axis) round-trip the same way.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from zfista_tpu.core.solver import State


def _normalize(path) -> Path:
    # np.savez appends ".npz" to suffix-less paths; normalize both ends so
    # save_state(p) / load_state(p) round-trip for any spelling.
    path = Path(path)
    return path if path.suffix == ".npz" else path.with_suffix(path.suffix + ".npz")


#: npz key prefix for user metadata entries (kept disjoint from
#: ``State._fields`` so :func:`load_state` can ignore them unchanged).
_META_PREFIX = "_meta_"


def save_state(state: State, path, meta: dict[str, str] | None = None) -> None:
    """Serialize a solver :class:`State` (single or batched) to ``.npz``.

    Globally-sharded states (multi-process runs, where each process owns
    only local shards) are gathered first — ``np.asarray`` alone raises
    on non-fully-addressable arrays.  The write is atomic (temp file +
    rename), so a crash mid-write never leaves a truncated checkpoint.
    In multi-process runs every process gathers the same global state;
    write from process 0 only (``jax.process_index() == 0``) when the
    path is on a shared filesystem — concurrent same-path writers are
    each individually atomic but still race the final rename.

    ``meta`` stores string key/value pairs alongside the state (read back
    with :func:`load_meta`; :func:`load_state` ignores them).  Use it to
    pin configuration the state alone cannot express — e.g.
    ``TVDeblur.checkpoint_meta()`` records the resolved TV-prox kernel so
    a resume under a different default (or backend) can detect that it
    would not continue bitwise-identically.
    """
    import os

    from zfista_tpu.parallel.batch import _host_array

    path = _normalize(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {k: _host_array(v) for k, v in state._asdict().items()}
    for k, v in (meta or {}).items():
        if k in State._fields:
            raise ValueError(f"meta key {k!r} collides with a State field")
        payload[_META_PREFIX + str(k)] = np.asarray(str(v))
    tmp = path.with_suffix(f".tmp{os.getpid()}.npz")
    try:
        np.savez(tmp, **payload)
        os.replace(tmp, path)
    except BaseException:
        tmp.unlink(missing_ok=True)
        raise


def load_state(path) -> State:
    """Load a :class:`State` saved by :func:`save_state`.

    Raises ``ValueError`` if restoring would silently change a floating
    dtype (e.g. a float64 checkpoint loaded with ``jax_enable_x64`` off
    would downcast to float32 and break the bitwise-identical-resume
    contract).  Enable x64 (or re-save in the target precision) instead.
    """
    with np.load(_normalize(path)) as data:
        leaves = {}
        for k in State._fields:
            arr = jnp.asarray(data[k])
            saved = data[k].dtype
            if np.issubdtype(saved, np.floating) and arr.dtype != saved:
                import jax

                raise ValueError(
                    f"checkpoint field {k!r} was saved as {saved} but would "
                    f"load as {arr.dtype} (jax_enable_x64="
                    f"{bool(jax.config.jax_enable_x64)}); refusing a silent "
                    "precision change on resume"
                )
            leaves[k] = arr
        return State(**leaves)


def load_meta(path) -> dict[str, str]:
    """Read the string metadata stored by ``save_state(..., meta=...)``.

    Returns an empty dict for checkpoints written without metadata (all
    pre-existing checkpoints remain loadable).
    """
    with np.load(_normalize(path)) as data:
        return {
            k[len(_META_PREFIX):]: str(data[k])
            for k in data.files
            if k.startswith(_META_PREFIX)
        }

"""Backend/platform forcing shared by tests and CLIs.

Overriding JAX's platform in this build needs BOTH the ``JAX_PLATFORMS``
environment variable (before backends initialize) AND a
``jax.config.update`` after import: environments that tunnel to a real
accelerator may register their PJRT plugin from a ``sitecustomize`` hook
at interpreter start and rewrite ``jax_platforms``, so the env var alone
is not enough.  Previously this dance was copy-pasted (with drift) into
bench/scaling.py and parallel/distributed.py.  tests/conftest.py keeps
its own standalone copy on purpose: it must set the environment before
ANY import of jax, and importing this module pulls in the package (which
imports jax).
"""

from __future__ import annotations

import os


def force_platform(
    platform: str,
    n_devices: int | None = None,
    x64: bool | None = None,
) -> None:
    """Force the JAX platform; call before any JAX computation runs.

    ``n_devices`` (CPU only) sets ``--xla_force_host_platform_device_count``
    — the idiomatic virtual-device stand-in for multi-chip tests; it must
    land in ``XLA_FLAGS`` before the CPU backend initializes, so call this
    as early as possible (an existing count in ``XLA_FLAGS`` is honored).
    ``x64`` optionally pins ``jax_enable_x64`` (reference-precision parity
    runs are float64).
    """
    os.environ["JAX_PLATFORMS"] = platform
    if platform == "cpu" and n_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", platform)
    if x64 is not None:
        jax.config.update("jax_enable_x64", bool(x64))

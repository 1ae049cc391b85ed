"""Platform forcing shared by the CLI drivers.

The ambient sitecustomize on the tunneled-TPU host rewrites ``XLA_FLAGS``
and ``JAX_PLATFORMS`` during interpreter startup, so forcing the CPU
backend for a driver subprocess can NOT be done via env vars alone — it
must go through ``jax.config`` in-process before the backend initializes
(same mechanism as ``tests/conftest.py``). Drivers call
:func:`force_cpu_devices_from_env` right after argument parsing.
"""
from __future__ import annotations

import os


def force_cpu_devices_from_env() -> bool:
    """If ``COSNET_CPU_DEVICES=N`` is set, force an N-device virtual CPU
    platform for this process (CPU-host drives, CI, multi-process harnesses).
    Returns True when forcing was applied. No-op (with the existing flag
    preserved) when ``XLA_FLAGS`` already pins a host device count."""
    n = os.environ.get("COSNET_CPU_DEVICES")
    if not n:
        return False
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized; leave it as-is
    return True

"""Test configuration: run all tests on a virtual 8-device CPU platform.

Multi-chip sharding (data-parallel over a Mesh) is validated on CPU via
``--xla_force_host_platform_device_count=8`` so no TPU is needed for CI.
This mirrors SURVEY.md §4's rebuild test plan.

Note: the ambient environment boots a tunneled-TPU ("axon") PJRT plugin from
``sitecustomize`` and presets ``JAX_PLATFORMS=axon``, and jax is already
imported by the time pytest loads this file — so the override must go through
``jax.config`` (effective until the first backend initialization), not env.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Isolate the fresh-init disk cache (models.py::init_variables cache_key):
# tests must neither read a stale user-level cache nor write tiny-model
# trees into it.
import tempfile  # noqa: E402

os.environ["COSNET_INIT_CACHE"] = tempfile.mkdtemp(prefix="cosnet_init_test_")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

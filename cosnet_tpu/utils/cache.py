"""Persistent XLA compile cache (.jax_cache at the repo root, committed).

Cold full-model compiles through the tunneled TPU take minutes; cached
reloads ~1 s. bench.py/__graft_entry__/benchmarks already enable it — this
helper brings the CLI drivers (train.py / test.py / serve.py) onto the same
cache regardless of the working directory they run from.
"""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    if os.environ.get("COSNET_JAX_CACHE") == "off":
        return ""  # e.g. scripts/run_multiprocess.py: cache-hit asymmetry
        # between the two processes skews them past gloo's 30 s rendezvous
    if cache_dir is None:
        cache_dir = os.environ.get("COSNET_JAX_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir

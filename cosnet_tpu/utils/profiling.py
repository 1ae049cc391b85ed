"""Tracing / profiling subsystem.

The reference's only observability is wall-clock via timeit and a
``logMem`` GPU-memory line written 6×/iteration (``train.py:51-58,560-621``).
TPU-native equivalents:

* ``log_device_memory`` — the logMem analog over ``device.memory_stats()``
  (HBM bytes in use / limit), same call sites in the train loop;
* ``step_timer`` — per-step wall timing with a forced host sync (plain
  ``block_until_ready`` does not block on the tunneled-TPU relay — see
  cosnet_tpu/utils/device.py);
* ``trace`` — a ``jax.profiler`` trace context producing TensorBoard-format
  profiles (XLA op breakdown) under the given directory.
"""
from __future__ import annotations

import contextlib
import time

import jax


def device_memory_line(prefix: str = "") -> str:
    """logMem-format line (reference train.py:51-58) from TPU memory stats."""
    parts = []
    for d in jax.devices():
        stats = d.memory_stats() or {}
        used = stats.get("bytes_in_use", 0) / 1048576.0
        limit = stats.get("bytes_limit", 0) / 1048576.0
        parts.append(f"{d.platform}:{d.id} mem_alloc: {used:.1f}MB. total: {limit:.1f}MB.")
    return f"{prefix} " + "  ".join(parts) + "\n"


def sample_memory_line(prefix: str) -> str:
    """The logMem line as a string — lets a pipelined loop sample memory at
    the semantically right moment but defer the WRITE so log-line order
    stays byte-identical to the serial loop."""
    try:
        return device_memory_line(prefix)
    except Exception as e:  # memory_stats unsupported on some backends
        return f"{prefix} (memory stats unavailable: {e})\n"


def log_device_memory(logger, prefix: str):
    if logger:
        logger.write(sample_memory_line(prefix))


@contextlib.contextmanager
def step_timer(sink, label: str):
    """Times a step; ``sink(label, seconds)`` on exit."""
    t0 = time.perf_counter()
    yield
    sink(label, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

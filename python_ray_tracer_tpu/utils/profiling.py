"""Profiling helpers: named trace scopes + on-demand device profiles.

The reference's only instrumentation is an un-synced ``print`` (main.py:44-49).
Here every phase can be annotated for the JAX/XLA profiler and captured to a
TensorBoard-compatible trace directory.
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named scope visible in profiler timelines (host + device)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str, *, host_only: bool = False) -> Iterator[None]:
    """Capture a profiler trace around a code block.

    View with ``tensorboard --logdir <log_dir>`` or xprof. Device traces include
    per-kernel timing for the fused Pallas render kernel.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Best-effort live/peak device memory numbers (empty dict if unsupported)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    try:
        return dict(stats()) if callable(stats) else {}
    except Exception:
        return {}

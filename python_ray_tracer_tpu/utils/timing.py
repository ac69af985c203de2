"""Honest device timing + ray-throughput accounting.

The reference's self-timer brackets an *asynchronous* kernel launch without a device
sync (main.py:44-49), so its printed milliseconds can under-report arbitrarily. Here
every timed region calls ``jax.block_until_ready`` on the result, after a warm-up
call that absorbs compilation — the reference's warm-up-then-time pattern
(main.py:41-48) done correctly.
"""
from __future__ import annotations

import time
from typing import Callable

import jax


def _sync(out) -> None:
    """Force execution to finish: block, then round-trip one scalar to host.

    ``block_until_ready`` alone can return early on remote-tunneled backends
    (observed on the axon TPU bridge); fetching a value cannot."""
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        _ = jax.device_get(leaves[0].ravel()[:1] if hasattr(leaves[0], "ravel")
                           else leaves[0])


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 5,
            best_of: int = 1, **kwargs) -> float:
    """Wall-clock seconds per call: queue ``iters`` calls back-to-back, sync once,
    return the per-call aggregate (pipelined device throughput).

    ``best_of > 1`` repeats the whole measurement and returns the fastest
    aggregate — the standard defense against noisy/time-shared devices.

    Each measurement round carries a FIXED ~tens-of-ms cost on this image's
    tunneled backend (first-dispatch HTTP round trip + the scalar-fetch sync),
    independent of ``iters`` — measured 45 ms here by sweeping iters=5/20/100
    against a single-dispatch ``lax.scan`` chain of the same kernel. Callers
    timing millisecond-scale kernels must pick ``iters`` large enough that
    overhead/iters is negligible (iters >= 100 for ~2 ms kernels); otherwise the
    reported per-call time is inflated by overhead/iters."""
    for _ in range(max(warmup, 1)):
        _sync(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(max(best_of, 1)):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args, **kwargs)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def rays_per_image(width: int, height: int, *, depth: int, aliasing: bool,
                   n_lights: int, primary_only: bool = False) -> int:
    """Count rays traced for one render.

    ``primary_only`` counts one ray per pixel (the Grays/s headline convention of
    BASELINE.md). Otherwise counts every traced ray: per pixel, S samples
    (9 interior / 1 border with AA), each sample casting (1 + depth) eye/bounce rays,
    each of which sweeps n_lights shadow rays on hit. Shadow rays are counted
    optimistically (every trace alive) — a stable upper-bound denominator.
    """
    if primary_only:
        return width * height
    if aliasing:
        interior = max(width - 2, 0) * max(height - 2, 0)
        samples = interior * 9 + (width * height - interior)
    else:
        samples = width * height
    per_sample = (1 + depth) * (1 + n_lights)
    return samples * per_sample

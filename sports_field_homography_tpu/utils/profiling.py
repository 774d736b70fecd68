"""Profiling and timing utilities.

The reference's only timing machinery is ``torch.cuda.Event`` around eval
(``test.py:85-93``).  Here:

  * ``device_timer`` — wall-clock a device computation with proper
    synchronization (``block_until_ready`` on the result);
  * ``trace`` — context manager around ``jax.profiler`` writing a
    TensorBoard-viewable trace (xplane) for kernel-level inspection;
  * ``ablation_timer`` — the measurement pattern that is actually
    trustworthy on tunneled TPU runtimes (where small standalone programs
    can report ~0 ms): time full program variants and subtract.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["device_timer", "trace", "ablation_timer"]


def device_timer(fn: Callable, *args, iters: int = 20, warmup: int = 1):
    """Average wall-clock milliseconds of ``fn(*args)`` on device."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def ablation_timer(make_variant: Callable[..., Callable], configs, *args,
                   iters: int = 20):
    """Time a family of program variants; returns {name: ms}.

    ``make_variant(**cfg)`` builds a jitted callable; differences between
    variants isolate component costs without relying on microbenchmarks.
    """
    results = {}
    for name, cfg in configs.items():
        fn = make_variant(**cfg)
        results[name] = device_timer(fn, *args, iters=iters)
    return results

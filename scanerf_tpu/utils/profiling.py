"""Profiling / tracing harness.

TPU replacement for the reference's manual ``time.time()`` +
``torch.cuda.synchronize()`` spans (``rendering.py:288-303, 478-515``):

- :func:`timed` context manager — wall-clock span that FORCES a host
  fetch of the given arrays (on the axon tunnel ``block_until_ready``
  can return before remote execution completes, so host fetches are the
  only reliable sync),
- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  compatible trace directory for per-kernel HLO cost inspection.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def force_sync(*arrays) -> None:
    """Host-fetch one element of each array (reliable device sync)."""
    for a in arrays:
        leaves = jax.tree_util.tree_leaves(a)
        for leaf in leaves[:1]:
            np.asarray(jax.device_get(leaf)).ravel()[:1]


class Span:
    def __init__(self, name: str):
        self.name = name
        self.elapsed = 0.0


@contextlib.contextmanager
def timed(name: str, *sync_arrays, log: bool = True):
    """with timed("render", out) as span: ... -> span.elapsed seconds."""
    span = Span(name)
    t0 = time.perf_counter()
    try:
        yield span
    finally:
        force_sync(*sync_arrays)
        span.elapsed = time.perf_counter() - t0
        if log:
            print(f"[{name}] {span.elapsed * 1e3:.2f} ms")


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Profiling / tracing harness (SURVEY.md §5 tracing row).

The reference only wall-clocks ``trainer.predict`` (reference main.py:140-143);
here: a synchronized timing helper that is correct on remote-execution
backends (where ``block_until_ready`` may not synchronize — a 1-element
readback is forced instead), a throughput counter in the framework's
north-star unit (edge-messages/s), and an optional ``jax.profiler`` trace
context for XLA-level analysis.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn: Callable, *args, reps: int = 5, warmup: int = 1) -> Dict[str, float]:
    """Median wall time of a jitted function with forced synchronization.

    ``fn`` must return an array; a scalar reduction is fetched to host to
    guarantee the device finished (block_until_ready alone is not reliable on
    remote-execution platforms).
    """
    f = jax.jit(lambda *a: jnp.asarray(fn(*a)).sum())
    for _ in range(warmup):
        float(f(*args))
    times = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        times.append(time.time() - t0)
    return {"median_s": float(np.median(times)),
            "min_s": float(np.min(times)),
            "mean_s": float(np.mean(times))}


def edge_message_throughput(messages_per_call: int, seconds: float) -> float:
    """North-star metric: processed edge messages per second per chip."""
    return messages_per_call / max(seconds, 1e-12)


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context; view with TensorBoard/XProf.

    Falls back to a no-op when the backend cannot trace (e.g. through a
    remote tunnel)."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

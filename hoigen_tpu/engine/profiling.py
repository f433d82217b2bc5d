"""Tracing & profiling (the reference has none — SURVEY.md §5: wall-clock
deques only). First-class here: JAX profiler traces plus a step timer whose
numbers force real completion (through the axon relay, block_until_ready
acks optimistically; only host transfers are trustworthy — see bench.py).
"""
import contextlib
import time
from collections import deque
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall time; .timed() forces completion by fetching a
    scalar from the step output."""

    def __init__(self, window: int = 100):
        self.times = deque(maxlen=window)

    def timed(self, fn, *args, fetch=None, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        probe = fetch(out) if fetch is not None else out
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                     probe)
        self.times.append(time.perf_counter() - t0)
        return out

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    def images_per_sec(self, batch_size: int) -> float:
        return batch_size / self.mean if self.times else float("nan")


def device_memory_stats() -> Optional[dict]:
    """Per-device HBM stats where the backend exposes them."""
    try:
        d = jax.devices()[0]
        return d.memory_stats()
    except Exception:
        return None

"""Tracing / profiling utilities (aux subsystem; the reference has none —
closest is MetricLogger iter/data timing + torch.cuda.max_memory_allocated,
misc.py:330-367).

Provides:
  * trace(): context manager around jax.profiler for XLA-level traces.
  * StepTimer: wall-clock step timing with tunnel-safe synchronization
    (block_until_ready does not fully sync through the axon tunnel; timing
    closes with jax.device_get on a scalar).
  * device_memory_stats(): live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accurate per-step timing: call start() before and stop(result) after;
    stop() synchronizes by fetching a tiny scalar derived from the result."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None) -> float:
        if result is not None:
            leaf = jax.tree.leaves(result)[0]
            jax.device_get(jnp.ravel(leaf)[0] if hasattr(leaf, "ravel")
                           else leaf)
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_gb": s.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gb": s.get("peak_bytes_in_use", 0) / 2**30,
                "bytes_limit_gb": s.get("bytes_limit", 0) / 2**30,
            }
        except Exception:
            out[str(d)] = {}
    return out

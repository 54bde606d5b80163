"""train/profiling.py — trace capture, tunnel-safe step timing, HBM stats."""

import glob

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.train.profiling import (StepTimer,
                                                device_memory_stats, trace)


def test_trace_writes_profile(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir) as d:
        jax.device_get(jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))))
    assert d == logdir
    files = glob.glob(logdir + "/**/*", recursive=True)
    assert files, "profiler produced no artifacts"


def test_step_timer_syncs_and_averages():
    timer = StepTimer()
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((128, 128))
    for _ in range(3):
        timer.start()
        out = f(x)
        dt = timer.stop(out)  # stop() must device_get-sync before timing
        assert dt >= 0
    assert len(timer.times) == 3
    assert timer.mean == sum(timer.times) / 3
    # works with pytree results and with result=None (wall-clock only)
    timer.start()
    timer.stop({"a": jnp.ones(3), "b": jnp.zeros(2)})
    timer.start()
    timer.stop(None)
    assert len(timer.times) == 5


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) == len(jax.devices())
    for v in stats.values():
        assert isinstance(v, dict)  # per-backend fields optional

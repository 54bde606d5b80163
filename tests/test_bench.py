"""bench.py contract: the BENCH gate must fail loudly, never record 0.0."""

import numpy as np
import pytest

import bench


def test_measure_raises_when_nothing_compiles():
    def broken_pipeline(params, *inputs):
        raise ValueError("compile helper died")

    with pytest.raises(RuntimeError, match="every batch size failed"):
        bench.measure(broken_pipeline, None,
                      lambda b: (np.zeros((b, 2)),), batches=(2, 4))


def test_measure_returns_best_batch_throughput():
    def pipeline(params, x):
        return x

    tps = bench.measure(pipeline, None, lambda b: (np.zeros((b, 2)),),
                        batches=(2,), n_iter=2)
    assert tps > 0

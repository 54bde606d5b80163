"""Determinism / reproducibility (aux subsystem; the reference only pins
seeds, train.py:33,186-189 — here we assert bitwise-reproducible steps)."""

import numpy as np

import jax

from tests.test_train_loop import _fake_batch, tiny_full_config
from wildlifemapper_tpu.train.step import StepBuilder


def _run_steps(seed, batch, n=3):
    cfg = tiny_full_config()
    b = StepBuilder(cfg)
    params = b.init_params(jax.random.PRNGKey(seed))
    state = b.init_state(params, steps_per_epoch=10)
    step = b.jit_train_step()
    drng = jax.random.PRNGKey(seed + 1)
    losses = []
    for _ in range(n):
        state, m = step(state, batch, drng)
        losses.append(float(m["loss"]))
    return losses


def test_same_seed_bitwise_identical(rng):
    cfg = tiny_full_config()
    batch = _fake_batch(rng, cfg)
    a = _run_steps(0, batch)
    b = _run_steps(0, batch)
    assert a == b  # exact equality, not approx


def test_different_seed_differs(rng):
    cfg = tiny_full_config()
    batch = _fake_batch(rng, cfg)
    a = _run_steps(0, batch)
    c = _run_steps(1, batch)
    assert a != c


def test_loader_epoch_reshuffles_deterministically():
    from pathlib import Path

    import pytest

    ann = Path("/root/reference/coco_annotations/val.json")
    if not ann.exists():
        pytest.skip("annotations absent")
    from wildlifemapper_tpu.data.loader import CocoDetectionDataset, DataLoader
    from wildlifemapper_tpu.data.transforms import PreprocessConfig

    ds = CocoDetectionDataset(str(ann), None, PreprocessConfig(),
                              synthetic=True, synthetic_size=128)
    l1 = DataLoader(ds, 4, shuffle=True, seed=7)
    l2 = DataLoader(ds, 4, shuffle=True, seed=7)
    ids1 = [int(i) for b in l1.epoch(2) for i in b["image_id"]]
    ids2 = [int(i) for b in l2.epoch(2) for i in b["image_id"]]
    assert ids1 == ids2
    ids3 = [int(i) for b in l1.epoch(3) for i in b["image_id"]]
    assert ids1 != ids3  # set_epoch-style reshuffle

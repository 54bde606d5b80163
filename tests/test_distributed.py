"""Cross-process helpers: the ragged-object gather used by the eval merge.

Parity target: misc.py:180-220 (pickle all_gather of arbitrary objects).
multihost_utils.process_allgather needs identical pytree structure on every
process, so all_gather_objects serializes to fixed-shape padded byte
buffers; these tests drive the pack/pad/unpack machinery through the exact
ragged shapes the COCO eval merge produces (per-process image-id dicts with
different key sets and different per-image detection counts).
"""

import numpy as np

from wildlifemapper_tpu.eval.coco_eval import CocoEvaluator
from wildlifemapper_tpu.parallel.distributed import (_pack_object, _pad_to,
                                                     _unpack_object,
                                                     all_gather_objects)


def _ragged_dts(rng, img_ids):
    return {
        int(i): {
            "scores": rng.random(int(rng.integers(0, 7))).astype(np.float64),
            "labels": rng.integers(1, 7, int(rng.integers(0, 7))),
            "boxes": rng.random((int(rng.integers(0, 7)), 4)),
        }
        for i in img_ids
    }


def test_pack_roundtrip_ragged_process_dicts(rng):
    """Two simulated processes with disjoint image ids and ragged arrays:
    pack -> pad-to-global-max -> unpack must reproduce both exactly."""
    proc0 = _ragged_dts(rng, [1, 5, 9])
    proc1 = _ragged_dts(rng, [2, 3])  # different keys AND different sizes

    bufs = [_pack_object(p) for p in (proc0, proc1)]
    assert bufs[0].size != bufs[1].size  # genuinely ragged
    max_len = max(b.size for b in bufs)
    padded = np.stack([_pad_to(b, max_len) for b in bufs])

    for want, got_buf, ln in zip((proc0, proc1), padded,
                                 [b.size for b in bufs]):
        got = _unpack_object(got_buf, ln)
        assert set(got) == set(want)
        for k in want:
            for f in ("scores", "labels", "boxes"):
                np.testing.assert_array_equal(got[k][f], want[k][f])


def test_pack_handles_empty_and_nested():
    for obj in ({}, {"a": []}, {1: {"scores": np.zeros(0)}}, None, [(), {}]):
        buf = _pack_object(obj)
        got = _unpack_object(_pad_to(buf, buf.size + 13), buf.size)
        if isinstance(obj, dict) and obj and isinstance(next(iter(obj.values())), dict):
            np.testing.assert_array_equal(got[1]["scores"], obj[1]["scores"])
        else:
            assert got == obj


def test_all_gather_objects_single_process(rng):
    obj = _ragged_dts(rng, [7])
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0] is obj


def test_eval_merge_dedups_own_shard(rng):
    """The merge loop re-feeds the local shard (gathered includes self);
    CocoEvaluator.update must dedup by image id so results don't double."""
    gt = None  # update() alone doesn't touch the GT index

    class _Idx:
        categories = []

    ev = CocoEvaluator.__new__(CocoEvaluator)
    ev._dts, ev.img_ids = {}, []
    local = _ragged_dts(rng, [1, 2])
    other = _ragged_dts(rng, [3])
    ev.update(local)
    for shard in (dict(local), other, dict(other)):
        ev.update(shard)
    assert sorted(ev._dts) == [1, 2, 3]
    assert sorted(ev.img_ids) == [1, 2, 3]

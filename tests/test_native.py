"""Native C++ kernels vs python/scipy oracles."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from wildlifemapper_tpu import native


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_lapjv_vs_scipy(rng):
    for n in (3, 17, 64, 128):
        c = rng.normal(size=(n, n)).astype(np.float32) * 10
        got = native.lapjv(c)
        r, cc = linear_sum_assignment(c)
        assert len(set(got.tolist())) == n
        np.testing.assert_allclose(c[np.arange(n), got].sum(),
                                   c[r, cc].sum(), rtol=1e-6, atol=1e-3)


def test_native_builds_from_clean_source(tmp_path, rng):
    """The .so is never committed (native/.gitignore); a fresh clone must
    be able to rebuild it from wm_native.cpp alone. Compile the tracked
    source into a temp dir with the exact flags native._build uses and
    exercise one entry point through a fresh ctypes handle."""
    import ctypes
    import shutil
    import subprocess

    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    src = native._DIR / "src" / "wm_native.cpp"
    so = tmp_path / "libwm_native_clean.so"
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
         str(src), "-o", str(so)],
        check=True, capture_output=True, timeout=120)
    lib = ctypes.CDLL(str(so))
    lib.wm_lapjv.restype = ctypes.c_int
    lib.wm_lapjv.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                             ctypes.POINTER(ctypes.c_int)]
    n = 8
    c = np.ascontiguousarray(rng.normal(size=(n, n)).astype(np.float32))
    out = np.empty(n, np.int32)
    rc = lib.wm_lapjv(c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    assert rc == 0
    from scipy.optimize import linear_sum_assignment as lsa
    r, cc = lsa(c)
    np.testing.assert_allclose(c[np.arange(n), out].sum(), c[r, cc].sum(),
                               rtol=1e-6, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_nms_vs_numpy(rng):
    from wildlifemapper_tpu.eval.orthomosaic import _nms_numpy

    n = 200
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 500, n)
    boxes[:, 1] = rng.uniform(0, 500, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(5, 50, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(5, 50, n)
    scores = rng.uniform(size=n).astype(np.float32)
    got = set(native.nms(boxes, scores, 0.4).tolist())
    want = set(_nms_numpy(boxes.astype(np.float64),
                          scores.astype(np.float64), 0.4).tolist())
    assert got == want


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_coco_match_equals_python(rng):
    """Force both match paths in CocoEvaluator and compare final stats."""
    from wildlifemapper_tpu.eval import coco_eval as ce
    from tests.test_coco_eval import FakeIndex, _ann, _pred

    anns = {1: [_ann(i * 15, 0, 10, 10, 1) for i in range(6)]
            + [_ann(0, 100, 20, 20, 2, crowd=1)],
            2: [_ann(5, 5, 30, 30, 2)]}
    gt = FakeIndex(anns)
    boxes = np.concatenate([
        np.asarray([[i * 15 + 1, 0, i * 15 + 11, 10] for i in range(6)]),
        np.asarray([[0, 100, 20, 120], [300, 300, 310, 310.0]])])
    scores = rng.uniform(0.2, 1.0, size=8)
    labels = np.asarray([1] * 6 + [2, 2])

    def run(use_native):
        ev = ce.CocoEvaluator(gt)
        ev.update({1: _pred(boxes, scores, labels),
                   2: _pred([[5, 6, 34, 36]], [0.9], [2])})
        if not use_native:
            import wildlifemapper_tpu.native as nat
            orig = nat.coco_match
            nat.coco_match = lambda *a, **k: None
            try:
                ev.accumulate()
            finally:
                nat.coco_match = orig
        else:
            ev.accumulate()
        return ev.summarize()

    s_native = run(True)
    s_python = run(False)
    for k in s_native:
        assert s_native[k] == pytest.approx(s_python[k], abs=1e-9), k

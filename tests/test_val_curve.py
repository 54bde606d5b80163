"""scripts/val_curve.py log-parser test: epoch/loss/AP extraction across
segment boundaries (the integration-record extractor must not mis-attach
eval APs or drop resume events)."""

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import val_curve  # noqa: E402

SEG0 = """\
Epoch: [0] [0/116] eta: 0:00:13 time: 0.11
Epoch 0 done in 176.6s  loss=17.3104
Eval: [13/14] eta: 0:00:00
 Average Precision  (AP) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ] = 0.012
 Average Precision  (AP) @[ IoU=0.50      | area=   all | maxDets=100 ] = 0.061
Epoch 1 done in 99.4s  loss=14.4167
"""

SEG1 = """\
resumed from epoch 1
resumed best_loss=14.4167
Epoch 2 done in 80.0s  loss=12.2295
Eval: [13/14] eta: 0:00:00
 Average Precision  (AP) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ] = 0.022
 Average Precision  (AP) @[ IoU=0.50      | area=   all | maxDets=100 ] = 0.094
"""


def test_val_curve_parses_segments(tmp_path):
    a = tmp_path / "run.seg0.log"
    b = tmp_path / "run.seg1.log"
    a.write_text(SEG0)
    b.write_text(SEG1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        val_curve.main([str(a), str(b)])
    out = buf.getvalue()
    # resume events surfaced
    assert "resumed from epoch 1" in out
    lines = {int(l.split()[0]): l for l in out.splitlines()
             if l and l.split()[0].isdigit()}
    assert set(lines) == {0, 1, 2}
    # AP attaches to the epoch whose "done" line precedes the eval block
    assert "0.012" in lines[0] and "0.061" in lines[0]
    assert "17.3104" in lines[0]
    assert "0.022" in lines[2] and "0.094" in lines[2]
    # epoch 1 had no eval
    assert "0.0" not in lines[1].split("14.4167")[1]

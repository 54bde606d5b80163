"""Extract the training integration record from cli.train logs.

Parses one or more (segment) logs in order and prints a per-epoch table:
train loss, and val AP / AP50 on eval epochs — the curve the reference
prints per epoch (train.py:325 -> pycocotools summarize). Used to commit
the converged-run evidence into PERF.md.

Usage: python scripts/val_curve.py /tmp/prof/r5x16.seg*.log
"""
import re
import sys

EPOCH_RE = re.compile(r"Epoch (\d+) done in ([\d.]+)s\s+loss=([\d.]+)")
AP_RE = re.compile(r"Average Precision\s+\(AP\) @\[ IoU=(0\.50:0\.95|0\.50)\s+\|"
                   r" area=\s*all \| maxDets=100 \] = ([-\d.]+)")
RESUME_RE = re.compile(r"resumed from epoch (\d+)|resumed best_loss=([\d.]+)")


def main(paths):
    rows = {}  # epoch -> dict
    last_epoch = None
    events = []
    for path in sorted(paths):
        for line in open(path, errors="replace"):
            m = EPOCH_RE.search(line)
            if m:
                ep, secs, loss = int(m.group(1)), float(m.group(2)), float(m.group(3))
                rows.setdefault(ep, {})
                rows[ep]["loss"] = loss
                rows[ep]["secs"] = secs
                last_epoch = ep
                continue
            m = RESUME_RE.search(line)
            if m:
                events.append(f"{path.split('/')[-1]}: {line.strip()}")
                continue
            m = AP_RE.search(line)
            if m and last_epoch is not None:
                # eval prints AFTER "Epoch N done" for eval epochs
                # eval prints right after this epoch's "Epoch N done" line
                key = "AP" if m.group(1) == "0.50:0.95" else "AP50"
                rows[last_epoch][key] = float(m.group(2))
    for ev in events:
        print("#", ev)
    print(f"{'epoch':>5} {'loss':>9} {'s/epoch':>8} {'val AP':>7} {'AP50':>6}")
    for ep in sorted(rows):
        r = rows[ep]
        ap = f"{r['AP']:.3f}" if "AP" in r else ""
        ap50 = f"{r['AP50']:.3f}" if "AP50" in r else ""
        print(f"{ep:>5} {r.get('loss', float('nan')):>9.4f} "
              f"{r.get('secs', float('nan')):>8.1f} {ap:>7} {ap50:>6}")


if __name__ == "__main__":
    main(sys.argv[1:])

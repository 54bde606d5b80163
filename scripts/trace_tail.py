"""Group the <0.5 ms device-op tail of a saved trace by op-name family to
attribute the 36 ms/step unnamed bucket."""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict

logdir = sys.argv[1]
n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
with gzip.open(sorted(files)[-1], "rt") as f:
    tr = json.load(f)
events = tr["traceEvents"]
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")
dev_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()}

by_name = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        name = e.get("name", "")
        if "jit_pipeline" in name or name.startswith("jit_"):
            continue
        by_name[name] += e.get("dur", 0) / 1e3 / n_iters
        cnt[name] += 1


def family(name):
    return re.sub(r"[.\d]+$", "", name)


fam_ms = defaultdict(float)
fam_cnt = defaultdict(int)
for name, ms in by_name.items():
    if ms >= 0.5:
        continue
    fam_ms[family(name)] += ms
    fam_cnt[family(name)] += cnt[name] // n_iters

total = sum(fam_ms.values())
print(f"tail total: {total:.2f} ms/iter in families:")
for f_, ms in sorted(fam_ms.items(), key=lambda kv: -kv[1]):
    if ms >= 0.2:
        print(f"  {ms:7.2f} ms x{fam_cnt[f_]:<5d} {f_[:110]}")
rest = sum(ms for f_, ms in fam_ms.items() if ms < 0.2)
print(f"  {rest:7.2f} ms  [families < 0.2 ms]")

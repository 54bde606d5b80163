"""scripts/r5_record.py writes the round-5 documents of record unattended
(called by scripts/r5_autocommit.sh the moment the conjunction verdict
lands); a silent formatting regression there would lose the round's most
important number, so the three verdict branches are pinned here."""
import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

PERF_STUB = "# Performance notes\n\nexisting body\n"
BASELINE_STUB = "# BASELINE\n\nexisting body\n"
README_STUB = (
    "intro\n"
    "0.650 vs 1.000) — and crop-vs-bf16-full isolation is 0.9064/1.000. Final\n"
    "parity of record (crop/full AP ratio on a converged checkpoint) is the\n"
    "TPU pipeline's stage-4 verdict; the 66.3 t/s full-canvas tier (table\n"
    "above) is the measured mAP-exact configuration either way.\n"
    "outro\n")


def run_record(tmp_path, verdict):
    repo = tmp_path / "repo"
    (repo / "scripts").mkdir(parents=True)
    (repo / "PERF.md").write_text(PERF_STUB)
    (repo / "BASELINE.md").write_text(BASELINE_STUB)
    (repo / "README.md").write_text(README_STUB)
    for script in ("r5_record.py", "val_curve.py"):
        (repo / "scripts" / script).write_text(
            (REPO / "scripts" / script).read_text())
    run = tmp_path / "run"
    (run / "r5x16").mkdir(parents=True)
    (run / "r5x16" / "verdict.json").write_text(json.dumps(verdict))
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "r5_record.py")],
        env={"R5_RECORD_REPO": str(repo), "R5_RECORD_RUN": str(run),
             "PATH": "/usr/bin:/bin"},
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    return repo


BASE = {"config": "checkpoint-compat crop", "ap_vs_gt_full_canvas": 0.055,
        "ap_vs_gt_crop": 0.0548, "tiles_per_sec_b16": 137.2,
        "map_parity_ratio": 0.9964, "map50_parity_ratio": 0.9951,
        "meets_parity": True, "meets_5x": True, "partial": []}


def test_pass_branch(tmp_path):
    repo = run_record(tmp_path, BASE)
    perf = (repo / "PERF.md").read_text()
    assert "## Round 5: conjunction verdict of record" in perf
    assert "conjunction CLOSES" in perf
    assert json.dumps(BASE) in perf          # verdict verbatim
    assert "existing body" in perf           # nothing clobbered
    base = (repo / "BASELINE.md").read_text()
    assert "| ≥ 0.99 | 0.9964 (AP50 ratio 0.9951) | PASS |" in base
    readme = (repo / "README.md").read_text()
    assert "Parity of record (round 5" in readme
    assert "stage-4 verdict" not in readme   # old sentence replaced
    assert "outro" in readme


def test_fail_branch(tmp_path):
    v = {**BASE, "map_parity_ratio": 0.82, "map50_parity_ratio": 0.88,
         "meets_parity": False}
    repo = run_record(tmp_path, v)
    perf = (repo / "PERF.md").read_text()
    assert "Conjunction verdict: FAIL" in perf
    assert "parity FAIL" in perf and "throughput PASS" in perf
    assert "below the 0.99 bar" in (repo / "README.md").read_text()
    assert "| FAIL |" in (repo / "BASELINE.md").read_text()


def test_partial_branch(tmp_path):
    v = {**BASE, "tiles_per_sec_b16": None, "meets_5x": None,
         "partial": ["throughput"]}
    repo = run_record(tmp_path, v)
    perf = (repo / "PERF.md").read_text()
    assert "PARTIAL verdict" in perf
    assert "NOT closed" in perf
    assert "PARTIAL" in (repo / "README.md").read_text()


def test_real_readme_still_has_target_sentence():
    """r5_record.py replaces this sentence by exact match; an unrelated
    README edit must not silently turn the unattended writer into a no-op.
    (Skipped once the verdict has landed and the sentence was rewritten.)"""
    readme = (REPO / "README.md").read_text()
    if "Parity of record (round 5" in readme or "round-5 trained-checkpoint" \
            in readme or "VERDICT_R5_RUN" in readme:
        pytest.skip("verdict already recorded; sentence legitimately gone")
    target = README_STUB.splitlines()[2]  # "parity of record (crop/full..."
    assert target in readme


def test_idempotent(tmp_path):
    repo = run_record(tmp_path, BASE)
    before = (repo / "PERF.md").read_text()
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "r5_record.py")],
        env={"R5_RECORD_REPO": str(repo),
             "R5_RECORD_RUN": str(tmp_path / "run"), "PATH": "/usr/bin:/bin"},
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0
    assert "already has" in proc.stdout
    assert (repo / "PERF.md").read_text() == before

"""Shell-level tests for scripts/train_segments.sh's stall watchdog.

The axon tunnel client can lose its relay connection mid-run and block
forever in a futex wait with zero CPU and no log output (observed
08-20 00:45 UTC at epoch 52 of the r5 verdict run, while the relay
stayed healthy for new clients). train_segments.sh detects that by
segment-log silence, SIGKILLs the exact child PID, and retries the
segment (--resume makes a mid-epoch kill epoch-safe).

These tests stub `python` on PATH so the script's control flow runs in
seconds: a stall is a child that stops writing, a recovery is a child
that exits 0.
"""
import os
import stat
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "train_segments.sh"


def _write_stub(tmp_path, body):
    """Install a fake `python` first on PATH. Relay probes (-c) exit 0."""
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    stub = bindir / "python"
    stub.write_text(
        "#!/usr/bin/env bash\n"
        'case "$*" in *" -c "*|"-c "*) exit 0;; esac\n' + body)
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    return bindir


def _run(tmp_path, bindir, env_extra, timeout=60):
    env = dict(os.environ)
    env["PATH"] = f"{bindir}:{env['PATH']}"
    env.update({"REPO": str(tmp_path), "LOG": str(tmp_path / "seg"),
                "TRAIN_ARGS": "", "POLL_SECS": "1", "PROBE_SLEEP": "0",
                "STARTUP_GRACE_SECS": "2",
                "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "cache")})
    env.update(env_extra)
    return subprocess.run(["bash", str(SCRIPT)], env=env, timeout=timeout,
                          capture_output=True, text=True)


def test_watchdog_kills_stalled_segment_and_retry_recovers(tmp_path):
    """Attempt 0 goes silent (simulated dead tunnel) -> the watchdog
    SIGKILLs it; attempt 1 exits clean -> SEGMENTS_COMPLETE prints."""
    attempts = tmp_path / "attempts"
    body = (
        f'n=$(cat "{attempts}" 2>/dev/null || echo 0)\n'
        f'echo $((n+1)) > "{attempts}"\n'
        'if [ "$n" -eq 0 ]; then echo "stalling"; sleep 45; exit 1; fi\n'
        'echo "epoch done"; exit 0\n')
    bindir = _write_stub(tmp_path, body)
    r = _run(tmp_path, bindir,
             {"EPOCHS": "1", "SEG": "1", "WATCHDOG_SECS": "2",
              "RETRIES": "2"})
    assert "watchdog: no log output" in r.stdout, r.stdout
    assert "SEGMENTS_COMPLETE" in r.stdout, r.stdout
    assert r.returncode == 0
    assert attempts.read_text().strip() == "2"  # exactly one retry


def test_watchdog_exhausted_retries_fails_loudly(tmp_path):
    """Every attempt stalls -> the script exits nonzero with FAILED and
    never prints the completion marker (the verdict runner keys on
    both strings)."""
    body = 'echo "stalling"; sleep 45; exit 1\n'
    bindir = _write_stub(tmp_path, body)
    r = _run(tmp_path, bindir,
             {"EPOCHS": "1", "SEG": "1", "WATCHDOG_SECS": "2",
              "RETRIES": "1"})
    assert r.returncode != 0
    assert "FAILED" in r.stdout, r.stdout
    assert "SEGMENTS_COMPLETE" not in r.stdout


def test_startup_grace_outlives_watchdog_until_first_epoch_line(tmp_path):
    """Checkpoint restore + compile load is silent for ~13 min on a
    healthy run — longer than WATCHDOG_SECS. Until the attempt prints
    its first "Epoch: [" line the startup grace applies; after that
    line, the tight watchdog takes over (the stall after it is killed)."""
    attempts = tmp_path / "attempts"
    body = (
        f'n=$(cat "{attempts}" 2>/dev/null || echo 0)\n'
        f'echo $((n+1)) > "{attempts}"\n'
        'if [ "$n" -eq 0 ]; then\n'
        # silent "restore" longer than WATCHDOG_SECS but under grace,
        # then an epoch line, then a stall -> tight watchdog kills it
        '  sleep 4; echo "Epoch: [50] [0/116]"; sleep 45; exit 1\n'
        'fi\n'
        'echo "Epoch: [50] done"; exit 0\n')
    bindir = _write_stub(tmp_path, body)
    env = {"EPOCHS": "1", "SEG": "1", "WATCHDOG_SECS": "2",
           "STARTUP_GRACE_SECS": "8", "RETRIES": "1"}
    r = _run(tmp_path, bindir, env, timeout=90)
    # survived the silent startup (no kill before the epoch line) ...
    assert attempts.read_text().strip() == "2", r.stdout
    # ... but the post-epoch stall was killed and the retry completed
    assert "watchdog: no log output" in r.stdout, r.stdout
    assert "SEGMENTS_COMPLETE" in r.stdout, r.stdout
    assert r.returncode == 0


def test_prior_attempt_epoch_lines_do_not_cancel_grace(tmp_path):
    """The shared per-segment log keeps earlier attempts' epoch lines;
    only bytes appended by THIS attempt may end its startup grace."""
    attempts = tmp_path / "attempts"
    log = tmp_path / "seg.seg0.log"
    log.write_text("Epoch: [49] stale line from a previous attempt\n")
    body = (
        f'n=$(cat "{attempts}" 2>/dev/null || echo 0)\n'
        f'echo $((n+1)) > "{attempts}"\n'
        'if [ "$n" -eq 0 ]; then sleep 4; echo "Epoch: [50]"; exit 0; fi\n'
        'echo unexpected-retry; exit 0\n')
    bindir = _write_stub(tmp_path, body)
    env = {"EPOCHS": "1", "SEG": "1", "WATCHDOG_SECS": "1",
           "STARTUP_GRACE_SECS": "10", "RETRIES": "1"}
    r = _run(tmp_path, bindir, env, timeout=60)
    # with the stale line wrongly counted, WATCHDOG_SECS=1 would kill the
    # 4s-silent startup; grace must hold and the run completes first try
    assert attempts.read_text().strip() == "1", r.stdout
    assert "watchdog" not in r.stdout, r.stdout
    assert r.returncode == 0


def test_clean_run_no_watchdog_interference(tmp_path):
    """A healthy multi-segment run is untouched by the watchdog and
    stitches segments exactly as before (regression guard on the
    refactor from inline python to run_segment)."""
    calls = tmp_path / "calls"
    body = (f'echo "--epochs ${{*#* --epochs }}" >> "{calls}"\n'
            'echo ok; exit 0\n')
    bindir = _write_stub(tmp_path, body)
    r = _run(tmp_path, bindir,
             {"EPOCHS": "4", "SEG": "2", "WATCHDOG_SECS": "30"})
    assert r.returncode == 0
    assert "SEGMENTS_COMPLETE" in r.stdout
    assert "watchdog" not in r.stdout
    # two segments: targets 2 then 4
    lines = calls.read_text().strip().splitlines()
    assert len(lines) == 2
